package graft.sources

import java.io.InputStream
import javax.xml.stream.{XMLInputFactory, XMLStreamConstants, XMLStreamReader}
import scala.collection.mutable

import graft.xbrl.{Names, RawFact, XbrlContext}

/** Streaming (StAX) parser for one XBRL instance document.
  *
  * Semantics match the reference's lxml parse
  * (ferc-xbrl-extractor instance.py:350-408):
  *  - `<xbrli:context>` children of the root -> contexts: id, entity
  *    identifier, segment dimensions (explicitMember value text /
  *    typedMember first-child text, axis names snake_cased with prefix
  *    stripped), period (instant end date vs duration start/end).
  *  - root children in the fact namespace -> facts: snake_case concept
  *    name, contextRef, text value; facts with no value are dropped
  *    (instance.py:395). The fact namespace is the URI the root element
  *    binds to `factPrefix` (default `ferc`) — matching by URI, like the
  *    reference's `root.findall(f"{fact_prefix}:*", root.nsmap)`
  *    (instance.py:383), so a filing that binds the FERC namespace to a
  *    different prefix still parses. If the root does not declare the
  *    prefix, we fall back to literal-prefix matching (the reference
  *    would raise).
  *  - each fact's instant/duration flag comes from its context's period
  *    (instance.py:396-399). Facts referencing an undefined context are
  *    dropped (the reference would crash; at scale we tolerate and the
  *    caller can count them via totalFacts vs facts.size).
  *
  * StAX keeps memory O(1) per filing regardless of filing size — one
  * executor core can stream a multi-GB instance, which is what makes the
  * per-filing parallelism safe at 100 TB.
  */
object XbrlInstanceParser {

  val XbrlInstanceNs = "http://www.xbrl.org/2003/instance"

  /** Everything parsed from one filing. `total_facts` counts distinct
    * (c_id, name) fact ids after value filtering but BEFORE the
    * undefined-context drop — the denominator of the reference's
    * coverage stats (instance.py:273-285), which counts every fact that
    * survives value filtering even if its context is unresolvable.
    */
  case class ParsedInstance(
      filing_name: String,
      report_date: String,
      contexts: Seq[XbrlContext],
      facts: Seq[RawFact],
      total_facts: Long,
      duplicated_fact_ids: Seq[String])

  private case class PendingFact(name: String, cId: String, value: String)

  def parse(filingName: String, in: InputStream, factPrefix: String = "ferc"): ParsedInstance = {
    val factory = XMLInputFactory.newInstance()
    factory.setProperty(XMLInputFactory.IS_COALESCING, java.lang.Boolean.TRUE)
    factory.setProperty(XMLInputFactory.SUPPORT_DTD, java.lang.Boolean.FALSE)
    factory.setProperty(XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, java.lang.Boolean.FALSE)
    val r = factory.createXMLStreamReader(in)

    val contexts = mutable.Map.empty[String, XbrlContext]
    val pending = mutable.ArrayBuffer.empty[PendingFact]
    // Namespace URI the ROOT element binds to factPrefix (instance.py:383
    // resolves the prefix through root.nsmap); null until the root is seen
    // or when the root doesn't declare the prefix.
    var factNs: String = null
    var depth = 0
    try {
      while (r.hasNext) {
        r.next() match {
          case XMLStreamConstants.START_ELEMENT =>
            depth += 1
            if (depth == 1) {
              var i = 0
              while (i < r.getNamespaceCount) {
                if (factPrefix == r.getNamespacePrefix(i)) factNs = r.getNamespaceURI(i)
                i += 1
              }
            } else if (depth == 2) {
              if (r.getNamespaceURI == XbrlInstanceNs && r.getLocalName == "context") {
                val ctx = parseContext(filingName, r) // consumes through END_ELEMENT
                contexts(ctx.c_id) = ctx
                depth -= 1
              } else if (if (factNs != null) factNs == r.getNamespaceURI
                         else factPrefix == r.getPrefix) {
                parseFact(r).foreach(pending += _) // consumes through END_ELEMENT
                depth -= 1
              }
            }
          case XMLStreamConstants.END_ELEMENT =>
            depth -= 1
          case _ => ()
        }
      }
    } finally r.close()

    val facts = pending.iterator.flatMap { f =>
      contexts.get(f.cId).map(ctx => RawFact(filingName, f.cId, f.name, f.value, ctx.instant))
    }.toVector

    // Coverage denominator over value-filtered facts only (`pending`):
    // facts later dropped for an undefined context still count, matching
    // the reference (instance.py:273-285 runs before any context drop).
    val idCounts = mutable.Map.empty[String, Int]
    pending.foreach { f =>
      val id = s"${f.cId}:${f.name}"
      idCounts(id) = idCounts.getOrElse(id, 0) + 1
    }
    val reportDate = facts
      .find(f => !f.instant && f.name == "report_date")
      .orElse(facts.find(f => !f.instant && f.name == "certifying_official_date"))
      .map(_.value).orNull

    ParsedInstance(
      filing_name = filingName,
      report_date = reportDate,
      contexts = contexts.values.toVector.sortBy(_.c_id),
      facts = facts,
      total_facts = idCounts.size.toLong,
      duplicated_fact_ids = idCounts.iterator.filter(_._2 >= 2).map(_._1).toVector.sorted)
  }

  /** Parse a `<context>` element; reader is ON its START_ELEMENT and is
    * consumed through the matching END_ELEMENT.
    */
  private def parseContext(filingName: String, r: XMLStreamReader): XbrlContext = {
    val cId = r.getAttributeValue(null, "id")
    var entityId: String = null
    var instant = false
    var startDate: String = null
    var endDate: String = null
    val dims = mutable.LinkedHashMap.empty[String, String]

    var depth = 1
    var inSegment = false
    while (depth > 0 && r.hasNext) {
      r.next() match {
        case XMLStreamConstants.START_ELEMENT =>
          depth += 1
          val local = r.getLocalName
          if (r.getNamespaceURI == XbrlInstanceNs) local match {
            case "identifier" => entityId = text(r); depth -= 1
            case "segment"    => inSegment = true
            case "instant"    => instant = true; endDate = text(r); depth -= 1
            case "startDate"  => startDate = text(r); depth -= 1
            case "endDate"    => endDate = text(r); depth -= 1
            case _            => ()
          }
          else if (inSegment && local == "explicitMember") {
            val axis = Names.snakecase(Names.stripPrefix(r.getAttributeValue(null, "dimension")))
            dims(axis) = text(r)
            depth -= 1
          } else if (inSegment && local == "typedMember") {
            val axis = Names.snakecase(Names.stripPrefix(r.getAttributeValue(null, "dimension")))
            dims(axis) = typedMemberValue(r)
            depth -= 1
          }
        case XMLStreamConstants.END_ELEMENT =>
          if (r.getLocalName == "segment") inSegment = false
          depth -= 1
        case _ => ()
      }
    }
    XbrlContext(filingName, cId, entityId, startDate, endDate, instant, dims.toMap)
  }

  /** Parse one fact element (reader on START_ELEMENT, consumed through
    * END_ELEMENT). Returns None when the fact has no text value.
    */
  private def parseFact(r: XMLStreamReader): Option[PendingFact] = {
    val name = Names.snakecase(r.getLocalName)
    val cId = r.getAttributeValue(null, "contextRef")
    val sb = new StringBuilder
    var sawText = false
    var sawChild = false
    var depth = 1
    while (depth > 0 && r.hasNext) {
      r.next() match {
        case XMLStreamConstants.START_ELEMENT => depth += 1; sawChild = true
        case XMLStreamConstants.END_ELEMENT   => depth -= 1
        case XMLStreamConstants.CHARACTERS | XMLStreamConstants.CDATA =>
          // lxml `elem.text` semantics: only text before the first child
          if (depth == 1 && !sawChild) { sawText = true; sb.append(r.getText) }
        case _ => ()
      }
    }
    if (cId == null || !sawText) None else Some(PendingFact(name, cId, sb.toString))
  }

  /** Text content of the current element (leaf); consumes END_ELEMENT. */
  private def text(r: XMLStreamReader): String = {
    val sb = new StringBuilder
    var depth = 1
    while (depth > 0 && r.hasNext) {
      r.next() match {
        case XMLStreamConstants.START_ELEMENT => depth += 1
        case XMLStreamConstants.END_ELEMENT   => depth -= 1
        case XMLStreamConstants.CHARACTERS | XMLStreamConstants.CDATA =>
          if (depth == 1) sb.append(r.getText)
        case _ => ()
      }
    }
    sb.toString
  }

  /** First child element's text inside a typedMember (instance.py:91-97). */
  private def typedMemberValue(r: XMLStreamReader): String = {
    var value = ""
    var first = true
    var depth = 1
    while (depth > 0 && r.hasNext) {
      r.next() match {
        case XMLStreamConstants.START_ELEMENT =>
          depth += 1
          if (first && depth == 2) { value = text(r); depth -= 1; first = false }
        case XMLStreamConstants.END_ELEMENT => depth -= 1
        case _ => ()
      }
    }
    value
  }
}
