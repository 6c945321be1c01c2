package graft

import graft.sources.FilingSource
import org.apache.spark.sql.functions._

/** Instance-parser spec against a real FERC Form 1 filings archive
  * (reference test data; ground truth computed independently with an XML
  * DOM parse replicating instance.py:350-408 semantics).
  */
class XbrlInstanceSpec extends SparkSpec {

  private val zipPath = "/root/reference/tests/integration/data/ferc1-xbrl-2021.zip"
  private val deseret =
    "Deseret_Generation_&_Transmission_Co-operative,_Inc._form1_Q4_1649884620"

  private lazy val filings = FilingSource.fromZip(spark, zipPath)

  test("parses all filings in the archive") {
    assert(FilingSource.listEntries(zipPath).size === 10)
    assert(filings.parsed.count() === 10L)
  }

  test("context and fact counts match a DOM reference parse") {
    val counts = filings.parsed
      .map(p => (p.filing_name, p.contexts.size, p.facts.size))(
        org.apache.spark.sql.Encoders.tuple(
          org.apache.spark.sql.Encoders.STRING,
          org.apache.spark.sql.Encoders.scalaInt,
          org.apache.spark.sql.Encoders.scalaInt))
      .collect().map { case (k, v, w) => k -> ((v, w)) }.toMap
    assert(counts(deseret) === ((407, 2128)))
    assert(filings.contexts.count() === 8269L)
    assert(filings.facts.count() === 38506L)
  }

  test("instant/duration split follows the fact's context period") {
    val byPeriod = filings.facts
      .filter(col("filing_name") === deseret)
      .groupBy("instant").count()
      .collect().map(r => r.getBoolean(0) -> r.getLong(1)).toMap
    assert(byPeriod(true) === 321L)
    assert(byPeriod(false) === 1807L)
  }

  test("parses fact values, names, and context dimensions") {
    val f = filings.facts
      .filter(col("filing_name") === deseret && col("c_id") === "C277" &&
        col("name") === "accumulated_provision_for_depreciation_of_electric_utility_plant")
      .collect()
    assert(f.length === 1)
    assert(f.head.value === "393359225")
    assert(f.head.instant)

    val ctx = filings.contexts
      .filter(col("filing_name") === deseret && col("c_id") === "C37")
      .collect()
    assert(ctx.length === 1)
    assert(ctx.head.dims === Map("utility_type_axis" -> "ferc:ElectricUtilityMember"))
  }

  test("typed dimensions parse with the member element's text value") {
    // C43 carries <xbrldi:typedMember dimension="ferc:RetainedEarningsAdjustmentsAxis">
    //   <ferc:RetainedEarningsAdjustmentDomain>1</...>
    val ctx = filings.contexts
      .filter(col("filing_name") === deseret && col("c_id") === "C43")
      .collect()
    assert(ctx.length === 1)
    assert(ctx.head.dims === Map("retained_earnings_adjustments_axis" -> "1"))
    assert(!ctx.head.instant)
    assert(ctx.head.start_date === "2021-01-01" && ctx.head.end_date === "2021-12-31")
  }

  test("facts match by namespace URI, not literal prefix (instance.py:383 nsmap semantics)") {
    // Root binds the fact namespace to BOTH `ferc` and `f1`; the facts use
    // `f1`. lxml's findall("ferc:*", root.nsmap) resolves through the URI
    // and finds them — so must we.
    val xml =
      """<?xml version="1.0"?>
        |<xbrli:xbrl xmlns:xbrli="http://www.xbrl.org/2003/instance"
        |            xmlns:ferc="http://example.com/ferc"
        |            xmlns:f1="http://example.com/ferc">
        |  <xbrli:context id="c1">
        |    <xbrli:entity><xbrli:identifier scheme="x">E1</xbrli:identifier></xbrli:entity>
        |    <xbrli:period><xbrli:instant>2021-12-31</xbrli:instant></xbrli:period>
        |  </xbrli:context>
        |  <f1:SomeConcept contextRef="c1">42</f1:SomeConcept>
        |</xbrli:xbrl>""".stripMargin
    val parsed = graft.sources.XbrlInstanceParser.parse(
      "t", new java.io.ByteArrayInputStream(xml.getBytes("UTF-8")))
    assert(parsed.facts.map(f => (f.name, f.value)) === Seq(("some_concept", "42")))
  }

  test("total_facts counts facts dropped for undefined contexts (coverage denominator)") {
    val xml =
      """<?xml version="1.0"?>
        |<xbrli:xbrl xmlns:xbrli="http://www.xbrl.org/2003/instance"
        |            xmlns:ferc="http://example.com/ferc">
        |  <xbrli:context id="c1">
        |    <xbrli:entity><xbrli:identifier scheme="x">E1</xbrli:identifier></xbrli:entity>
        |    <xbrli:period><xbrli:instant>2021-12-31</xbrli:instant></xbrli:period>
        |  </xbrli:context>
        |  <ferc:A contextRef="c1">1</ferc:A>
        |  <ferc:B contextRef="missing">2</ferc:B>
        |</xbrli:xbrl>""".stripMargin
    val parsed = graft.sources.XbrlInstanceParser.parse(
      "t", new java.io.ByteArrayInputStream(xml.getBytes("UTF-8")))
    assert(parsed.facts.size === 1) // B dropped: undefined context
    assert(parsed.total_facts === 2L) // ...but still in the denominator
  }

  test("filing meta carries rssfeed publication time and parsed report date") {
    val meta = filings.meta.collect()
    assert(meta.length === 10)
    assert(meta.forall(!_.isNullAt(1))) // publication_time for every filing
    val row = filings.meta.filter(col("filing_name") === deseret).collect().head
    assert(row.getAs[String]("report_date") === "2022-04-13")
    assert(row.getAs[String]("taxonomy_version") === "form-1-2022-01-01.zip")
    assert(row.getAs[Long]("total_facts") === 2128L)
  }
}
