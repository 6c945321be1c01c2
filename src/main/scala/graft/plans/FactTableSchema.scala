package graft.plans

import scala.collection.mutable
import scala.util.matching.Regex

import graft.xbrl.{Concept, LinkRole, Names, TableField, TableSchema, Taxonomy, XbrlBaseType}

/** Schema derivation + multi-version merge (SURVEY.md §2.2
  * `xbrl_schema_derive` / `xbrl_schema_merge`).
  *
  * Each (link role x period type) becomes one output table
  * (datapackage.py:249-341): concepts ending in `Axis` become dimension
  * columns in the primary key; other leaf concepts with the matching
  * period type become data columns; every table carries the shared PK
  * prefix (entity_id, filing_name, publication_time, then
  * start_date/end_date for duration or date for instant). Tables whose
  * role definition doesn't parse or that have no data columns are
  * skipped (datapackage.py:321-341).
  *
  * Multiple yearly taxonomy versions merge into one unified schema
  * (datapackage.py:474-527): versions are processed in ascending order,
  * new tables are added, removed tables are kept, and tables present in
  * both versions get a column-level merge that requires identical
  * primary keys and appends new fields (datapackage.py:348-387).
  */
object FactTableSchema {

  val DurationPk: Seq[TableField] = Seq(
    TableField("entity_id", "Entity Identifier", "string", "Unique identifier of respondent"),
    TableField("filing_name", "Filing Name", "string", "Name of filing"),
    TableField("publication_time", "Publication Time", "date",
      "Time the filing was made available on the FERC RSS feed."),
    TableField("start_date", "Start Date", "date", "Start date of report period"),
    TableField("end_date", "End Date", "date", "End date of report period"))

  val InstantPk: Seq[TableField] = Seq(
    DurationPk(0), DurationPk(1), DurationPk(2),
    TableField("date", "Instant Date", "date", "Date of instant period"))

  private val TableNamePattern: Regex = "(?i)(.+)\\s+-\\s+Schedule\\s+-\\s+(.*)".r
  private val UppercaseWordPattern: Regex = "[^A-Z][A-Z]([A-Z]+)".r

  /** Lowercase the tail of fully-uppercase words so snakecase doesn't
    * insert an underscore per letter (datapackage.py:201-213, including
    * its replace-all-occurrences behavior).
    */
  private[plans] def lowercaseWords(name: String): String =
    UppercaseWordPattern.findAllMatchIn(name).map(_.group(1)).toSeq
      .foldLeft(name)((n, upper) => n.replace(upper, upper.toLowerCase))

  /** Clean a role definition ("NNN - Schedule - Title") into a table name
    * (`title_nnn` snakecased, special chars stripped). None for
    * deprecated/unparseable definitions (datapackage.py:216-246).
    */
  def cleanTableName(rawName: String): Option[String] = {
    val name = lowercaseWords(rawName)
    name match {
      case TableNamePattern(page, title) =>
        val rearranged = s"${title}_$page"
        val snake = Names.snakecase(rearranged)
        val cleaned = snake.replaceAll("\\W", "").replaceAll("_(_+)", "_")
        Some(cleaned)
      case _ if name.contains("Deprecated") => None
      case _ =>
        // reference raises here (datapackage.py:232); tolerate + skip so
        // one malformed definition can't kill a 100 TB run
        None
    }
  }

  /** Collect (axes, columns) from a concept tree for one period type,
    * deduped by field name in first-seen document order
    * (datapackage.py:156-198; the reference uses unordered sets — we keep
    * document order so output schemas are deterministic).
    */
  private[plans] def fieldsFromConcepts(root: Concept, periodType: String): (Seq[TableField], Seq[TableField]) = {
    val axes = mutable.LinkedHashMap.empty[String, TableField]
    val columns = mutable.LinkedHashMap.empty[String, TableField]
    def field(c: Concept): TableField =
      TableField(Names.snakecase(c.name), c.standardLabel,
        XbrlBaseType.schemaType(c.typeBase), c.documentation.trim)
    def walk(concept: Concept): Unit =
      concept.children.foreach { item =>
        if (item.name.endsWith("Axis")) {
          val f = field(item)
          axes.getOrElseUpdate(f.name, f)
        } else if (item.children.nonEmpty) walk(item)
        else if (item.periodType == periodType) {
          val f = field(item)
          columns.getOrElseUpdate(f.name, f)
        }
      }
    walk(root)
    (axes.values.toSeq, columns.values.toSeq)
  }

  /** Derive the table for one link role and period type; None when the
    * name doesn't parse or there are no data columns.
    */
  def fromLinkRole(role: LinkRole, periodType: String): Option[TableSchema] =
    cleanTableName(role.definition).flatMap { cleaned =>
      val (axes, columns) = fieldsFromConcepts(role.concepts, periodType)
      if (columns.isEmpty) None
      else {
        val pkFields = (if (periodType == "duration") DurationPk else InstantPk) ++ axes
        Some(TableSchema(
          name = s"${cleaned}_$periodType",
          periodType = periodType,
          fields = pkFields ++ columns,
          primaryKey = pkFields.map(_.name),
          title = s"${role.definition} - $periodType",
          description = role.concepts.documentation))
      }
    }

  /** Merge one table's schema across two taxonomy versions
    * (Resource.merge_resources, datapackage.py:348-387): primary keys
    * must match exactly; fields new in `other` are appended; fields
    * removed in `other` are kept.
    */
  def mergeSchemas(base: TableSchema, other: TableSchema, otherVersion: String): TableSchema = {
    require(base.primaryKey == other.primaryKey,
      s"Can't merge table ${base.name}: incompatible primary keys between versions ($otherVersion)")
    val baseNames = base.fields.map(_.name).toSet
    val newFields = other.fields.filterNot(f => baseNames.contains(f.name))
    base.copy(fields = base.fields ++ newFields)
  }

  /** Derive the unified table set from all taxonomy versions in ascending
    * version order (Datapackage.from_taxonomies, datapackage.py:474-527).
    */
  def fromTaxonomies(taxonomies: Seq[Taxonomy]): Seq[TableSchema] = {
    val tables = mutable.LinkedHashMap.empty[String, TableSchema]
    for (taxonomy <- taxonomies.sortBy(_.version); role <- taxonomy.roles;
         periodType <- Seq("duration", "instant");
         schema <- fromLinkRole(role, periodType)) {
      tables.get(schema.name) match {
        case None           => tables(schema.name) = schema
        case Some(existing) => tables(schema.name) = mergeSchemas(existing, schema, taxonomy.version)
      }
    }
    tables.values.toSeq
  }
}
