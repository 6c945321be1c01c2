package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.plans.{FactTableBuilder, FactTableSchema}
import graft.sources.{FilingSource, TaxonomyParser}
import graft.xbrl.TableSchema

/** Driver-gate entry points for the XBRL engine (rows-only: the inputs
  * are the reference's own test archives, not the synthetic sf tables,
  * so there is no DuckDB twin — deep verification lives in
  * XbrlInstanceSpec / TaxonomySpec / FactTableSpec / CrossFormSpec).
  * The sf-dir argument every query receives is ignored by design.
  */
object XbrlQueries {

  private val dataDir = "/root/reference/tests/integration/data"

  /** Taxonomy schemas parse once per JVM — metadata, not data. */
  private lazy val tables: Seq[TableSchema] = FactTableSchema.fromTaxonomies(
    TaxonomyParser.parseArchive(s"$dataDir/ferc1-xbrl-taxonomies.zip"))

  /** x01: distributed parse of the ferc1 2021 filings archive — one
    * summary row per filing (context/fact counts by period type,
    * report date).
    */
  def x01XbrlParse(s: SparkSession, dir: String): DataFrame = {
    val filings = FilingSource.fromZip(s, s"$dataDir/ferc1-xbrl-2021.zip")
    val factCounts = filings.facts.toDF()
      .groupBy("filing_name")
      .agg(
        count(lit(1)).as("n_facts"),
        sum(when(col("instant"), 1L).otherwise(0L)).as("n_instant"),
        sum(when(!col("instant"), 1L).otherwise(0L)).as("n_duration"))
    val ctxCounts = filings.contexts.toDF()
      .groupBy("filing_name").agg(count(lit(1)).as("n_contexts"))
    factCounts.join(ctxCounts, Seq("filing_name"))
      .join(filings.meta.select("filing_name", "report_date"), Seq("filing_name"))
      .orderBy("filing_name")
  }

  /** x02: one real output table end-to-end (taxonomy -> schema -> parse
    * -> dedup -> pivot -> typed cast): identification_001_duration.
    */
  def x02XbrlFactTable(s: SparkSession, dir: String): DataFrame = {
    val schema = tables.find(_.name == "identification_001_duration").get
    val filings = FilingSource.fromZip(s, s"$dataDir/ferc1-xbrl-2021.zip")
    FactTableBuilder.build(schema, filings.facts, filings.contexts, filings.meta)
      .orderBy("filing_name")
  }

  /** x03: per-filing fact coverage against the full 255-table schema set
    * — the engine's data-quality gate as a queryable table.
    */
  def x03XbrlCoverage(s: SparkSession, dir: String): DataFrame = {
    val filings = FilingSource.fromZip(s, s"$dataDir/ferc1-xbrl-2021.zip")
    FactTableBuilder.stats(s, tables, filings.facts, filings.contexts, filings.meta)
      .select(col("filing_name"), col("used_facts"), col("total_facts"),
        round(col("coverage"), 6).as("coverage"))
      .orderBy("filing_name")
  }
}
