package graft

import java.nio.file.{Files, Paths}
import java.util.zip.ZipFile

import graft.plans.{FactTableBuilder, FactTableSchema}
import graft.sources.{FilingSource, TaxonomyParser}
import org.apache.spark.sql.functions._

/** Filing-source robustness: the directory source (binaryFile path) and
  * a later filing year (2022 filings follow the 2023 taxonomy — the
  * schema-merge must absorb the drift).
  */
class FilingSourceSpec extends SparkSpec {

  private val dataDir = "/root/reference/tests/integration/data"

  test("directory source parses extracted .xbrl files without rssfeed metadata") {
    val tmp = Files.createTempDirectory("graft_filings")
    val zf = new ZipFile(s"$dataDir/ferc1-xbrl-2021.zip")
    try {
      import scala.jdk.CollectionConverters._
      zf.entries().asScala.filter(_.getName.endsWith(".xbrl")).take(2).foreach { e =>
        // keep names filesystem-safe; the parser keys on the stem
        val safe = e.getName.replaceAll("[^A-Za-z0-9_.-]", "_")
        Files.copy(zf.getInputStream(e), tmp.resolve(safe))
      }
    } finally zf.close()

    val filings = FilingSource.fromDirectory(spark, tmp.toString)
    assert(filings.parsed.count() === 2L)
    assert(filings.facts.count() > 0L)
    val meta = filings.meta.collect()
    assert(meta.length === 2)
    // no rssfeed in a bare directory -> no publication times
    assert(meta.forall(_.isNullAt(meta.head.fieldIndex("publication_time"))))
    filings.unpersist()
  }

  test("2022 filings extract against the merged multi-year schema") {
    val tables = FactTableSchema.fromTaxonomies(
      TaxonomyParser.parseArchive(s"$dataDir/ferc1-xbrl-taxonomies.zip"))
    val filings = FilingSource.fromZip(spark, s"$dataDir/ferc1-xbrl-2022.zip")
    assert(filings.parsed.count() > 0L)

    val st = FactTableBuilder.stats(spark, tables, filings.facts, filings.contexts, filings.meta)
      .collect()
    val totalUsed = st.map(_.getAs[Long]("used_facts")).sum.toDouble
    val totalFacts = st.map(_.getAs[Long]("total_facts")).sum.toDouble
    assert(totalUsed / totalFacts > 0.99, s"2022 coverage ${totalUsed / totalFacts}")

    val schema = tables.find(_.name == "identification_001_duration").get
    val ident = FactTableBuilder.build(schema, filings.facts, filings.contexts, filings.meta)
    assert(ident.count() > 0L)
    assert(ident.filter(col("report_date").isNull).count() === 0L)
    filings.unpersist()
  }
}
