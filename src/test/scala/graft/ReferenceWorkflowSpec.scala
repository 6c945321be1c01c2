package graft

import java.nio.file.{Files, Paths}

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The examples/ walkthrough as an executable test — the COMPLETE
  * reference-user workflow in one pass: full extraction to a parquet
  * datapackage (every table of the merged taxonomy, the reference CLI's
  * whole job), then consumption of the written output exactly as PUDL
  * consumes the reference's — read a table back by its descriptor path
  * and run latest-filing-wins dedup on the primary key. Proves the
  * composed surface, not just each stage: a reference user can switch,
  * run their extract, and point their downstream queries at the result.
  */
class ReferenceWorkflowSpec extends SparkSpec {

  private val dataDir = "/root/reference/tests/integration/data"

  test("full extract -> parquet datapackage -> latest-filing-wins, end to end") {
    val dir = Files.createTempDirectory("graft_workflow").toString
    val out = XbrlExtract.extractToParquet(
      spark,
      Seq(s"$dataDir/ferc1-xbrl-2021.zip"),
      s"$dataDir/ferc1-xbrl-taxonomies.zip",
      dir)
    try {
      // the whole datapackage landed: every taxonomy table + descriptor
      // + metadata (255 = the reference's own regression count)
      assert(out.tables.size === 255)
      val root = new ObjectMapper().readTree(
        Files.readString(Paths.get(s"$dir/datapackage.json")))
      assert(root.get("resources").size === 255)
      assert(Files.exists(Paths.get(s"$dir/taxonomy_metadata.json")))

      // downstream consumption path: read a written table back and run
      // the PUDL latest-filing-wins dedup on its PK grain
      val ident = spark.read.parquet(s"$dir/tables/identification_001_duration.parquet")
      assert(ident.count() === 10L) // one row per 2021 filing
      val w = Window.partitionBy("entity_id", "start_date", "end_date")
        .orderBy(col("publication_time").desc, col("filing_name").desc)
      val latest = ident.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1).drop("rn")
      // the 2021 archive carries one re-filing: 10 filings, 9 entities
      // at the PK grain after latest-wins (real-data regression pin)
      assert(latest.count() === 9L)
      // the winner per key is the max publication_time row
      val maxPub = ident.groupBy("entity_id", "start_date", "end_date")
        .agg(max("publication_time").as("publication_time"))
      assert(latest.join(maxPub,
        Seq("entity_id", "start_date", "end_date", "publication_time")).count() === 9L)
    } finally out.release()
  }
}
