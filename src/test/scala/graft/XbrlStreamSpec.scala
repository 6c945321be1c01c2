package graft

import java.nio.file.Files
import java.util.zip.ZipFile
import scala.jdk.CollectionConverters._

import graft.operators.XbrlQueries
import graft.sources.FilingSource
import graft.streaming.XbrlStream
import org.apache.spark.sql.functions._

/** Streaming XBRL ingest: exactly-once pickup of newly-landed filings
  * and the row-local context join pinned equal to the batch parse on
  * real 2021 filings.
  */
class XbrlStreamSpec extends SparkSpec {

  test("streaming ingest matches the batch parse and picks up late-arriving filings") {
    val landing = Files.createTempDirectory("graft_xbrl_landing")
    val checkpoint = Files.createTempDirectory("graft_xbrl_ckpt").toString
    val zf = new ZipFile(XbrlQueries.requireArchive("ferc1-xbrl-2021.zip"))
    val entries = try {
      zf.entries().asScala.filter(_.getName.endsWith(".xbrl")).take(2).toVector.map { e =>
        val in = zf.getInputStream(e)
        val bytes = try in.readAllBytes() finally in.close()
        (e.getName.replaceAll("[^A-Za-z0-9_.-]", "_"), bytes)
      }
    } finally zf.close()
    assert(entries.size === 2)

    // the first filing lands before the stream starts
    Files.write(landing.resolve(entries(0)._1), entries(0)._2)

    val q = XbrlStream.factsFromDirectory(spark, landing.toString)
      .writeStream.format("memory").queryName("xbrl_stream")
      .option("checkpointLocation", checkpoint)
      .start()
    try {
      q.processAllAvailable()
      val afterOne = spark.table("xbrl_stream")
      assert(afterOne.count() > 0L)
      assert(afterOne.select("filing_name").distinct().count() === 1L)

      // a second filing arrives late: only ITS rows append — the file
      // source's checkpoint makes the first filing exactly-once
      Files.write(landing.resolve(entries(1)._1), entries(1)._2)
      q.processAllAvailable()
      val streamed = spark.table("xbrl_stream")
      assert(streamed.select("filing_name").distinct().count() === 2L)

      // the streamed store IS the batch facts x contexts join: same
      // row multiset over the final landing dir
      val filings = FilingSource.fromDirectory(spark, landing.toString)
      val batch = filings.facts.toDF()
        .join(filings.contexts.toDF()
          .select(col("filing_name"), col("c_id"), col("entity_id"), col("end_date")),
          Seq("filing_name", "c_id"))
        .select("filing_name", "c_id", "name", "value", "entity_id", "end_date")
      val got = streamed
        .select("filing_name", "c_id", "name", "value", "entity_id", "end_date")
      assert(got.count() === batch.count())
      assert(got.exceptAll(batch).count() === 0L)
      assert(batch.exceptAll(got).count() === 0L)

      // stateless: the plan carries no state store at all
      assert(q.lastProgress.stateOperators.isEmpty, q.lastProgress.prettyJson)
      filings.unpersist()
    } finally q.stop()
  }
}
