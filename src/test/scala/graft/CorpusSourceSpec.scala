package graft

import java.nio.file.{Files, Paths, StandardOpenOption}

import graft.sources.CorpusSource
import org.apache.spark.sql.functions._

/** Corpus ingest/egress: JSONL and CSV round trips, malformed-line
  * quarantine, and the one-document-one-line JSONL invariant that
  * keeps the format splittable.
  */
class CorpusSourceSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def docsKey(df: org.apache.spark.sql.DataFrame): Set[(Long, String, String, String, Long)] =
    df.collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
      r.getString(3), r.getLong(4))).toSet

  test("JSONL round-trips the documents table bit-for-bit, one line per doc") {
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "text", "lang", "source", "n_chars")
    val out = Files.createTempDirectory("graft_jsonl").toString + "/docs"
    CorpusSource.writeJsonl(docs, out)
    val (clean, corrupt) = CorpusSource.quarantine(
      CorpusSource.readJsonl(spark, out))
    assert(corrupt.count() === 0L)
    assert(docsKey(clean.select("doc_id", "text", "lang", "source", "n_chars"))
      === docsKey(docs))
    // splittability invariant: every document is ONE physical line
    // (JSON escaping folded any embedded newlines), so line count ==
    // doc count and a byte-range split can never bisect a document
    val lineCount = spark.read.textFile(out).count()
    assert(lineCount === docs.count())
  }

  test("malformed JSONL lines are quarantined with the raw line, never dropped or fatal") {
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "text", "lang", "source", "n_chars").limit(50)
    val out = Files.createTempDirectory("graft_jsonl_bad").toString + "/docs"
    CorpusSource.writeJsonl(docs.coalesce(1), out)
    // land a damaged file next to the good ones: a truncated JSON
    // object and a non-JSON line, the two classic ingest failures
    Files.write(Paths.get(out, "part-bad.json"),
      "{\"doc_id\": 99999, \"text\": \"truncat\nnot json at all\n".getBytes("UTF-8"),
      StandardOpenOption.CREATE)
    val (clean, corrupt) = CorpusSource.quarantine(
      CorpusSource.readJsonl(spark, out))
    assert(clean.count() === 50L)
    val bad = corrupt.select("raw_line").collect().map(_.getString(0))
    assert(bad.length === 2, bad.mkString("|"))
    assert(bad.exists(_.contains("truncat")) && bad.exists(_.contains("not json at all")))
  }

  test("line-delimited CSV round-trips quotes and commas with quarantine intact") {
    import spark.implicits._
    val tricky = Seq(
      (1L, "plain text", "en", "src0", 10L),
      (2L, "with \"quotes\" inside", "en", "src0", 20L),
      (4L, "comma, semicolon; both", "fr", "src2", 22L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = Files.createTempDirectory("graft_csv").toString + "/docs"
    CorpusSource.writeCsv(tricky, out)
    val (clean, corrupt) = CorpusSource.quarantine(CorpusSource.readCsv(spark, out))
    assert(corrupt.count() === 0L)
    assert(docsKey(clean.select("doc_id", "text", "lang", "source", "n_chars"))
      === docsKey(tricky))
  }

  test("multiLine CSV interop recovers embedded newlines through the native reader") {
    import spark.implicits._
    val tricky = Seq(
      (1L, "plain text", "en", "src0", 10L),
      (3L, "line one\nline two", "de", "src1", 17L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = Files.createTempDirectory("graft_csv_ml").toString + "/docs"
    CorpusSource.writeCsv(tricky.coalesce(1), out)
    val got = CorpusSource.readCsvMultiline(spark, out)
      .select("doc_id", "text", "lang", "source", "n_chars")
    assert(docsKey(got) === docsKey(tricky))
  }

  test("writeShards: deterministic balanced shards, exact round trip, manifest matches the files") {
    import graft.sinks.CorpusShards
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "text", "lang", "source", "n_chars")
    val out = Files.createTempDirectory("graft_shards").toString + "/corpus"
    val manifest = CorpusShards.writeShards(docs, out, shards = 8)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    // every shard populated, and the md5 assignment balances a
    // uniform id space (worst/best within 2x at 500 docs / 8 shards)
    assert(manifest.keySet === (0 until 8).toSet)
    assert(manifest.values.sum === docs.count())
    assert(manifest.values.max < 2L * manifest.values.min,
      s"shard skew: $manifest")
    // exact round trip: the written corpus re-reads row-for-row
    val back = spark.read.parquet(out)
    assert(back.count() === docs.count())
    val a = docs.collect().map(r => r.getLong(0) -> r.toSeq).toMap
    back.collect().foreach { r =>
      assert(r.toSeq.take(5) === a(r.getLong(0)), s"doc ${r.getLong(0)}")
    }
    // one file per shard directory — loaders stream sequentially
    (0 until 8).foreach { s =>
      val files = new java.io.File(s"$out/shard=$s")
        .listFiles().count(_.getName.endsWith(".parquet"))
      assert(files === 1, s"shard $s has $files files")
    }
    // assignment is a pure function of the id: a re-export from a
    // differently-partitioned frame lands every doc identically
    val out2 = Files.createTempDirectory("graft_shards2").toString + "/corpus"
    CorpusShards.writeShards(docs.repartition(13), out2, shards = 8)
    val s1 = spark.read.parquet(out).select("doc_id", "shard").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val s2 = spark.read.parquet(out2).select("doc_id", "shard").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(s1 === s2)
  }

  test("explicit schema means ingest runs zero inference jobs over the corpus") {
    import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "text", "lang", "source", "n_chars")
    val out = Files.createTempDirectory("graft_jsonl_plan").toString + "/docs"
    CorpusSource.writeJsonl(docs, out)
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = { jobs.incrementAndGet(); () }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      // building the plan must not scan anything: schema is declared
      val df = CorpusSource.readJsonl(spark, out)
      df.queryExecution.analyzed
      Thread.sleep(300) // listener bus drains asynchronously
      assert(jobs.get() === 0, s"${jobs.get()} jobs ran during plan build (schema inference?)")
    } finally spark.sparkContext.removeSparkListener(listener)
  }
}
