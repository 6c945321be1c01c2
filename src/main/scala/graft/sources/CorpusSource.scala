package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** Text-corpus ingest/egress beyond parquet: JSONL (the lingua franca
  * of LLM training corpora — one JSON document per line) and CSV, with
  * the three disciplines that keep these formats viable at 100 TB:
  *
  *  1. **Explicit schema, always.** Schema inference is a SECOND full
  *     pass over the input before the real job starts (and samples at
  *     that — a rare typed field inferred wrong corrupts silently).
  *     Every reader here takes a schema, defaulting to the documents
  *     shape.
  *  2. **Quarantine, don't crash.** One malformed line among billions
  *     must not kill the job (FAILFAST) or silently vanish
  *     (DROPMALFORMED). Readers run PERMISSIVE with a corrupt-record
  *     column; [[quarantine]] splits the result into (clean, corrupt)
  *     so bad lines are COUNTED and kept for inspection — the d14/t08
  *     hygiene attitude applied at the ingest boundary.
  *  3. **Stay splittable.** Uncompressed (or zstd-framed) JSONL splits
  *     by line offset — every executor reads its own byte range. A
  *     gzip .jsonl.gz is ONE task per file regardless of size; repack
  *     such inputs before a big run. CSV additionally loses
  *     splittability under `multiLine` (embedded unescaped newlines
  *     force whole-file parses) — which is why JSONL, whose escaping
  *     makes every document one physical line BY CONSTRUCTION, is the
  *     corpus format of choice and CSV is interop only.
  */
object CorpusSource {

  /** The documents-table shape (TESTDATA.md). */
  val documentsSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  private val CorruptCol = "_corrupt_record"

  private def withCorrupt(schema: StructType): StructType =
    if (schema.fieldNames.contains(CorruptCol)) schema
    else schema.add(StructField(CorruptCol, StringType))

  /** Read a JSONL corpus with an explicit schema; malformed lines land
    * in `_corrupt_record` (raw line preserved, data fields null)
    * instead of failing the job. Splittable line-by-line when the
    * files are uncompressed.
    *
    * Deliberately a TEXT scan + `from_json` rather than
    * `spark.read.json`: identical per-line parse work (one Jackson
    * pass inside the scan stage, no extra job), but the corrupt
    * column is an ordinary projected column — the native json source
    * forbids any query whose referenced columns reduce to the corrupt
    * column alone (so even `quarantine(...)._2.count()` would throw,
    * and the documented workaround is CACHING the corpus — a full
    * materialization this formulation never needs).
    */
  def readJsonl(spark: SparkSession, path: String,
      schema: StructType = documentsSchema): DataFrame = {
    val opts = Map("mode" -> "PERMISSIVE", "columnNameOfCorruptRecord" -> CorruptCol)
    spark.read.textFile(path).toDF("__line")
      .select(from_json(col("__line"), withCorrupt(schema), opts).as("j"))
      .select(col("j.*"))
  }

  /** Split a PERMISSIVE read into (clean, corrupt): clean rows drop the
    * corrupt column; corrupt rows keep EVERY column (CSV PERMISSIVE
    * parses salvageable fields of a bad line — worth keeping for
    * triage) plus the raw offending line as `raw_line`. Two map-only
    * filters over the same scan. Keeping the data columns on the
    * corrupt branch also satisfies Spark's raw-file restriction that a
    * query must reference more than the corrupt column alone.
    */
  def quarantine(df: DataFrame): (DataFrame, DataFrame) = {
    val clean = df.filter(col(CorruptCol).isNull).drop(CorruptCol)
    val corrupt = df.filter(col(CorruptCol).isNotNull)
      .withColumnRenamed(CorruptCol, "raw_line")
    (clean, corrupt)
  }

  /** Write a frame as JSONL — JSON escaping folds embedded newlines/
    * quotes into the line, so every document is exactly one physical
    * line and the output re-reads splittably.
    */
  def writeJsonl(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  /** Read line-delimited CSV with an explicit schema + quarantine
    * column — the same text-scan + `from_csv` shape as [[readJsonl]]
    * (splittable, quarantine-able without caching). One record must be
    * one physical line: data with embedded newlines belongs in JSONL
    * (or goes through [[readCsvMultiline]] for interop). Each part
    * file's header line is dropped by exact match.
    */
  def readCsv(spark: SparkSession, path: String,
      schema: StructType = documentsSchema, header: Boolean = true): DataFrame = {
    val opts = Map("mode" -> "PERMISSIVE",
      "columnNameOfCorruptRecord" -> CorruptCol, "escape" -> "\"")
    val lines = spark.read.textFile(path).toDF("__line")
    val data = if (header)
      lines.filter(col("__line") =!= lit(schema.fieldNames.mkString(",")))
    else lines
    data.select(from_csv(col("__line"), withCorrupt(schema), opts).as("c"))
      .select(col("c.*"))
  }

  /** Interop-only CSV reader for data with embedded unescaped
    * newlines: `multiLine` parses whole files in single tasks (NOT
    * splittable) through Spark's native source. Carries the corrupt
    * column, but the native source forbids queries that reference it
    * alone — persist the frame before corrupt-only filters (Spark's
    * own rule), or better, convert to JSONL once and never come back.
    */
  def readCsvMultiline(spark: SparkSession, path: String,
      schema: StructType = documentsSchema): DataFrame =
    spark.read
      .schema(withCorrupt(schema))
      .option("header", "true")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .option("multiLine", "true")
      .option("escape", "\"")
      .csv(path)

  /** Write CSV (header, RFC-4180 quote-escaping). Embedded newlines
    * survive the round trip only through a `multiLine = true` read —
    * see the splittability note above.
    */
  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite")
      .option("header", "true")
      .option("escape", "\"")
      .csv(path)
}
