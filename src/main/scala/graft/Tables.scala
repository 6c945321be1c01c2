package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated synthetic tables (see TESTDATA.md).
  *
  * One parquet file per table under the scale-factor directory. All graft
  * operators take the sf dir as a parameter so the same code runs at any
  * scale; at cluster scale these would be partitioned directories, which
  * `spark.read.parquet` handles identically.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  /** The whole engine treats `events.ts` as a NANOSECOND epoch long —
    * exact integer gap/bucket math, identical ordering on both engines.
    * The driver has shipped the column two ways across testdata
    * generations: INT64 TIMESTAMP(NANOS) (read as a plain long via
    * `spark.sql.legacy.parquet.nanosAsLong=true`, set at session build)
    * and plain µs TIMESTAMP (which Spark reads as TIMESTAMP_NTZ).
    * Normalize here, once, so every operator downstream sees ns longs
    * whichever vintage of the files is on disk: an NTZ wall-clock is
    * reinterpreted as UTC (the session zone, so the cast is exact) and
    * scaled to ns. DuckDB reads the same µs file as a naive TIMESTAMP
    * whose epoch functions also assume UTC — the two engines agree on
    * the integer by construction.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, unix_micros}
    import org.apache.spark.sql.types.{LongType, TimestampType}
    val df = load(s, d, "events")
    df.schema("ts").dataType match {
      case LongType => df // TIMESTAMP(NANOS) vintage, already ns longs
      case _ =>
        df.withColumn("ts", unix_micros(col("ts").cast(TimestampType)) * 1000L)
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
