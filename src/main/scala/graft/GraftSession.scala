package graft

import org.apache.spark.sql.SparkSession

/** Single place where graft sessions are configured. Every entry point
  * (Verify, Bench, ScalaTest) builds through here so session-level flags
  * are set once at build time, never mutated mid-plan.
  */
object GraftSession {
  def builder(cpus: String): SparkSession.Builder =
    SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      // events.parquet carries INT64 TIMESTAMP(NANOS); read as plain long
      // (see Tables.events).
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // native graft expressions (graft_cosine) injected at session
      // build, so every derived session resolves them in SQL
      .config("spark.sql.extensions", "graft.GraftExtensions")
      // the local test corpus is single-digit-MB single-file tables; the
      // 128 MB default maxPartitionBytes packs each whole table into ONE
      // scan task, so a map-only query runs serially however many cores
      // the session has — and the 4 MB default openCostInBytes floors
      // maxSplitBytes = min(maxPartitionBytes, max(openCost, bytes/cores))
      // so lowering only the max changes nothing for small files. With a
      // 256 KB open cost the bytes-per-core term takes over and scans
      // split toward one task per core (splits without a row-group start
      // are empty and cost nothing). A cluster deployment against real
      // multi-file data keeps the defaults.
      .config("spark.sql.files.maxPartitionBytes", s"${4 * 1024 * 1024}")
      .config("spark.sql.files.openCostInBytes", s"${256 * 1024}")
      .config("spark.ui.enabled", "false")

  def create(cpus: String): SparkSession = {
    val s = builder(cpus).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
