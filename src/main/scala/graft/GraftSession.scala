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
      .config("spark.ui.enabled", "false")

  def create(cpus: String): SparkSession = {
    val s = builder(cpus).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
