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
      // fixed shuffle partitions are the classic scale trap: per-task
      // shuffle volume grows linearly with data until the sort-agg
      // spills (d18's gram window at 5M docs: 270M rows over 32 tasks
      // = 8M+ rows/task, found by the r14 1000x profile). Start big
      // shuffles at 16x the core count and let AQE coalesce down —
      // parallelismFirst (default true) keeps small shuffles at ~core
      // parallelism, so small-sf gate plans are unaffected while the
      // 1000x runs split spills 16 ways (870685f measured 324→259 s,
      // ~linear 10.6x at 5M docs). The r14 round-close snapshot commit
      // accidentally reverted this; re-applied in r17 (see
      // OPTIMIZATION_r17.md). The cluster analog is sizing
      // initialPartitionNum to data/target-partition-bytes.
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum",
        sys.env.getOrElse("SPARK_GRAFT_INIT_PARTS", (cpus.toInt * 16).toString))
      // Janino codegen cache (STATIC conf, default 100 entries): this
      // engine's standing surface is ~145 declared queries plus the 255
      // per-table XBRL projections — far past 100 generated-class
      // sources — so at the default every x05 run re-compiles all 255
      // wide projections (~30-300 ms each, measured r17) and every
      // bench pass re-compiles most of the suite. Sized to hold the
      // whole working set; the driver pays compilation once per JVM
      // instead of once per run. Cluster-relevant too: codegen compiles
      // on executors as well, and the same eviction applies there.
      .config("spark.sql.codegen.cache.maxEntries", "4096")
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
