package graft

/** Benchmark main: runs every SparkEntry query at the given sf dir and
  * prints one JSON line. Each query is materialized through the `noop`
  * datasource (full execution of every operator — including final sorts
  * and projections that `.count()` would let Catalyst prune away).
  *
  * Per query: ONE untimed warmup rep (JIT compile, codegen cache, OS page
  * cache, SharedIndex builds settle) followed by `SPARK_GRAFT_REPS` timed
  * reps (default 3). The headline `queries`/`value` numbers are the MEDIAN
  * of the timed reps — steady-state throughput, which is the number that
  * scales to a long-running cluster job; `reps` carries every timed
  * repetition so background-load noise (±30% run-to-run on this box)
  * stays visible per query.
  *
  * The JSON line is also written to a file (`SPARK_GRAFT_BENCH_OUT`,
  * default ./bench_last.json): terminal tail-capture truncated the r5
  * line mid-object, so the artifact must not depend on stdout
  * surviving intact.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt
    val spark = GraftSession.create(cpus)
    def runOnce(name: String, fn: (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable => System.err.println(s"[bench] $name failed: ${e.getMessage}") }
      (System.nanoTime() - t0) / 1e9
    }
    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted
      if (s.size % 2 == 1) s(s.size / 2) else (s(s.size / 2 - 1) + s(s.size / 2)) / 2.0
    }
    // Locale.ROOT: a comma-decimal default locale would render "1,234"
    // and corrupt the JSON
    def r3(x: Double): String = String.format(java.util.Locale.ROOT, "%.3f", Double.box(x))
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      runOnce(name, fn) // untimed warmup rep
      name -> Seq.fill(math.max(1, reps))(runOnce(name, fn))
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + r3(median(v)) }
      .mkString("{", ",", "}")
    val rs = results.map { case (k, v) => "\"" + k + "\":" + v.map(r3).mkString("[", ",", "]") }
      .mkString("{", ",", "}")
    val total = results.map { case (_, v) => median(v) }.sum
    val line =
      s"""{"metric":"total","value":${r3(total)},"unit":"sec","headline":"median_of_${reps}_reps_after_warmup","queries":$qs,"reps":$rs,"sf":"$sfDir"}"""
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_last.json")
    try {
      val w = new java.io.PrintWriter(outPath)
      try w.println(line) finally w.close()
    } catch { case e: Throwable => System.err.println(s"[bench] file write failed ($outPath): ${e.getMessage}") }
    println(line)
    spark.stop()
  }
}
