package graft

/** Benchmark main: runs every SparkEntry query at the given sf dir and
  * prints one JSON line. Each query is materialized through the `noop`
  * datasource (full execution of every operator — including final sorts
  * and projections that `.count()` would let Catalyst prune away).
  *
  * Each query runs `SPARK_GRAFT_REPS` times (default 3). The headline
  * `queries`/`value` numbers are the FIRST repetition — cold-path,
  * comparable round-over-round — while `reps` carries every repetition
  * so background-load noise (±30% run-to-run on this box) is visible
  * per query. Repetitions after the first run warm: JIT-compiled code,
  * OS page cache, and any SharedIndex build from the first pass.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt
    val spark = GraftSession.create(cpus)
    // untimed warmup: JVM/JIT + codegen + parquet footer reads happen
    // once here instead of inflating the first timed query
    try SparkEntry.queries("q03_filter_project")(spark, sfDir)
      .write.format("noop").mode("overwrite").save()
    catch { case _: Throwable => () }
    def runOnce(name: String, fn: (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable => System.err.println(s"[bench] $name failed: ${e.getMessage}") }
      (System.nanoTime() - t0) / 1e9
    }
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      name -> Seq.fill(math.max(1, reps))(runOnce(name, fn))
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v.head }
      .mkString("{", ",", "}")
    val rs = results.map { case (k, v) => "\"" + k + "\":" + v.mkString("[", ",", "]") }
      .mkString("{", ",", "}")
    val total = results.map(_._2.head).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"reps":$rs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
