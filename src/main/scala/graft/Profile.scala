package graft

/** Dev utility: time selected queries twice (cold then warm) so
  * first-use costs (index builds, metadata parses, codegen) separate
  * from steady-state plan execution. Usage:
  *   runMain graft.Profile <sfDir> <query>...
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args.drop(1).toSeq else SparkEntry.queries.keys.toSeq.sorted
    val spark = GraftSession.create(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    def run(name: String): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir).write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    names.foreach { n =>
      val cold = run(n)
      val warm = run(n)
      println(f"[profile] $n%-28s cold $cold%7.2f s   warm $warm%7.2f s")
    }
    spark.stop()
  }
}
