package graft

object DebugX04 {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("x04_xbrl_calc_validate")
    val reps = if (args.length > 1) args(1).toInt else 5
    val spark = GraftSession.create("32")
    (1 to reps).foreach { i =>
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(name)(spark, "/root/testdata/sf0.1")
      df.write.format("noop").mode("overwrite").save()
      val total = (System.nanoTime() - t0) / 1e9
      val phases = df.queryExecution.tracker.phases.map {
        case (k, v) => f"$k=${(v.endTimeMs - v.startTimeMs) / 1000.0}%.2f"
      }.mkString(" ")
      println(f"[dbg] $name run $i%2d  total $total%6.2f s  ($phases)")
    }
    spark.stop()
  }
}
