package graft

import org.apache.spark.sql.functions._

import graft.operators.Relational

/** q29 skew probe at the sf100 joins rung (r16, CHECK_sf100_joins.txt
  * companion): times the SAME big-big equi-join three ways over a
  * corpus with a planted hot key —
  *
  *   plain        vanilla `.join` with the session defaults (AQE skew
  *                join ON — Spark's own post-hoc split of oversized
  *                partitions)
  *   plain_noaqe  vanilla `.join` with AQE's skew split disabled —
  *                the regime q29's scaladoc names (shuffled-hash /
  *                join-feeding-agg pipelines where the AQE rule can't
  *                apply): the hot key lands in ONE reducer
  *   salted       [[Relational.saltedJoin]] — the deterministic
  *                pre-split the operator exists for
  *
  * Each run materializes through the noop sink; reps interleave
  * (the Bench discipline). The point is an HONEST comparison: where
  * AQE's split applies it may match the salt, and recording that is
  * the evidence for the scaladoc's "when AQE can't apply" framing.
  *
  * `hotPct` amplifies the corpus's planted skew IN-FLIGHT (rewrites
  * that percentage of rows onto key 42 before the join) so one run
  * can sweep the skew ratio to the crossover: at local[32] a hot key
  * only straggles once it exceeds the ~n/cores rows an average core
  * already processes — the same law, with `executors x cores` in the
  * denominator, that decides salting on a cluster.
  *
  * Args: sfDir [reps=3] [salt=8] [hotPct=0]
  */
object JoinSkewProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val salt = args.lift(2).map(_.toInt).getOrElse(8)
    val hotPct = args.lift(3).map(_.toInt).getOrElse(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.create(cpus, Some(sfDir))
    val skewConf = "spark.sql.adaptive.skewJoin.enabled"
    def events = {
      val e = Tables.events(spark, sfDir)
        .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
      if (hotPct <= 0) e
      else e.withColumn("user_id",
        when(pmod(col("event_id"), lit(100L)) < hotPct, lit(42L))
          .otherwise(col("user_id")))
    }
    def customer = Tables.customer(spark, sfDir)
      .select(col("c_custkey").as("user_id"), col("c_name"), col("c_acctbal"))
    def time(name: String)(mk: => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      mk.write.format("noop").mode("overwrite").save()
      val w = (System.nanoTime() - t0) / 1e9
      println(f"[skewprobe] $name wall=$w%.1fs")
      w
    }
    val walls = scala.collection.mutable.Map.empty[String, Vector[Double]]
      .withDefaultValue(Vector.empty)
    for (_ <- 1 to reps) {
      walls("plain") :+= time("plain") { events.join(customer, "user_id") }
      walls("plain_noaqe") :+= {
        // restore the PRE-PROBE value, not a literal: a session run
        // with skew join disabled must not be silently flipped on for
        // the subsequent plain/salted reps this probe compares against
        val prior = spark.conf.getOption(skewConf)
        spark.conf.set(skewConf, "false")
        try time("plain_noaqe") { events.join(customer, "user_id") }
        finally prior match {
          case Some(v) => spark.conf.set(skewConf, v)
          case None => spark.conf.unset(skewConf)
        }
      }
      walls("salted") :+= time("salted") {
        Relational.saltedJoin(events, customer, on = "user_id", salt = salt)
      }
    }
    walls.toSeq.sortBy(_._1).foreach { case (k, v) =>
      println(f"[skewprobe] $k min=${v.min}%.1fs reps=${v.map(x => f"$x%.1f").mkString(",")}")
    }
    spark.stop()
  }
}
