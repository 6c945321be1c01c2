package graft

import org.apache.spark.sql.functions._

/** Dev utility (r18): phase anatomy of d18_substring_dedup. */
object D18Anatomy {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.create(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"), Some(sfDir))
    def t(label: String)(f: => Unit): Unit = {
      f // warm
      val reps = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"[d18] $label%-28s ${reps.min}%.2f s (reps ${reps.map(x => f"$x%.2f").mkString(",")})")
    }
    val T = 8
    val base = Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))
      .filter(col("text").isNotNull)
    val tokd = base
      .withColumn("toks",
        when(trim(col("text")) === "", array().cast("array<string>"))
          .otherwise(split(trim(col("text")), "\\s+")))
      .withColumn("n", size(col("toks")).cast("long"))
    val grams = tokd.filter(col("n") >= T)
      .select(col("doc_id"), explode(expr(
        s"transform(sequence(1, n - ${T - 1}), i -> " +
          s"struct(CAST(i AS BIGINT) AS pos, md5(concat_ws(' ', slice(toks, i, $T))) AS gh))"))
        .as("g"))
      .select(col("doc_id"), col("g.pos").as("pos"), col("g.gh").as("gh"))
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    t("tokd")(noop(tokd))
    t("grams (explode+md5)")(noop(grams))
    val keyed = grams.select(col("gh"),
      (shiftleft(col("doc_id").cast("long"), 32) + col("pos")).as("__k"))
    t("keyed")(noop(keyed))
    val firsts = keyed.groupBy("gh").agg(min(col("__k")).as("__kf"))
    t("firsts (agg)")(noop(firsts))
    val cov = keyed.join(firsts, Seq("gh"))
      .filter(col("__k") =!= col("__kf"))
      .select(shiftright(col("__k"), 32).as("doc_id"),
        col("__k").bitwiseAND(lit(4294967295L)).as("pos"))
      .groupBy("doc_id")
      .agg(sort_array(collect_set(col("pos"))).as("__starts"))
    t("coveredStarts (join+agg)")(noop(cov))
    t("full d18")(noop(
      graft.operators.Dedup.d18SubstringDedup(spark, sfDir)))
    // variant: one exchange shared by agg + probe (AQE stage reuse)
    val g2 = keyed.repartition(col("gh"))
    val firsts2 = g2.groupBy("gh").agg(min(col("__k")).as("__kf"),
      count(lit(1)).as("__c")).filter(col("__c") >= 2L).drop("__c")
    val cov2 = g2.join(firsts2, Seq("gh"))
      .filter(col("__k") =!= col("__kf"))
      .select(shiftright(col("__k"), 32).as("doc_id"),
        col("__k").bitwiseAND(lit(4294967295L)).as("pos"))
      .groupBy("doc_id")
      .agg(sort_array(collect_set(col("pos"))).as("__starts"))
    t("cov2 shared-exchange")(noop(cov2))
    // variant: dup-only firsts (current committed shape), fresh timing
    val firsts3 = keyed.groupBy("gh").agg(min(col("__k")).as("__kf"),
      count(lit(1)).as("__c")).filter(col("__c") >= 2L).drop("__c")
    val cov3 = keyed.join(firsts3, Seq("gh"))
      .filter(col("__k") =!= col("__kf"))
      .select(shiftright(col("__k"), 32).as("doc_id"),
        col("__k").bitwiseAND(lit(4294967295L)).as("pos"))
      .groupBy("doc_id")
      .agg(sort_array(collect_set(col("pos"))).as("__starts"))
    t("cov3 dup-only recompute")(noop(cov3))
    spark.stop()
  }
}
