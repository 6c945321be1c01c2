package graft

import org.apache.spark.sql.functions._

/** Bucketing demonstration (SURVEY §5): pre-bucketing both sides of a
  * recurring join on the join key removes the exchange entirely — the
  * physical property that turns a repeated 100 TB fact-dim join from
  * two full shuffles into a local merge per bucket.
  */
class BucketingSpec extends SparkSpec {

  private def shuffles(df: org.apache.spark.sql.DataFrame): Int = {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.{ReusedExchangeExec, ShuffleExchangeLike}
    df.collect()
    def walk(p: SparkPlan): Int = p match {
      case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
      case q: QueryStageExec => walk(q.plan)
      case _: ReusedExchangeExec => 0
      case s: ShuffleExchangeLike => 1 + s.children.map(walk).sum
      case other => other.children.map(walk).sum
    }
    walk(df.queryExecution.executedPlan)
  }

  test("bucketed tables join without any shuffle exchange") {
    val sf = "/root/testdata/sf0.001"
    spark.sql("DROP TABLE IF EXISTS graft_orders_b")
    spark.sql("DROP TABLE IF EXISTS graft_customer_b")
    try {
      Tables.orders(spark, sf).write
        .bucketBy(8, "o_custkey").sortBy("o_custkey")
        .mode("overwrite").saveAsTable("graft_orders_b")
      Tables.customer(spark, sf).write
        .bucketBy(8, "c_custkey").sortBy("c_custkey")
        .mode("overwrite").saveAsTable("graft_customer_b")

      // disable auto-broadcast so the comparison isolates partitioning:
      // at real scale neither side of a fact-fact join broadcasts
      val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      try {
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        val bucketed = spark.table("graft_orders_b")
          .join(spark.table("graft_customer_b"), col("o_custkey") === col("c_custkey"))
          .select("o_orderkey", "c_mktsegment")
        val plain = Tables.orders(spark, sf)
          .join(Tables.customer(spark, sf), col("o_custkey") === col("c_custkey"))
          .select("o_orderkey", "c_mktsegment")
        assert(shuffles(bucketed) === 0, "bucketed join must be exchange-free")
        assert(shuffles(plain) === 2, "unbucketed sides each shuffle")
        assert(bucketed.count() === plain.count())
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
    } finally {
      spark.sql("DROP TABLE IF EXISTS graft_orders_b")
      spark.sql("DROP TABLE IF EXISTS graft_customer_b")
    }
  }
}
