package graft

import graft.functions.CosineSimilarity
import org.apache.spark.sql.functions._

/** Specs for the native graft_cosine Catalyst expression: agreement
  * with the composed higher-order-function formulation (bit-identical),
  * SQL registration, null handling, and codegen execution.
  */
class CosineSimilaritySpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("matches the composed aggregate/zip_with formulation bit-for-bit") {
    val e = Tables.embeddings(spark, sf).limit(50)
    val composed = e.as("a").join(e.as("b"), col("a.vec_id") < col("b.vec_id"))
      .select(
        CosineSimilarity.cosine(spark, col("a.embedding"), col("b.embedding")).as("native"),
        (expr("aggregate(zip_with(a.embedding, b.embedding, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), CAST(0 AS DOUBLE), (acc, v) -> acc + v)")
          / (expr("sqrt(aggregate(a.embedding, CAST(0 AS DOUBLE), (acc, x) -> acc + CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))")
            * expr("sqrt(aggregate(b.embedding, CAST(0 AS DOUBLE), (acc, x) -> acc + CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))"))).as("composed"))
      .collect()
    assert(composed.nonEmpty)
    composed.foreach(r => assert(r.getDouble(0) === r.getDouble(1)))
  }

  test("resolves from SQL through the FunctionRegistry") {
    CosineSimilarity.register(spark)
    val row = spark.sql(
      "SELECT graft_cosine(array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)), array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)))")
      .collect().head
    assert(math.abs(row.getDouble(0) - 1.0) < 1e-12)
  }

  test("null inputs yield null, identical vectors yield 1, orthogonal yield 0") {
    CosineSimilarity.register(spark)
    val df = Seq(
      (Some(Array(1.0f, 2.0f)), Some(Array(1.0f, 2.0f))),
      (Some(Array(1.0f, 0.0f)), Some(Array(0.0f, 1.0f))),
      (None, Some(Array(1.0f, 0.0f))))
      .toDF("a", "b")
      .selectExpr("graft_cosine(a, b) AS c")
      .collect()
    assert(math.abs(df(0).getDouble(0) - 1.0) < 1e-12)
    assert(math.abs(df(1).getDouble(0)) < 1e-12)
    assert(df(2).isNullAt(0))
  }

  test("zero-norm vectors yield null, not NaN, in both eval paths") {
    CosineSimilarity.register(spark)
    // codegen path
    val codegen = Seq((Array(0.0f, 0.0f), Array(1.0f, 2.0f)),
        (Array(1.0f, 2.0f), Array(0.0f, 0.0f)),
        (Array.empty[Float], Array.empty[Float]))
      .toDF("a", "b").selectExpr("graft_cosine(a, b) AS c").collect()
    assert(codegen.forall(_.isNullAt(0)))
    // interpreted path (fold the same literals on the driver)
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.CatalystTypeConverters
    import org.apache.spark.sql.types.{ArrayType, FloatType}
    def lit(xs: Array[Float]) =
      Literal(CatalystTypeConverters.convertToCatalyst(xs), ArrayType(FloatType))
    val interpreted = functions.CosineSimilarity(
      lit(Array(0.0f, 0.0f)), lit(Array(1.0f, 2.0f))).eval(null)
    assert(interpreted == null)
  }

  test("expression participates in whole-stage codegen") {
    val e = Tables.embeddings(spark, sf)
    val df = e.as("a").join(broadcast(e.as("b")), col("a.vec_id") < col("b.vec_id"))
      .select(CosineSimilarity.cosine(spark, col("a.embedding"), col("b.embedding")).as("c"))
      .filter(col("c") > -2)
    assert(df.limit(5).count() === 5L) // execute so AQE finalizes the plan
    df.collect()
    // `*(n)` prefixes mark whole-stage-codegen stages; the projection
    // evaluating graft_cosine must carry one
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(") && plan.contains("Project [graft_cosine"), plan)
  }
}
