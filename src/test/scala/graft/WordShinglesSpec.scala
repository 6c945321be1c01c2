package graft

import graft.functions.WordShingles
import org.apache.spark.sql.functions._

/** Native word_shingles expression: agreement with the composed
  * transform/concat_ws formulation, edge cases, and codegen execution.
  */
class WordShinglesSpec extends SparkSpec {
  import spark.implicits._

  test("matches the composed transform formulation on real documents") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .withColumn("tokens", split(col("text"), " "))
      .filter(size(col("tokens")) >= 3)
    val both = docs.select(
      WordShingles.shingles(spark, col("tokens"), 3).as("native"),
      expr("transform(sequence(1, size(tokens) - 2), i -> concat_ws(' ', element_at(tokens, i), element_at(tokens, i + 1), element_at(tokens, i + 2)))").as("composed"))
      .collect()
    assert(both.nonEmpty)
    both.foreach(r => assert(r.getSeq[String](0) === r.getSeq[String](1)))
  }

  test("short token arrays yield empty shingle lists") {
    val df = Seq(Seq("a"), Seq("a", "b"), Seq("a", "b", "c")).toDF("tokens")
    val out = df.select(WordShingles.shingles(spark, col("tokens"), 3).as("s"))
      .collect().map(_.getSeq[String](0))
    assert(out(0).isEmpty && out(1).isEmpty)
    assert(out(2) === Seq("a b c"))
  }

  test("executes inside whole-stage codegen") {
    val df = Tables.documents(spark, "/root/testdata/sf0.001")
      .withColumn("tokens", split(col("text"), " "))
      .select(explode(WordShingles.shingles(spark, col("tokens"), 2)).as("s"))
    assert(df.count() > 0)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*("), plan) // whole-stage-codegen stage marker
  }
}
