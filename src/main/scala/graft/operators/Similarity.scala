package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import graft.functions.{CosineSimilarity, HyperplaneBuckets}

/** Approximate-nearest-neighbor search over the `embeddings` table
  * (SURVEY.md §2.4).
  *
  * s01 is the exact baseline (brute-force cosine top-k for a small query
  * set — broadcast the queries, never cross-join two big sides). s02 is
  * the scale path: random-hyperplane LSH bucketing so each query only
  * scores its bucket's candidates. Pair scoring uses the native
  * codegen'd `graft_cosine` expression (functions/CosineSimilarity.scala).
  */
object Similarity {

  private val K = 10
  private val NumQueries = 10

  /** Brute-force cosine top-k for queries vec_id < NumQueries.
    * Query side is tiny → broadcast join; the corpus side streams through
    * the fused codegen'd cosine. One shuffle for the per-query window.
    */
  def s01AnnBruteforce(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(s, dir)
    val queries = e.filter(col("vec_id") < NumQueries)
    val w = Window.partitionBy("q_id").orderBy(col("cosine").desc, col("n_id").asc)
    broadcast(queries.as("a"))
      .join(e.as("b"), col("a.vec_id") =!= col("b.vec_id"))
      .select(col("a.vec_id").as("q_id"), col("b.vec_id").as("n_id"),
        CosineSimilarity.cosine(s, col("a.embedding"), col("b.embedding")).as("cosine"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= K)
      .select(col("q_id"), col("rank"), col("n_id"), round(col("cosine"), 6).as("cosine"))
      .orderBy("q_id", "rank")
  }

  /** Random-hyperplane LSH ANN: bucket = sign bits of plane dot products,
    * per hash table; candidates share a bucket in any table; exact cosine
    * rescoring within buckets only. rows-only oracle; SimilaritySpec
    * measures recall vs s01 and pins bucket ids bit-identical to the
    * reference `aggregate(zip_with(...))` formulation.
    *
    * Bucketing is one native codegen'd expression
    * (functions/HyperplaneBuckets.scala) computing all
    * [[HyperplaneBuckets.NumTables]] bucket ids in a single fused loop
    * over the embedding — map-only inside the parquet scan, so the pass
    * stays in whole-stage codegen at any scale. The plane geometry
    * (8 tables x 4 planes for this embedding space's ~65-75° neighbor
    * angles → ~0.67-0.75 candidate recall) lives with the expression.
    */
  def s02AnnLsh(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(s, dir)

    // shared per session: the query side filters the SAME cached store,
    // so bucketing runs once instead of once per join side
    val bucketed = SharedIndex(s, dir, "hyperplane_buckets") {
      e.select(col("vec_id"), col("embedding"),
        posexplode(HyperplaneBuckets.buckets(s, col("embedding"))).as(Seq("tbl", "bucket")))
    }

    val queries = bucketed.filter(col("vec_id") < NumQueries)
    val cand = broadcast(queries.as("a"))
      .join(bucketed.as("b"),
        col("a.tbl") === col("b.tbl") && col("a.bucket") === col("b.bucket") &&
          col("a.vec_id") =!= col("b.vec_id"))
      .select(col("a.vec_id").as("q_id"), col("b.vec_id").as("n_id"),
        CosineSimilarity.cosine(s, col("a.embedding"), col("b.embedding")).as("cosine"))
      .groupBy("q_id", "n_id").agg(max(col("cosine")).as("cosine")) // dedup across tables
    val w = Window.partitionBy("q_id").orderBy(col("cosine").desc, col("n_id").asc)
    cand.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= K)
      .select(col("q_id"), col("rank"), col("n_id"), round(col("cosine"), 6).as("cosine"))
      .orderBy("q_id", "rank")
  }
}
