package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import graft.functions.CosineSimilarity

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

  /** Deterministic pseudo-random hyperplanes: planes(t)(p) is a 64-dim
    * array of ±1-ish doubles derived from a splitmix64 stream — the same
    * construction a seeded RNG would give, but reproducible across engines
    * and sessions.
    */
  /** 8 tables x 4 planes: for the ~65-75 degree angles that separate
    * top-k neighbors in this embedding space, P(bucket match per table)
    * = (1 - theta/pi)^4 ~= 0.13-0.16, so 8 tables give ~0.67-0.75
    * candidate recall. The earlier 4x8 configuration had ~6% recall —
    * tighter buckets than the data's similarity structure supports.
    * More tables = more candidates per query; the rescoring stays
    * bucket-local either way.
    */
  private val Dim = 64
  private val NumTables = 8
  private val PlanesPerTable = 4
  private[operators] val planes: Array[Array[Array[Double]]] = {
    var z = 0x243F6A8885A308D3L
    def next(): Long = {
      z += 0x9E3779B97F4A7C15L
      var x = z
      x = (x ^ (x >>> 30)) * 0xBF58476D1CE4E5B9L
      x = (x ^ (x >>> 27)) * 0x94D049BB133111EBL
      x ^ (x >>> 31)
    }
    Array.fill(NumTables, PlanesPerTable, Dim)(next().toDouble / Long.MaxValue.toDouble)
  }

  /** Random-hyperplane LSH ANN: bucket = sign bits of plane dot products,
    * per hash table; candidates share a bucket in any table; exact cosine
    * rescoring within buckets only. rows-only oracle; SimilaritySpec
    * measures recall vs s01.
    */
  def s02AnnLsh(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(s, dir)

    // bucket id per (vector, table): sign bits of plane dot products
    def bucketCol(t: Int) = (0 until PlanesPerTable).map { p =>
      val dot = expr(s"aggregate(zip_with(embedding, ${planeSql(t, p)}, (x, y) -> CAST(x AS DOUBLE) * y), CAST(0 AS DOUBLE), (acc, v) -> acc + v)")
      when(dot >= 0, lit(1 << p)).otherwise(0)
    }.reduce(_ + _)
    def planeSql(t: Int, p: Int): String =
      planes(t)(p).mkString("array(", ", ", ")")

    // shared per session: the query side filters the SAME cached store,
    // so bucketing runs once instead of once per join side
    val bucketed = SharedIndex(s, dir, "hyperplane_buckets") {
      e.select(
        col("vec_id"), col("embedding"),
        explode(array((0 until NumTables).map(t =>
          struct(lit(t).as("tbl"), bucketCol(t).as("bucket"))): _*)).as("tb"))
        .select(col("vec_id"), col("embedding"),
          col("tb.tbl").as("tbl"), col("tb.bucket").as("bucket"))
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
