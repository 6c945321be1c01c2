package graft

import graft.operators.Similarity
import org.apache.spark.sql.functions._

/** ANN specs: LSH recall against the brute-force baseline, plus the
  * cosine math agreeing between the two implementations.
  */
class SimilaritySpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("s02 LSH retrieves a usable fraction of s01's exact top-k") {
    val exact = Similarity.s01AnnBruteforce(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val lsh = Similarity.s02AnnLsh(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    assert(exact.nonEmpty && lsh.nonEmpty)
    val recall = exact.count(lsh.contains).toDouble / exact.size
    // 8x4 hyperplane config on near-orthogonal synthetic vectors:
    // expected candidate recall ~0.6-0.75; assert well above random
    // chance (k/n ~= 20% at this sf). s01 remains the exact baseline.
    assert(recall >= 0.4, s"recall $recall")
  }

  test("s01 and s02 agree on cosine values for common pairs") {
    val exact = Similarity.s01AnnBruteforce(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(3)).toMap
    val lsh = Similarity.s02AnnLsh(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(3))
    val common = lsh.filter { case (k, _) => exact.contains(k) }
    assert(common.nonEmpty)
    common.foreach { case (k, c) => assert(math.abs(exact(k) - c) < 1e-9, s"$k") }
  }

  test("s03 IVF retrieves a usable fraction of s01's exact top-k") {
    val exact = Similarity.s01AnnBruteforce(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val ivf = Similarity.s03AnnIvf(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    assert(exact.nonEmpty && ivf.nonEmpty)
    val recall = exact.count(ivf.contains).toDouble / exact.size
    // probing 8 of 32 cells scans ~25% of the corpus; nearest-cell
    // probing concentrates true neighbors far above that floor
    assert(recall >= 0.4, s"recall $recall")
  }

  test("s03 cosines agree exactly with s01 for common pairs") {
    val exact = Similarity.s01AnnBruteforce(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(3)).toMap
    val ivf = Similarity.s03AnnIvf(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(3))
    val common = ivf.filter { case (k, _) => exact.contains(k) }
    assert(common.nonEmpty)
    common.foreach { case (k, c) => assert(math.abs(exact(k) - c) < 1e-9, s"$k") }
  }

  test("native graft_hyperplane_buckets is bit-identical to the HOF fold formulation") {
    import graft.functions.HyperplaneBuckets
    val e = Tables.embeddings(spark, sf)
    // reference formulation: 32 aggregate(zip_with(...)) HOF dot products,
    // the pre-r5 bucketing path the native expression replaced
    def planeSql(t: Int, p: Int): String =
      HyperplaneBuckets.planes(t)(p).mkString("array(", ", ", ")")
    def hofBucket(t: Int) = (0 until HyperplaneBuckets.PlanesPerTable).map { p =>
      val dot = expr(s"aggregate(zip_with(embedding, ${planeSql(t, p)}, (x, y) -> CAST(x AS DOUBLE) * y), CAST(0 AS DOUBLE), (acc, v) -> acc + v)")
      when(dot >= 0, lit(1 << p)).otherwise(0)
    }.reduce(_ + _)
    val rows = e.select(
      array((0 until HyperplaneBuckets.NumTables).map(hofBucket): _*).as("hof"),
      HyperplaneBuckets.buckets(spark, col("embedding")).as("native"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getSeq[Int](0) === r.getSeq[Int](1))
    }
  }

  test("s01 ranks are dense per query and ordered by cosine desc") {
    val rows = Similarity.s01AnnBruteforce(spark, sf)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(3)))
    rows.groupBy(_._1).foreach { case (_, rs) =>
      val sorted = rs.sortBy(_._2)
      assert(sorted.map(_._2).toSeq === (1 to sorted.size).toSeq)
      assert(sorted.map(_._3).toSeq === sorted.map(_._3).sorted(Ordering[Double].reverse).toSeq)
    }
  }
}
