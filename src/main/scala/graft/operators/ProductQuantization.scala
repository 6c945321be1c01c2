package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import graft.functions.{CosineSimilarity, L2Squared, PqAdc, PqEncode}

/** Product-quantization ANN (SURVEY.md §2.4, s05) — the memory-bound
  * scale path the IVF/LSH variants don't cover: the corpus is stored as
  * `m` small integer codes per vector (8 codes vs 64 floats = 32x less
  * scan data), queries scan the CODES with an asymmetric-distance
  * lookup table (`graft_pq_adc`, m array reads per row), shortlist the
  * closest reconstructions, and only the shortlist rows are rescored
  * against the original floats. At 100 TB the float embeddings are read
  * twice-never: once at encode time (an offline index build) and once
  * for the tiny shortlist join-back; every query scan touches only the
  * compact code table.
  *
  * Cosine queries are served by unit-normalizing vectors before
  * training/encoding (cosine ordering == squared-L2 ordering on the
  * unit sphere, exactly), so the ADC score — the EXACT squared L2
  * between the query and the row's reconstruction — is an unbiased
  * shortlist key; the final cosines are exact (graft_cosine on the
  * original vectors), so returned scores match the brute-force baseline
  * bit-for-bit on the pairs both return.
  *
  * Codebook training is per-subspace Lloyd (k-means), the same
  * DataFrame shape as [[Similarity.trainIvfCodebook]]: hash-sampled
  * init (order-bias-free), broadcast centroid assignment (map-only over
  * the big side), one row per (vector, subspace) through the shuffle,
  * checkpoint-released rounds. Empty cells keep their previous centroid
  * so the codebook never shrinks.
  */
object ProductQuantization {

  private val M = 8
  private val KCodes = 16
  private val Shortlist = 64
  private val K = 10
  private val NumQueries = 10

  /** Unit-normalize an `Array[Float]` vector column (zero vectors pass
    * through unchanged rather than dividing by zero). |v|^2 via the
    * fused native `graft_l2sq` against a same-length zero vector; the
    * element scaling is a build-time-only higher-order `transform`
    * (never in the query scan, which reads pre-encoded codes).
    */
  private def unit(s: SparkSession, vecCol: Column): Column = {
    val n2 = L2Squared.l2sq(s, vecCol, array_repeat(lit(0.0f), size(vecCol)))
    when(n2 === 0.0, vecCol)
      .otherwise(transform(vecCol, x => x / sqrt(n2)).cast("array<float>"))
  }

  /** Split a vector column into `m` contiguous subvectors. */
  private def subVectors(vecCol: Column, m: Int): Column = {
    val subDim = size(vecCol) / lit(m)
    transform(sequence(lit(0), lit(m - 1)), i => slice(vecCol, i * subDim + 1, subDim))
  }

  /** (vec_id, embedding original, unit) from any embeddings frame. */
  private def withUnit(emb: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val s = emb.sparkSession
    emb.select(Cols.q(idCol).as("vec_id"), Cols.q(vecCol).as("embedding"),
      unit(s, Cols.q(vecCol)).as("unit"))
  }

  /** Train a per-subspace PQ codebook: (sub, cell, centroid) with
    * `kCodes` centroids per subspace, Lloyd-refined for `iterations`
    * rounds over the unit-normalized corpus. Scale shape per round:
    * assignment is a broadcast join of the (vector, subspace) rows
    * against the m*kCodes-row codebook with a map-side-partial min —
    * one row per (vector, subspace) through the shuffle; the centroid
    * mean is a (sub, cell, dimension) aggregation whose partials
    * compress the explode per partition. `localCheckpoint` truncates
    * the iterative lineage and each superseded generation is released
    * once its successor materializes ([[IterativeCheckpoint]]).
    */
  def trainPqCodebook(emb: DataFrame, idCol: String = "vec_id",
      vecCol: String = "embedding", m: Int = M, kCodes: Int = KCodes,
      iterations: Int = 2): DataFrame = {
    val s = emb.sparkSession
    val subs = withUnit(emb, idCol, vecCol)
      .select(col("vec_id"), posexplode(subVectors(col("unit"), m)).as(Seq("sub", "subvec")))
    // hash-ordered sample per subspace: same order-bias-free rule as
    // Similarity.ivfSeeds, applied within each subspace partition
    val w = Window.partitionBy("sub").orderBy(xxhash64(col("vec_id")), col("vec_id"))
    var cb = subs.withColumn("rn", row_number().over(w)).filter(col("rn") <= kCodes)
      .select(col("sub"), (col("rn") - 1).as("cell"), col("subvec").as("centroid"))
    var prevGen: Option[IterativeCheckpoint.Generation] = None
    for (_ <- 1 to iterations) {
      // nearest centroid per (vector, subspace): struct min is
      // lexicographic on (distance, cell) — deterministic tie-break
      val assigned = subs.join(broadcast(cb), Seq("sub"))
        .select(col("vec_id"), col("sub"), col("subvec"),
          struct(L2Squared.l2sq(s, col("subvec"), col("centroid")).as("d"),
            col("cell").as("cell")).as("dc"))
        .groupBy("vec_id", "sub")
        .agg(min(col("dc")).getField("cell").as("cell"),
          any_value(col("subvec")).as("subvec"))
      val meansGen = IterativeCheckpoint(assigned
        .select(col("sub"), col("cell"), posexplode(col("subvec")).as(Seq("pos", "v")))
        .groupBy("sub", "cell", "pos").agg(avg(col("v")).as("mv"))
        .groupBy("sub", "cell")
        .agg(array_sort(collect_list(struct(col("pos"), col("mv")))).getField("mv")
          .cast("array<float>").as("centroid")))
      // cells that lost every member keep their previous centroid
      val cbGen = IterativeCheckpoint(meansGen.df.unionByName(
        cb.join(meansGen.df.select("sub", "cell"), Seq("sub", "cell"), "left_anti")))
      meansGen.release()
      prevGen.foreach(_.release())
      prevGen = Some(cbGen)
      cb = cbGen.df
    }
    cb
  }

  /** Encode a corpus against a trained codebook: (vec_id, codes) with
    * `codes` the `m` per-subspace cell assignments. The codebook is
    * flattened to one (sub, cell)-major float array on a one-row frame
    * and broadcast — the encode itself is map-only inside the scan
    * (native `graft_pq_encode`), no shuffle of the corpus.
    */
  def pqEncode(emb: DataFrame, codebook: DataFrame, idCol: String = "vec_id",
      vecCol: String = "embedding", m: Int = M): DataFrame = {
    val s = emb.sparkSession
    val flat = codebook.agg(flatten(
      array_sort(collect_list(struct(col("sub"), col("cell"), col("centroid"))))
        .getField("centroid")).as("cb"))
    withUnit(emb, idCol, vecCol)
      .crossJoin(broadcast(flat))
      .select(col("vec_id"), PqEncode.encode(s, col("unit"), col("cb"), m).as("codes"))
  }

  /** Per-query ADC lookup tables: (q_id, q_emb original, lut) where
    * lut[s*kCodes + c] = |query_sub_s - centroid(s, c)|^2, so the ADC
    * sum over a row's codes is the exact squared L2 between the query
    * and that row's reconstruction. queries x m x kCodes rows — tiny,
    * built against the broadcast codebook.
    */
  private def queryLuts(q: DataFrame, codebook: DataFrame, m: Int): DataFrame = {
    val s = q.sparkSession
    q.select(col("vec_id"), col("embedding"),
        posexplode(subVectors(col("unit"), m)).as(Seq("sub", "qsub")))
      .join(broadcast(codebook), Seq("sub"))
      .select(col("vec_id"), col("embedding"), col("sub"), col("cell"),
        L2Squared.l2sq(s, col("qsub"), col("centroid")).as("d"))
      .groupBy("vec_id")
      .agg(any_value(col("embedding")).as("q_emb"),
        array_sort(collect_list(struct(col("sub"), col("cell"), col("d"))))
          .getField("d").cast("array<float>").as("lut"))
  }

  /** ADC scan -> shortlist -> exact rescore. The scan streams the CODE
    * table once per query batch (broadcast LUTs, m lookups per row);
    * the shortlist window pushes partial top-`shortlist` limits into
    * the shuffle (WindowGroupLimit); the rescore joins the tiny
    * broadcast shortlist back to the float corpus and scores exactly.
    */
  private def pqTopK(corpus: DataFrame, encoded: DataFrame, luts: DataFrame,
      k: Int, shortlist: Int): DataFrame = {
    val s = corpus.sparkSession
    val cand = encoded
      .crossJoin(broadcast(luts.select(col("vec_id").as("q_id"), col("lut"))))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id").as("n_id"),
        PqAdc.adc(s, col("codes"), col("lut")).as("adist"))
    val w = Window.partitionBy("q_id").orderBy(col("adist").asc, col("n_id").asc)
    val short = cand.withColumn("r", row_number().over(w))
      .filter(col("r") <= shortlist)
      .select(col("q_id"), col("n_id"))
    val rescored = corpus
      .join(broadcast(short), col("vec_id") === col("n_id"))
      .join(broadcast(luts.select(col("vec_id").as("qid2"), col("q_emb"))),
        col("q_id") === col("qid2"))
      .select(col("q_id"), col("n_id"),
        CosineSimilarity.cosine(s, col("q_emb"), col("embedding")).as("cosine"))
    Similarity.topK(rescored, k)
  }

  /** Library form: PQ ANN over any embeddings frame with a trained
    * codebook ([[trainPqCodebook]] output or any (sub, cell, centroid)
    * frame of the same geometry). Encodes the corpus in this
    * invocation; long-lived callers should persist [[pqEncode]]'s
    * output once and query it many times (the s05 gate form does, via
    * the session index cache).
    */
  def annPq(emb: DataFrame, queries: DataFrame, codebook: DataFrame,
      idCol: String = "vec_id", vecCol: String = "embedding", k: Int = K,
      shortlist: Int = Shortlist, m: Int = M): DataFrame =
    pqTopK(Similarity.normalized(emb, idCol, vecCol),
      pqEncode(emb, codebook, idCol, vecCol, m),
      queryLuts(withUnit(queries, idCol, vecCol), codebook, m),
      k, shortlist)

  /** s05: gate binding — codebook trained (2 Lloyd rounds) and corpus
    * encoded once per session (SharedIndex), queries vec_id < 10.
    * rows-only oracle (learned centroids are engine-local floats);
    * SimilaritySpec measures recall vs exact s01 and pins the planted
    * identical-vector case (codes equal -> ADC 0 -> always found).
    */
  def s05AnnPq(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(s, dir)
    val codebook = SharedIndex(s, dir, "pq_codebook") {
      trainPqCodebook(e)
    }
    val encoded = SharedIndex(s, dir, "pq_codes") {
      pqEncode(e, codebook)
    }
    pqTopK(Similarity.normalized(e, "vec_id", "embedding"), encoded,
      queryLuts(withUnit(e.filter(col("vec_id") < NumQueries), "vec_id", "embedding"),
        codebook, M),
      K, Shortlist)
  }
}
