package graft

import graft.operators.{Dedup, Similarity}
import org.apache.spark.sql.functions._

/** Coordinated worst-case corpora for every candidate generator — the
  * shapes that go quadratic at 100 TB if any bucket cap regresses. Each
  * cap is unit-tested individually elsewhere (DedupSpec); these tests
  * prove them under ADVERSARIAL coordination: the entire corpus
  * colliding onto one blocking key. The cap-implied bound is exact in
  * each construction: every candidate pair needs a shared blocking key
  * whose bucket is at or under the generator's cap, and the degenerate
  * mass drives all of its keys OVER the cap — so the surviving pair
  * count is ZERO, and the job completes in seconds instead of
  * materializing ~n^2/2 pairs. A regression in any cap either returns
  * millions of pairs (assert fails) or grinds (suite timeout) — both
  * visible.
  */
class AdversarialShapeSpec extends SparkSpec {
  import spark.implicits._

  // 10 tokens: >= 3 for shingles, >= 7 for d09's default w+window-1 run
  private val phrase =
    "alpha beta gamma delta epsilon zeta eta theta iota kappa"

  test("10k identical docs: every text candidate generator caps out to zero pairs") {
    val docs = (0L until 10000L).map(i => (i, phrase)).toDF("doc_id", "text")
    // every blocking key of the mass exceeds its cap: shingle and
    // winnow-fingerprint DF 10000 > 200, MinHash band buckets and
    // SimHash chunk buckets 10000 > 1000
    assert(Dedup.ngramJaccardPairs(docs, topK = 1000000).count() === 0L)
    assert(Dedup.winnowDups(docs, topK = 1000000).count() === 0L)
    assert(Dedup.minhashLshPairs(docs, topK = 1000000).count() === 0L)
    assert(Dedup.simhashPairs(docs).count() === 0L)
    // d13 rides the same capped shingle blocking as d02
    assert(Dedup.containmentPairs(docs, topK = 1000000).count() === 0L)
  }

  test("all-empty docs: the simhash-0 collapse is capped, token generators emit nothing") {
    val docs = (0L until 5000L).map(i => (i, "")).toDF("doc_id", "text")
    // every empty doc hashes to simhash 0 — all four 16-bit chunk
    // buckets hold the whole corpus (5000 > 1000 cap)
    assert(Dedup.simhashPairs(docs).count() === 0L)
    // shingle/winnow need >= 3 / >= 7 tokens: empty docs emit no keys
    assert(Dedup.ngramJaccardPairs(docs).count() === 0L)
    assert(Dedup.winnowDups(docs).count() === 0L)
    assert(Dedup.minhashLshPairs(docs).count() === 0L)
  }

  test("one stop-phrase shingle across the corpus is capped out; unique content pairs nothing") {
    // every doc shares 'the quick brown fox' (its two 3-gram shingles
    // have DF 2000 > 200 — capped out); all other shingles contain a
    // doc-unique filler token (DF 1 buckets pair nothing). The
    // cap-implied candidate bound is therefore exactly zero.
    val docs = (0L until 2000L).map(i =>
      (i, s"the quick brown fox u${i}a u${i}b u${i}c u${i}d")).toDF("doc_id", "text")
    assert(Dedup.ngramJaccardPairs(docs, topK = 1000000).count() === 0L)
    assert(Dedup.minhashLshPairs(docs, topK = 1000000).count() === 0L)
  }

  test("d12 incremental dedup: a mass-identical batch caps out against the index") {
    // history is benign (unique vocabularies); the BATCH is the attack:
    // 5000 identical docs whose band buckets (size 5000 > 1000 cap) are
    // dropped on the batch side BEFORE the index join, so the join
    // probes nothing — per-batch work stays O(batch), never
    // batch x index
    val history = (0L until 100L).map(i =>
      (i, (0 until 12).map(j => s"h${i}w$j").mkString(" "))).toDF("doc_id", "text")
    val batch = (10000L until 15000L).map(i => (i, phrase)).toDF("doc_id", "text")
    val (sigs, bands) = Dedup.minhashIndex(history)
    assert(Dedup.incrementalNearDups(sigs, bands, batch).count() === 0L)
    // and the same mass INSIDE the index is dropped at build time, so a
    // benign batch probing it also pairs nothing
    val (mSigs, mBands) = Dedup.minhashIndex(batch)
    val probe = Seq((99000L, phrase)).toDF("doc_id", "text")
    assert(Dedup.incrementalNearDups(mSigs, mBands, probe).count() === 0L)
  }

  test("embedding LSH: a mass-identical vector block is capped out of the pair set") {
    val rnd = new scala.util.Random(42)
    val hot = (0L until 3000L).map(i => (i, Array.fill(16)(1.0f)))
    val rest = (3000L until 3100L).map(i =>
      (i, Array.fill(16)(rnd.nextGaussian().toFloat)))
    val emb = (hot ++ rest).toDF("vec_id", "embedding")
    val pairs = Dedup.embeddingLshPairs(emb, minCosine = 0.99, topK = 1000000)
    // identical vectors share EVERY bucket in every table, so any bucket
    // holding two of them holds all 3000 (> 1000 cap) and is dropped —
    // no pair inside the hot mass can survive, and the job never
    // materializes its ~4.5M-pair cross product
    assert(pairs.filter(col("v1") < 3000L && col("v2") < 3000L).count() === 0L)
  }

  test("knn graph: a mass-identical vector block caps out instead of going quadratic") {
    val rnd = new scala.util.Random(43)
    val hot = (0L until 3000L).map(i => (i, Array.fill(16)(1.0f)))
    val rest = (3000L until 3100L).map(i =>
      (i, Array.fill(16)(rnd.nextGaussian().toFloat)))
    val emb = (hot ++ rest).toDF("vec_id", "embedding")
    // same cap discipline as d08 (shared cappedIdBuckets): the 3000
    // identical vectors exceed every bucket's cap, so no hot-mass pair
    // is ever generated — the knn graph degrades to the well-blocked
    // remainder instead of materializing a ~4.5M-edge clique
    val edges = Similarity.knnJoinLsh(emb, k = 10)
    assert(edges.filter(col("q_id") < 3000L && col("n_id") < 3000L).count() === 0L)
  }

  test("semantic dedup: a mass-identical vector block caps out instead of going quadratic") {
    val rnd = new scala.util.Random(44)
    val hot = (0L until 3000L).map(i => (i, Array.fill(16)(1.0f)))
    val rest = (3000L until 3100L).map(i =>
      (i, Array.fill(16)(rnd.nextGaussian().toFloat)))
    val emb = (hot ++ rest).toDF("vec_id", "embedding")
    // the whole hot mass lands in ONE trained cell (times 2 replicas),
    // 3000 > the 1000 cell cap, so the cell drops and no hot pair is
    // generated (documented: raise numCells or run d08 first); the
    // resolution still returns one verdict per vector, all kept
    val pairs = Dedup.semanticDedupPairs(emb, minCosine = 0.99, numCells = 8)
    assert(pairs.filter(col("v1") < 3000L && col("v2") < 3000L).count() === 0L)
    val out = Dedup.semanticDedup(emb, minCosine = 0.99, numCells = 8)
    assert(out.count() === 3100L)
  }

  test("radius LSH on a fully-degenerate corpus: bounded by queries x corpus, then maxResults") {
    val emb = (0L until 5000L).map(i => (i, Array.fill(16)(0.5f)))
      .toDF("vec_id", "embedding")
    // like s02, the query side is broadcast so the worst-case candidate
    // volume is linear in the corpus; maxResults bounds the answer when
    // every neighbor clears the radius
    val rows = Similarity.annRadiusLsh(emb, emb.filter(col("vec_id") < 3L),
      minCosine = 0.99, maxResults = 500).collect()
    assert(rows.length === 500)
    rows.foreach(r => assert(math.abs(r.getDouble(2) - 1.0) < 1e-9, r.toString))
  }

  test("s02 ANN on a fully-degenerate corpus: per-query top-k, never bucket x bucket") {
    val emb = (0L until 5000L).map(i => (i, Array.fill(16)(0.5f)))
      .toDF("vec_id", "embedding")
    // ANN must still ANSWER on a degenerate corpus (a cap that dropped
    // the bucket would lose the query's true neighbors): the candidate
    // volume is bounded by the BROADCAST query side (queries x bucket),
    // and the output by the per-query top-k window — 10 rows per query,
    // each an exact cosine-1 neighbor
    val rows = Similarity.annLsh(emb, emb.filter(col("vec_id") < 3L)).collect()
    assert(rows.length === 3 * 10)
    rows.foreach { r =>
      assert(r.getLong(0) < 3L)
      assert(math.abs(r.getDouble(3) - 1.0) < 1e-9, r.toString)
    }
  }

  test("d14 line dedup: a corpus where EVERY doc shares EVERY line stays linear") {
    import graft.operators.Dedup
    // 5,000 docs, all with the same 3 lines: the firsts table collapses
    // to 3 rows, the join back is 15k probe rows against 3 build rows
    // (a broadcast at any scale), and keep-first must pick exactly doc
    // 0's lines — one doc keeps everything, 4,999 keep nothing, no
    // quadratic anywhere
    val lines = (0L until 5000L).flatMap(d =>
      Seq((d, 0L, "cookie banner"), (d, 1L, "nav bar"), (d, 2L, "license header")))
      .toDF("doc_id", "line_no", "line")
    val out = Dedup.lineDedup(lines).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(4)))).toMap
    assert(out.size === 5000)
    assert(out(0L) === ((3L, 3L, "cookie banner nav bar license header")))
    assert(out.count { case (d, (_, kept, _)) => d > 0L && kept == 0L } === 4999)
    assert(out.forall(_._2._1 == 3L))
  }

  test("hamming pruned knn: a mass-identical code block caps out instead of going quadratic") {
    import graft.operators.Similarity
    // 20,000 corpus vectors ALL with the same code: every chunk of
    // every query collides with the whole corpus. The per-(chunk, key)
    // cap bounds the probed candidates at queries x chunks x cap, so
    // the result is exact top-k over the capped survivors — never the
    // 20k x queries full rescore, and never an OOM'd bucket list
    val cap = 500
    val codes = (0L until 20000L).map(i => (i, 0x1234L))
    val queries = (0L until 4L).map(i => (100000L + i, 0x1234L))
    val out = Similarity.hammingKnnPruned(
      codes.toDF("vec_id", "code"), queries.toDF("vec_id", "code"),
      k = 10, maxBucketSize = cap)
    val rows = out.collect()
    // every query still gets its k answers (the cap keeps >= k rows)
    assert(rows.map(_.getLong(0)).distinct.length === 4)
    assert(rows.length === 40)
    // and all at distance 0 — the capped bucket is still the RIGHT set
    assert(rows.forall(_.getInt(3) === 0))
    // shape guard: the candidate join's probe side is bounded by the
    // cap, not the corpus — verified by the executed plan not carrying
    // a 20k x 4 nested loop (equi-join on (chunk, key) only)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("NestedLoopJoin"),
      plan.take(2000))
  }

  test("d18 substring dedup: a megadoc of thousands of repeated sentences stays linear in-row") {
    // the adversarial shape for span-removal assembly: ONE doc whose
    // text is 4000 copies of an 8-token sentence — nearly every window
    // is a duplicate, so covered mass ≈ n. The per-token
    // array_contains formulation was O(n^2) ≈ 10^9 ops here; the
    // interval-merge assembly collapses the covered starts to ONE
    // interval and finishes in seconds
    val sentence = "the quick brown fox jumps over lazy dogs"
    val mega = (sentence + " ") * 4000
    val docs = Seq(
      (1L, sentence),             // the keep-first original
      (2L, mega.trim),            // the 32k-token adversarial megadoc
      (3L, "completely unrelated filler text with no duplicate runs"))
      .toDF("doc_id", "text")
    val t0 = System.nanoTime()
    val out = Dedup.substringDedup(docs, minTokens = 8).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    val secs = (System.nanoTime() - t0) / 1e9
    // doc 1 is the global first occurrence and survives whole
    assert(out(1L) === ((sentence, 8L, 0L)))
    // the megadoc is ONE duplicated run of 32000 tokens: every
    // position is covered (its first window repeats doc 1's tokens,
    // all later windows repeat earlier positions), so it vanishes
    assert(out(2L)._1 === "")
    assert(out(2L)._2 === 32000L)
    assert(out(2L)._3 === 32000L)
    assert(out(3L)._3 === 0L)
    // the linearity pin: quadratic in-row work would take minutes
    assert(secs < 60.0, s"megadoc assembly took ${secs}s — quadratic regression?")
  }
}
