package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import graft.functions.CosineSimilarity

/** Deduplication operator family (SURVEY.md §2.3).
  *
  * Each variant has a LIBRARY form taking any documents/embeddings
  * DataFrame (`exactDedup`, `ngramJaccardPairs`, `minhashLshPairs`,
  * `simhashPairs`, `embeddingDedupPairs` — input columns selectable by
  * name, id column normalized to `doc_id`) and a gate form (`d0x...`)
  * binding it to the standard tables with the per-session shared index
  * cache.
  *
  * Scale notes (100 TB): every near-dup variant here generates candidate
  * pairs through an equi-join on a blocking key (shingle, LSH band bucket,
  * label block) — never a cross join. Blocking keys are computed with
  * codegen'd built-ins (xxhash64, native shingle/simhash expressions);
  * pair verification only runs on candidates.
  */
object Dedup {

  private def normalized(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(Cols.q(idCol).as("doc_id"), Cols.q(textCol).as("text"))

  /** Exact dedup via content hash over any documents frame. One shuffle
    * (groupBy md5). At 100 TB: hash-partition on the digest; map-side
    * partial agg makes the shuffle carry one row per distinct digest per
    * partition.
    */
  def exactDedup(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    normalized(docs, idCol, textCol)
      .groupBy(md5(col("text").cast("binary")).as("h"))
      .agg(min(col("doc_id")).as("rep_doc_id"), count(lit(1)).as("n_copies"))
      .orderBy("rep_doc_id")

  /** d01: gate binding of [[exactDedup]]. */
  def d01ExactHash(s: SparkSession, dir: String): DataFrame =
    exactDedup(Tables.documents(s, dir))

  /** Max document frequency for a shingle to participate in near-dup
    * blocking. A stop-phrase shingle shared by millions of docs would make
    * its block's self-join quadratic (the classic skew killer at 100 TB);
    * such shingles also carry no dedup signal. The cap defines the shingle
    * universe for d02/d03, so sizes and common counts stay coherent
    * (capped-universe Jaccard), and the oracle replicates it.
    */
  private[operators] val MaxShingleDF = 200L

  /** Shingle-bucket plan over any normalized `(doc_id, text)` frame: one
    * row per distinct word-3-gram shingle with the sorted list of doc_ids
    * containing it, DF-capped by filtering on the bucket size (one
    * shuffle; the cap costs nothing extra). Candidate pairs come from
    * in-bucket array combinations, which beats a shingle self-join: the
    * exploded store shuffles ONCE (groupBy shingle) instead of twice
    * (both join sides), and pair generation is a codegen'd array
    * comprehension per bucket row.
    */
  /** (key..., ids) buckets with the size cap enforced BEFORE the list
    * aggregation: a window count over the bucket key decides the cap,
    * and only surviving rows reach the list-collect. The one-pass
    * collect-then-filter formulation this replaces was a 100 TB OOM:
    * collect_list buffers do not spill, so a degenerate hot bucket
    * (stop-phrase shingle, dense LSH cell) would materialize its full
    * multi-million id array in one reducer just to be discarded by the
    * size filter. The window's row buffer DOES spill
    * (ExternalAppendOnlyUnsafeRowArray), so a hot bucket costs disk
    * churn instead of an executor; ONE exchange covers everything —
    * the groupBy reuses the window's hash partitioning. Callers must
    * hand in (key..., id) rows that are already distinct. `minSize`
    * additionally drops singleton buckets when the only consumer is
    * pair generation.
    */
  /** The capped bucket store in FLAT form (one row per id, hot keys
    * dropped by the same window count) — for consumers that pair via a
    * codegen'd self-join instead of the list explode
    * ([[Similarity.knnFromBuckets]]).
    */
  private[operators] def cappedFlatBuckets(df: DataFrame, keys: Seq[String],
      cap: Long, minSize: Long): DataFrame = {
    val keyCols = keys.map(col)
    val w = Window.partitionBy(keyCols: _*)
    df.withColumn("__n", count(lit(1)).over(w))
      .filter(col("__n") <= cap && col("__n") >= minSize)
      .drop("__n")
  }

  private[operators] def cappedIdBuckets(df: DataFrame, keys: Seq[String], idCol: String,
      cap: Long, minSize: Long): DataFrame = {
    val keyCols = keys.map(col)
    cappedFlatBuckets(df, keys, cap, minSize)
      .groupBy(keyCols: _*).agg(sort_array(collect_list(col(idCol))).as("ids"))
  }

  private[operators] def buildShingleBuckets(docs: DataFrame): DataFrame = {
    val s = docs.sparkSession
    // native word_shingles keeps the scan inside whole-stage codegen
    // (the transform/concat_ws lambda formulation drops the stage to
    // interpreted mode — it was most of d02's runtime); array_distinct
    // dedups each doc's shingles INSIDE the scan (bounded by doc
    // length), so (doc, shingle) rows are unique by construction and
    // the bucket build needs no distinct aggregation. minSize stays 1:
    // singleton buckets carry no pairs but DO define each doc's
    // capped-universe shingle count (the Jaccard denominator).
    cappedIdBuckets(
      docs
        .withColumn("tokens", split(col("text"), " "))
        .filter(size(col("tokens")) >= 3)
        .select(col("doc_id"),
          explode(array_distinct(
            graft.functions.WordShingles.shingles(s, col("tokens"), 3))).as("shingle")),
      Seq("shingle"), "doc_id", MaxShingleDF, minSize = 1L)
  }

  /** Session-cached shingle buckets for the standard `documents` table,
    * shared by d02/d03.
    */
  private[operators] def shingleBuckets(s: SparkSession, dir: String): DataFrame =
    SharedIndex(s, dir, "shingle_buckets") {
      buildShingleBuckets(normalized(Tables.documents(s, dir), "doc_id", "text"))
    }

  /** (doc_id, shingle) long store and per-doc shingle counts over the
    * capped universe, derived from the buckets.
    */
  private def shingledFrom(buckets: DataFrame): (DataFrame, DataFrame) = {
    val exploded = buckets.select(col("shingle"), explode(col("ids")).as("doc_id"))
    val sizes = exploded.groupBy("doc_id").agg(count(lit(1)).as("n_shingles"))
    (exploded, sizes)
  }

  private[operators] def shingled(s: SparkSession, dir: String): (DataFrame, DataFrame) =
    shingledFrom(shingleBuckets(s, dir))

  /** Per-doc sorted shingle arrays over the capped universe, inverted
    * from the bucket store: candidate verification intersects two
    * bounded arrays (`array_intersect`, codegen'd) instead of
    * double-joining the exploded long store and re-aggregating — three
    * fewer shuffles per verify pass. Array length is bounded by the
    * doc's own shingle count, so the collect is reducer-safe.
    */
  private def docSetsFrom(buckets: DataFrame): DataFrame =
    buckets.select(col("shingle"), explode(col("ids")).as("doc_id"))
      .groupBy("doc_id").agg(sort_array(collect_list(col("shingle"))).as("shingles"))

  /** Session-cached per-doc shingle sets for the standard table. */
  private def docShingleSets(s: SparkSession, dir: String): DataFrame =
    SharedIndex(s, dir, "doc_shingle_sets") {
      docSetsFrom(shingleBuckets(s, dir))
    }

  /** All in-bucket (d1 < d2) pairs from a bucketed DF with an `ids`
    * array column — the candidate generator for d02/d03.
    */
  private[operators] def bucketPairs(buckets: DataFrame): DataFrame =
    buckets
      .filter(size(col("ids")) >= 2)
      .select(explode(expr(
        """flatten(transform(ids,
          |  (x, i) -> transform(slice(ids, i + 2, size(ids)), y -> struct(x AS d1, y AS d2))))""".stripMargin)).as("p"))
      .select(col("p.d1").as("d1"), col("p.d2").as("d2"))

  /** Top-K Jaccard pairs given a shingle-bucket store: common-count via
    * one aggregation over in-bucket pairs, |A∪B| = |A|+|B|-common.
    */
  private def jaccardTopK(buckets: DataFrame, topK: Int): DataFrame = {
    val sizes = buckets.select(explode(col("ids")).as("doc_id"))
      .groupBy("doc_id").agg(count(lit(1)).as("n_shingles"))
    val common = bucketPairs(buckets)
      .groupBy("d1", "d2")
      .agg(count(lit(1)).as("common"))
    common
      .join(sizes.withColumnRenamed("doc_id", "d1").withColumnRenamed("n_shingles", "n1"), "d1")
      .join(sizes.withColumnRenamed("doc_id", "d2").withColumnRenamed("n_shingles", "n2"), "d2")
      .select(col("d1"), col("d2"),
        round(col("common").cast("double") / (col("n1") + col("n2") - col("common")), 6).as("jaccard"))
      .orderBy(col("jaccard").desc, col("d1").asc, col("d2").asc)
      .limit(topK)
  }

  /** N-gram Jaccard near-dup pairs over any documents frame (library
    * form; the caller may persist the input — the shingle index is built
    * once per invocation here, or use the d02 gate form for the
    * session-cached standard table).
    */
  def ngramJaccardPairs(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", topK: Int = 100): DataFrame =
    jaccardTopK(buildShingleBuckets(normalized(docs, idCol, textCol)), topK)

  /** d02: N-gram Jaccard similarity, top-100 most similar doc pairs on
    * the standard table. Candidates come from an equi-join on shingle
    * (blocking); output ordered by similarity — synthetic corpus has no
    * dups above any useful threshold, so a top-N (deterministic
    * tie-break on ids) keeps the oracle non-trivial. The pair set is
    * session-cached: d07 clusters exactly these pairs, so both gate
    * entries share one computation.
    */
  def d02NgramJaccard(s: SparkSession, dir: String): DataFrame =
    SharedIndex(s, dir, "ngram_jaccard_top_pairs") {
      jaccardTopK(shingleBuckets(s, dir), 100)
    }

  /** Top-K CONTAINMENT pairs given a shingle-bucket store — the
    * asymmetric complement of [[jaccardTopK]]: containment of A in B is
    * `|A∩B| / |A|`, and the reported score is the larger direction
    * (common / min(|A|, |B|)). This is the detector symmetric Jaccard
    * structurally misses: a short doc copied VERBATIM into a much
    * longer one has containment 1.0 but Jaccard |A|/|B| ~ 0 — the
    * quote-embedding / boilerplate-wrapping dup shape. Same capped
    * shingle blocking, same exchanges; only the final map-side formula
    * differs, so the 100 TB story is d02's.
    */
  private def containmentTopK(buckets: DataFrame, topK: Int): DataFrame = {
    val sizes = buckets.select(explode(col("ids")).as("doc_id"))
      .groupBy("doc_id").agg(count(lit(1)).as("n_shingles"))
    val common = bucketPairs(buckets)
      .groupBy("d1", "d2")
      .agg(count(lit(1)).as("common"))
    common
      .join(sizes.withColumnRenamed("doc_id", "d1").withColumnRenamed("n_shingles", "n1"), "d1")
      .join(sizes.withColumnRenamed("doc_id", "d2").withColumnRenamed("n_shingles", "n2"), "d2")
      .select(col("d1"), col("d2"), col("common"), col("n1"), col("n2"),
        round(col("common").cast("double") / least(col("n1"), col("n2")), 6).as("containment"))
      .orderBy(col("containment").desc, col("d1").asc, col("d2").asc)
      .limit(topK)
  }

  /** Containment near-dup pairs over any documents frame (library form
    * of d13; see [[containmentTopK]]).
    */
  def containmentPairs(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", topK: Int = 100): DataFrame =
    containmentTopK(buildShingleBuckets(normalized(docs, idCol, textCol)), topK)

  /** d13: top-100 containment pairs on the standard table — rides the
    * SAME session-cached shingle-bucket index as d02/d03/d07, so the
    * gate pays the corpus pass once across all four.
    */
  def d13ContainmentDups(s: SparkSession, dir: String): DataFrame =
    SharedIndex(s, dir, "containment_top_pairs") {
      containmentTopK(shingleBuckets(s, dir), 100)
    }

  /** MOSS-style winnowing fingerprints + shared-print pairs — the
    * exact-substring dup-candidate detector (the dedup flavor the
    * shingle-Jaccard family doesn't give): per doc, hash every w-token
    * gram (portable md5-prefix integers, the q19/t04 house hash), then
    * WINNOW — each run of `window` consecutive gram hashes contributes
    * only its minimum. The winnowing guarantee: any token run of at
    * least w + window - 1 shared tokens yields at least one shared
    * selected fingerprint, while only ~2/(window+1) of the grams are
    * stored. Docs pair by shared selected prints (count desc).
    *
    * Scale shape: tokenize + gram hashing + window-min selection are
    * ONE native codegen'd call in the scan (`graft_winnow`, see
    * functions/WinnowPrints.scala — the three-HOF-lambda formulation it
    * replaced dropped the scan to interpreted mode, the d02 trap);
    * the fingerprint index reuses the shingle machinery — window-capped
    * buckets (DF in [2, 200]) and in-bucket codegen'd pair expansion,
    * one exchange for bucket + cap, one agg for pair counts.
    */
  def winnowDups(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", w: Int = 4, window: Int = 4,
      topK: Int = 100): DataFrame = {
    require(w >= 1 && window >= 1,
      s"winnowDups needs w >= 1 and window >= 1, got w=$w window=$window")
    val s = docs.sparkSession
    val prints = normalized(docs, idCol, textCol)
      .select(col("doc_id"),
        explode(graft.functions.WinnowPrints.winnow(s, col("text"), w, window)).as("fp"))
    bucketPairs(cappedIdBuckets(prints, Seq("fp"), "doc_id", MaxShingleDF, minSize = 2L))
      .groupBy("d1", "d2").agg(count(lit(1)).as("shared_prints"))
      .orderBy(col("shared_prints").desc, col("d1").asc, col("d2").asc)
      .limit(topK)
  }

  /** d09: gate binding of [[winnowDups]] (4-token grams, window 4 —
    * detects shared runs of >= 7 tokens). Fully oracled: the md5-prefix
    * gram hash, window-min selection, DF cap, and pair counts are
    * identical integer math in the DuckDB twin.
    */
  def d09WinnowDups(s: SparkSession, dir: String): DataFrame =
    winnowDups(Tables.documents(s, dir))

  /** Connected components over near-dup pairs: each involved doc gets
    * `cluster_id` = the smallest doc id reachable through the pair
    * graph — the resolution step that turns any pair generator's output
    * (d02/d03/d04/d05) into "keep one representative per duplicate
    * cluster".
    *
    * Algorithm: iterative min-label propagation with pointer-doubling —
    * each round a node takes the min of its own label, its neighbors'
    * labels, and its LABEL'S label (the shortcutting step; a label is
    * always itself a node id, so the self-join is total). Plain
    * propagation advances one hop per round and a path component of
    * diameter d needs d rounds; shortcutting halves the remaining
    * distance each round, so `maxIterations` = 20 covers component
    * diameters around 2^20 — far beyond any duplicate cluster. Each
    * round is two equi-joins + one aggregation over the edge list.
    * Convergence is detected by the label sum (labels only ever
    * decrease, so an unchanged sum is a fixpoint — no extra join to
    * diff generations), and the sum piggybacks on the checkpoint's own
    * materialization job via `observe` — convergence costs ZERO extra
    * jobs per round. `localCheckpoint` truncates the growing lineage
    * each round, and each superseded generation's storage is released
    * explicitly once its successor materializes ([[IterativeCheckpoint]]
    * — storage stays flat however many rounds run, instead of leaking
    * until driver GC). Throws instead of returning mid-propagation
    * labels if the cap is ever hit unconverged.
    */
  def dupClusters(pairs: DataFrame, aCol: String = "d1", bCol: String = "d2",
      maxIterations: Int = 20): DataFrame = {
    import org.apache.spark.sql.Observation
    // null ids are not nodes: dropped up front, deterministically —
    // otherwise they would vanish silently inside the shortcut join
    val edges = pairs.select(Cols.q(aCol).cast("long").as("a"), Cols.q(bCol).cast("long").as("b"))
      .na.drop()
    val symGen = IterativeCheckpoint(
      edges.union(edges.select(col("b").as("a"), col("a").as("b"))).distinct())
    val sym = symGen.df
    // label sum + node count ride the checkpoint's materialization job
    def checkpointWithSum(df: DataFrame): (IterativeCheckpoint.Generation, java.math.BigDecimal, Long) = {
      val obs = Observation()
      val gen = IterativeCheckpoint(df.observe(obs,
        sum(col("label").cast("decimal(38,0)")).as("lsum"), count(lit(1)).as("cnt")))
      val m = obs.get
      (gen, m("lsum").asInstanceOf[java.math.BigDecimal], m("cnt").asInstanceOf[Long])
    }
    var (labelsGen, prevSum, nodeCount) = checkpointWithSum(
      sym.select(col("a").as("id")).distinct().withColumn("label", col("id")))
    var converged = nodeCount == 0L
    var i = 0
    while (!converged && i < maxIterations) {
      val labels = labelsGen.df
      val neighborMin = sym.join(labels, sym("b") === labels("id"))
        .groupBy(sym("a").as("nid")).agg(min(col("label")).as("nlabel"))
      // checkpoint before the self-join: both branches of the shortcut
      // read `propagated`, and column pruning would otherwise make the
      // neighbor join + aggregation execute twice per round
      val propagatedGen = IterativeCheckpoint(
        labels.join(neighborMin, labels("id") === neighborMin("nid"), "left")
          .select(col("id"), least(col("label"), coalesce(col("nlabel"), col("label"))).as("label")))
      val propagated = propagatedGen.df
      // shortcut: follow the label one more step (label -> its label)
      val byId = propagated.select(col("id").as("lid"), col("label").as("llabel"))
      val (nextGen, s, _) = checkpointWithSum(
        propagated.join(byId, propagated("label") === byId("lid"))
          .select(col("id"), least(col("label"), col("llabel")).as("label")))
      // the new generation is materialized: its inputs are dead weight
      propagatedGen.release()
      labelsGen.release()
      labelsGen = nextGen
      converged = s == prevSum
      prevSum = s
      i += 1
    }
    symGen.release() // the result plan reads only the final labels
    if (!converged) {
      labelsGen.release()
      throw new IllegalStateException(
        s"dupClusters did not converge in $maxIterations rounds — component diameter beyond 2^$maxIterations?")
    }
    labelsGen.df.select(col("id").as("doc_id"), col("label").as("cluster_id")).orderBy("doc_id")
  }

  /** d07: gate binding of [[dupClusters]] over the d02 near-dup pairs —
    * the full pair-generate -> cluster-resolve dedup pipeline on the
    * standard table.
    */
  def d07DupClusters(s: SparkSession, dir: String): DataFrame =
    dupClusters(d02NgramJaccard(s, dir))

  /** Deterministic MinHash coefficients (seeded splitmix64-style mix, all
    * < P31 so (a*x + b) stays well inside a long — no ANSI overflow).
    */
  private val P31 = graft.functions.MinHash64.P31
  private val NumHashes = 64
  // single source of truth with the native graft_minhash64 expression:
  // the SQL-composed and in-row signature paths must stay bit-identical
  private val minhashCoeffs: Seq[(Long, Long)] = graft.functions.MinHash64.coeffs

  /** MinHash signature plan from a shingle-bucket store: one aggregation
    * producing all 64 mins (64 codegen'd agg columns — single shuffle,
    * no 64x explode).
    */
  /** d03's wide signature frame `(doc_id, m0..m63)` derived MAP-ONLY
    * from the per-doc capped-universe shingle sets via the native
    * `graft_minhash64` — the explode + 64-min-agg re-aggregation of the
    * bucket store this replaces cost a second corpus exchange for what
    * is a scalar function of each doc's set (min over a set equals min
    * over the exploded multiset, so the values are bit-identical and
    * the d02-equality specs pin it).
    */
  private def sigsFromSets(sets: DataFrame): DataFrame = {
    val s = sets.sparkSession
    sets
      .withColumn("sig", graft.functions.MinHash64.sig(s, col("shingles")))
      .select(col("doc_id") +:
        (0 until NumHashes).map(i => col("sig")(i).as(s"m$i")): _*)
  }

  /** Session-cached signatures for the standard table: repeated d03 runs
    * reuse one build, itself map-only over the cached shingle sets.
    */
  private[operators] def minhashSignatures(s: SparkSession, dir: String): DataFrame =
    SharedIndex(s, dir, "minhash_signatures") {
      sigsFromSets(docShingleSets(s, dir))
    }

  private val NumBands = 16
  private val RowsPerBand = NumHashes / NumBands // 4

  /** Skip LSH band buckets larger than this: a bucket of b docs yields
    * b(b-1)/2 candidates, and buckets that popular carry no dedup signal
    * beyond what smaller buckets of the same cluster already provide.
    */
  private val MaxLshBucket = 1000

  /** MinHash + LSH banding near-dup pipeline given the per-doc shingle
    * sets and signatures: 16 bands x 4 rows; candidate pairs =
    * in-bucket combinations after one groupBy (band, bucket_hash) —
    * with an upper bound on bucket size so a degenerate bucket
    * (mass-identical boilerplate) can't go quadratic; verification
    * computes true (capped-universe) Jaccard for candidates only, by
    * attaching each side's shingle array (two id-equi joins) and
    * intersecting in one codegen'd expression — the pair set drives
    * the verify, never generates a non-candidate pair, and no exploded
    * long store is re-joined or re-aggregated.
    */
  private def minhashLshTopK(sets: DataFrame, sigs: DataFrame, topK: Int): DataFrame = {
    val bandCols = (0 until NumBands).map { bnd =>
      val cols = (0 until RowsPerBand).map(r => col(s"m${bnd * RowsPerBand + r}"))
      struct(lit(bnd).as("band"), xxhash64(cols: _*).as("bucket"))
    }
    val lshBuckets = cappedIdBuckets(
      sigs.select(col("doc_id"), explode(array(bandCols: _*)).as("bb"))
        .select(col("doc_id"), col("bb.band").as("band"), col("bb.bucket").as("bucket")),
      Seq("band", "bucket"), "doc_id", MaxLshBucket, minSize = 2L)
    val cand = bucketPairs(lshBuckets).distinct()
    cand
      .join(sets.select(col("doc_id").as("d1"), col("shingles").as("s1")), "d1")
      .join(sets.select(col("doc_id").as("d2"), col("shingles").as("s2")), "d2")
      .select(col("d1"), col("d2"),
        size(array_intersect(col("s1"), col("s2"))).as("common"),
        size(col("s1")).as("n1"), size(col("s2")).as("n2"))
      // band collisions with zero shared shingles are hash luck, not
      // near-dups (the exploded-store formulation dropped them in its
      // inner join)
      .filter(col("common") >= 1)
      .select(col("d1"), col("d2"),
        round(col("common").cast("double") / (col("n1") + col("n2") - col("common")), 6).as("jaccard"))
      .orderBy(col("jaccard").desc, col("d1").asc, col("d2").asc)
      .limit(topK)
  }

  /** MinHash+LSH near-dup pairs over any documents frame (library form;
    * builds the shingle index and signatures for this invocation).
    */
  def minhashLshPairs(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", topK: Int = 100): DataFrame = {
    val sets = docSetsFrom(buildShingleBuckets(normalized(docs, idCol, textCol)))
    minhashLshTopK(sets, sigsFromSets(sets), topK)
  }

  /** d03: gate binding with the session-cached indexes. rows-only oracle
    * (hash seeds are engine-local); DedupSpec checks candidate recall vs
    * d02 exact top pairs.
    */
  def d03MinhashLsh(s: SparkSession, dir: String): DataFrame =
    minhashLshTopK(docShingleSets(s, dir), minhashSignatures(s, dir), 100)

  /** 64-bit SimHash + banded Hamming near-dup pairs over any documents
    * frame. Bit j of the signature = sign of sum over tokens of ±1 by
    * bit j of xxhash64(token), computed per row by the native
    * `graft_simhash` expression (functions/SimHash.scala) INSIDE the
    * scan — no token explode, no 64-column aggregation, no shuffle to
    * build signatures (the agg formulation shuffled the entire exploded
    * token store; at 100 TB that shuffle dominates the job). Near-dup
    * candidates block on four 16-bit chunks (pigeonhole: hamming<=3
    * pairs must share a chunk). The pigeonhole recall guarantee holds
    * only for pairs whose shared chunk sits in a bucket at or under
    * `maxBucketSize`: an over-cap bucket (mass-identical signatures) is
    * dropped like in every other candidate generator here, trading the
    * quadratic blowup for missed pairs inside that degenerate mass —
    * raise the cap if such a corpus genuinely needs those pairs.
    */
  def simhashPairs(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text",
      maxBucketSize: Int = 1000): DataFrame = {
    val s = docs.sparkSession
    val sig = normalized(docs, idCol, textCol)
      .filter(col("text").isNotNull)
      .select(col("doc_id"), graft.functions.SimHash.simhash(s, col("text")).as("simhash"))
    // (doc_id, simhash) rides the bucket rows as one struct, so pair
    // generation needs no join back to the signature store (and the
    // whole pipeline reads the text exactly once). The bucket cap
    // matters here like everywhere else: a corpus with millions of
    // near-empty docs collapses them all onto simhash 0, and an
    // uncapped chunk self-join would go quadratic on that key.
    val chunks = sig.select(struct(col("doc_id"), col("simhash")).as("ds"),
        explode(array((0 until 4).map(c =>
          struct(lit(c).as("chunk"), shiftright(col("simhash"), c * 16).bitwiseAND(0xFFFFL).as("key"))): _*)).as("cb"))
      .select(col("ds"), col("cb.chunk").as("chunk"), col("cb.key").as("key"))
    bucketPairs(cappedIdBuckets(chunks, Seq("chunk", "key"), "ds",
        maxBucketSize.toLong, minSize = 2L))
      .select(col("d1.doc_id").as("d1"), col("d2.doc_id").as("d2"),
        bit_count(col("d1.simhash").bitwiseXOR(col("d2.simhash"))).as("hamming"))
      // 4 chunks of 16 bits guarantee recall only for hamming <= 3
      // (pigeonhole, modulo the bucket cap — see scaladoc); pairs
      // beyond that are luck, so don't emit them. Dedup (a hamming<=3
      // pair shares up to 4 chunks) runs AFTER this filter: the hamming
      // compute is a map-side XOR on the pair row itself, so deduping
      // first would shuffle the whole candidate volume to save nothing
      // (the d08 lesson, same round).
      .filter(col("hamming") <= 3)
      .dropDuplicates("d1", "d2")
      .orderBy(col("hamming").asc, col("d1").asc, col("d2").asc)
  }

  /** d04: gate binding of [[simhashPairs]]. rows-only oracle; DedupSpec
    * asserts determinism + self-similarity + equivalence with the
    * aggregate formulation.
    */
  def d04Simhash(s: SparkSession, dir: String): DataFrame =
    simhashPairs(Tables.documents(s, dir))

  /** Embedding-cosine near-dup over any embeddings frame: top-K most
    * similar vector pairs within blocks of `blockCol`, scored by the
    * native codegen'd `graft_cosine` expression
    * (functions/CosineSimilarity.scala) — one fused loop per pair, same
    * IEEE operation order as DuckDB's `list_reduce` folds →
    * bit-identical cosines. Block keying keeps candidates linear-ish;
    * the unblocked scale paths are s02 (LSH) / s03 (IVF).
    *
    * Exact all-pairs within a block is O(block²) compute BY SEMANTICS,
    * but a naive label-equi self-join also makes it O(block²) on ONE
    * shuffle key — with 10 labels the whole corpus runs on ≤10 tasks
    * (the sf1 scale run exposed exactly this: 33x wall-time for 10x
    * data). So the pairs come from a chunked TRIANGLE join: each vector
    * gets a stable chunk `xxhash64(id) mod chunks`, the left side
    * replicates each row to its row of the upper-triangular chunk grid
    * and the right side to its column, and the join key is
    * (label, chunk_i, chunk_j) — labels x chunks(chunks+1)/2 evenly
    * sized keys instead of `labels`, same exact pair set (each
    * unordered pair lands in exactly one grid cell; the diagonal
    * dedups by id order). Replication factor is (chunks+1)/2 per side
    * on ~100-byte rows — shuffle stays tiny while pair generation uses
    * every core. `chunks=1` degenerates to the naive join.
    */
  def embeddingDedupPairs(emb: DataFrame, idCol: String = "vec_id",
      vecCol: String = "embedding", blockCol: String = "label", topK: Int = 50,
      chunks: Int = 8): DataFrame = {
    require(chunks >= 1, s"chunks must be >= 1: $chunks")
    val s = emb.sparkSession
    val e = emb.select(Cols.q(idCol).as("vec_id"), Cols.q(vecCol).as("embedding"),
      Cols.q(blockCol).as("label"))
      .withColumn("chunk", pmod(xxhash64(col("vec_id")), lit(chunks)).cast("int"))
    // left covers grid cells (chunk, j >= chunk); right covers (i <= chunk, chunk).
    // The left side is explicitly repartitioned by the grid key: pair
    // generation must parallelize by GRID CELL, not by however many
    // splits the scan happened to produce — when the right side is small
    // enough to broadcast, the join's parallelism IS the probe side's
    // partitioning (a single-file scan would run the whole O(block²)
    // pass in one task); when both sides are big, the sort-merge join
    // requires this exact distribution anyway and reuses the exchange.
    val left = e.withColumn("cj", explode(sequence(col("chunk"), lit(chunks - 1))))
      .repartition(col("label"), col("chunk"), col("cj"))
    val right = e.withColumn("ci", explode(sequence(lit(0), col("chunk"))))
    left.as("a").join(right.as("b"),
        col("a.label") === col("b.label") &&
        col("a.chunk") === col("b.ci") && col("a.cj") === col("b.chunk") &&
        // join keys force a.chunk <= b.chunk; off-diagonal cells see each
        // unordered pair in exactly one orientation, the diagonal in both
        (col("a.chunk") =!= col("b.chunk") || col("a.vec_id") < col("b.vec_id")))
      .select(col("a.label").as("label"),
        least(col("a.vec_id"), col("b.vec_id")).as("v1"),
        greatest(col("a.vec_id"), col("b.vec_id")).as("v2"),
        // graft_round, not round: Spark's Round on doubles allocates a
        // BigDecimal per row (measured: 2x d05's whole pair pass at sf1)
        graft.functions.FastRound.round6(s,
          CosineSimilarity.cosine(s, col("a.embedding"), col("b.embedding"))).as("cosine"))
      .orderBy(col("cosine").desc, col("v1").asc, col("v2").asc)
      .limit(topK)
  }

  /** Embedding near-dup pairs WITHOUT a blocking label — the 100 TB
    * path for corpora where no curated block key exists. Candidates
    * block on the same random-hyperplane LSH buckets as s02
    * ([[Similarity.lshBucketed]]: every bucket id computed in one
    * codegen'd pass inside the scan); in-bucket (v1 < v2) pairs are
    * generated per (table, bucket) with a size cap so a degenerate
    * bucket (mass-identical vectors) can't go quadratic; verification
    * rescores ONLY the candidates with the exact native `graft_cosine`
    * and keeps pairs at or above `minCosine`.
    *
    * Scale shape: one groupBy over the (vectors x tables) bucket store,
    * pair explode bounded by `maxBucketSize`, a pair `distinct` (a true
    * near-dup pair collides in several tables), and two id-equi joins
    * to fetch the embeddings back for exact rescoring. Never an
    * all-pairs step. The default blocking is FINER than s02's (8 tables
    * x 8 planes = 256 buckets each vs 8x4's 16): near-dup candidates
    * sit at tiny angles that survive long plane conjunctions, and the
    * finer the buckets the smaller the quadratic in-bucket term.
    * Recall for genuine near-dups stays high by construction: at cosine
    * 0.95 an 8-plane table collides with p~0.43, so 8 tables miss with
    * p~(1-0.43)^8 ~ 1%; at cosine 0.99, p_miss ~ 1e-4.
    *
    * The plane count is CORPUS-SIZED by default (r9, same rule as
    * [[Similarity.knnJoinLsh]] but floored at the tuned fine 8): a
    * fixed geometry at growing n pushes bucket occupancy through the
    * cap, and because capped buckets are dropped the detector SILENTLY
    * sheds recall — the loss starts well before mean occupancy reaches
    * the cap (orthant sizes spread wide under random hyperplanes;
    * measured in DedupSpec: 30% of planted twins vanish at mean
    * occupancy 1.6x cap) and deepens toward total as n grows past
    * ~cap x 2^planes. Sizing planes to keep mean occupancy ~cap/8
    * keeps the cap a skew guard at any corpus size; tiny-angle pairs
    * survive the longer conjunctions (that is the near-dup regime),
    * and callers chasing recall at moderate cosine raise `numTables`
    * instead. Sizing `maxBucketSize` against the box/fleet's spill
    * capacity is [[Similarity.suggestedLshCap]] — the productized form
    * of the CHECK_sf100_ann.txt occupancy law (this operator at 5M
    * vectors, cap=1000, died on ~70 GB of spill; cap=200 fit and ran).
    */
  def embeddingLshPairs(emb: DataFrame, idCol: String = "vec_id",
      vecCol: String = "embedding", minCosine: Double = 0.9,
      maxBucketSize: Int = 1000, topK: Int = 100,
      numTables: Int = 8, planesPerTable: Int = 0,
      corpusSize: Long = 0L): DataFrame = {
    val e = emb.select(Cols.q(idCol).as("vec_id"), Cols.q(vecCol).as("embedding"))
    // sizing needs only n's magnitude — callers with a known/estimated
    // corpus size (catalog stats, file sizes) pass it and skip the
    // plan-build count() job entirely (see SharedCount)
    val planes =
      if (planesPerTable > 0) planesPerTable
      else math.max(8, Similarity.knnPlanes(
        if (corpusSize > 0L) corpusSize else e.count(), maxBucketSize))
    embeddingLshTopK(e, Similarity.lshBucketed(e, numTables, planes),
      minCosine, maxBucketSize, topK)
  }

  private[operators] def embeddingLshTopK(e: DataFrame, bucketed: DataFrame,
      minCosine: Double, maxBucketSize: Int, topK: Int): DataFrame = {
    val s = e.sparkSession
    val buckets = cappedIdBuckets(bucketed.select(col("tbl"), col("bucket"), col("vec_id")),
      Seq("tbl", "bucket"), "vec_id", maxBucketSize.toLong, minSize = 2L)
    // dedup AFTER the rescore+threshold, not on the raw candidates: a
    // true near-dup pair collides in several tables, but a distinct over
    // ALL candidate pairs shuffles the whole candidate volume to remove
    // only that per-table multiplicity (measured at sf1: ~6 s to dedup
    // 8.1M -> 7.3M pairs), while the minCosine filter is about to discard
    // nearly everything anyway. Rescoring a duplicate candidate is a few
    // redundant map-side flops; the dropDuplicates then shuffles only
    // the SURVIVORS (cosine is deterministic per pair, so keeping any
    // one duplicate row is exact).
    bucketPairs(buckets)
      .join(e.select(col("vec_id").as("d1"), col("embedding").as("e1")), "d1")
      .join(e.select(col("vec_id").as("d2"), col("embedding").as("e2")), "d2")
      .select(col("d1").as("v1"), col("d2").as("v2"),
        graft.functions.FastRound.round6(s,
          CosineSimilarity.cosine(s, col("e1"), col("e2"))).as("cosine"))
      .filter(col("cosine") >= minCosine)
      .dropDuplicates("v1", "v2")
      .orderBy(col("cosine").desc, col("v1").asc, col("v2").asc)
      .limit(topK)
  }

  /** d08: gate binding of [[embeddingLshPairs]] with its own
    * session-cached fine (8x8) bucket store. The synthetic embeddings
    * are near-orthogonal (max pairwise cosine ~0.5), so the gate
    * threshold is 0.3 — the top of THIS corpus's similarity range; a
    * real near-dup corpus would run the 0.9 default. rows-only oracle
    * (bucket membership is engine-local); DedupSpec pins exact-rescore
    * values and proves ~100% recall on planted near-identical vectors
    * (the regime the fine blocking is tuned for).
    */
  /** The embeddings table's row count, computed AT MOST ONCE per
    * (session, dir) and shared by every gate that corpus-sizes its LSH
    * geometry (d08's fine store, s08's knn store): geometry sizing
    * must not prepend one full-scan counting job per operator.
    */
  private[operators] def embeddingsCount(s: SparkSession, dir: String): Long =
    SharedCount(s, dir, "embeddings_rows")(Tables.embeddings(s, dir).count())

  def d08EmbeddingLsh(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(s, dir)
    // cache only the bucket assignment: the rescore re-joins the source
    // embeddings by id, so persisting the 64-float embedding once per
    // LSH table (8x the whole payload) would be pure wasted storage.
    // Corpus-sized planes (floored at the tuned fine 8), geometry in
    // the cache key like s08; the count is the session-shared one
    val planes = math.max(8, Similarity.knnPlanes(embeddingsCount(s, dir), 1000))
    val bucketed = SharedIndex(s, dir, s"hyperplane_buckets_fine_p$planes") {
      Similarity.lshBucketed(e, numTables = 8, planesPerTable = planes)
        .select("vec_id", "tbl", "bucket")
    }
    embeddingLshTopK(e.select(col("vec_id"), col("embedding")), bucketed,
      minCosine = 0.3, maxBucketSize = 1000, topK = 100)
  }

  /** d05: gate binding of [[embeddingDedupPairs]]. */
  def d05EmbeddingCosine(s: SparkSession, dir: String): DataFrame =
    embeddingDedupPairs(Tables.embeddings(s, dir))

  /** Benchmark-contamination check over any corpus/benchmark frames:
    * for each corpus doc, the fraction of its distinct word-3-gram
    * shingles that appear ANYWHERE in the benchmark set — the standard
    * test-set leakage detector a training pipeline runs before a data
    * release.
    *
    * Scale shape: the benchmark's pooled distinct shingle set is small
    * relative to the corpus (benchmarks are), so the hit join
    * broadcasts it while the corpus shingle store streams map-side —
    * one aggregation per side, one equi-join, never doc x doc pairs.
    */
  /** Per-doc distinct word-3-gram store shared by the contamination
    * checks: (doc_id, shingle), one row per distinct shingle per doc.
    */
  private def contaminationShingles(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val s = df.sparkSession
    normalized(df, idCol, textCol)
      .withColumn("tokens", split(col("text"), " "))
      .filter(size(col("tokens")) >= 3)
      .select(col("doc_id"),
        explode(array_distinct(graft.functions.WordShingles.shingles(s, col("tokens"), 3))).as("shingle"))
  }

  /** Per-doc contamination rollup from the corpus shingle store and a
    * (doc_id, shingle) hit subset: fraction of each doc's distinct
    * shingles flagged.
    */
  private def contaminationRollup(cs: DataFrame, hits: DataFrame, topK: Int): DataFrame = {
    val sizes = cs.groupBy("doc_id").agg(count(lit(1)).as("n_shingles"))
    val hitCounts = hits.groupBy("doc_id").agg(count(lit(1)).as("n_contaminated"))
    sizes.join(hitCounts, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_shingles"),
        coalesce(col("n_contaminated"), lit(0L)).as("n_contaminated"),
        round(coalesce(col("n_contaminated"), lit(0L)).cast("double") / col("n_shingles"), 6)
          .as("contamination"))
      .orderBy(col("contamination").desc, col("doc_id").asc)
      .limit(topK)
  }

  def contaminationCheck(corpus: DataFrame, benchmark: DataFrame,
      idCol: String = "doc_id", textCol: String = "text", topK: Int = 100): DataFrame = {
    val cs = contaminationShingles(corpus, idCol, textCol)
    val bs = contaminationShingles(benchmark, idCol, textCol).select("shingle").distinct()
    contaminationRollup(cs, cs.join(bs, Seq("shingle")), topK)
  }

  /** [[contaminationCheck]] with the benchmark side compressed to a
    * Bloom SKETCH — the 100 TB form of the leakage detector. d06's
    * exact formulation distinct-shuffles the benchmark's member set
    * and broadcasts it into the hit join; at a real held-out suite's
    * size that broadcast is gigabytes. Here the benchmark aggregates
    * straight into a fixed-size bloom (optimal bits for
    * `expectedItems` at `fpp`; partials merge bitwise, duplicate
    * shingles are idempotent so there is NO distinct and NO
    * benchmark-side shuffle beyond the one-row agg), the bloom reaches
    * the corpus scan as a scalar-subquery constant (the same mechanism
    * Spark's own runtime join filters use — [[graft.functions.BloomSketch]]),
    * and the membership probe is a codegen'd xxhash64 + bit test
    * INSIDE the corpus scan: the hit join disappears entirely; only
    * the per-doc rollup shuffles, same as d06.
    *
    * One-sided error: a benchmark shingle ALWAYS hits (no false
    * negatives — contamination is never under-reported, the direction
    * that matters for a leakage gate); a clean shingle false-hits with
    * probability <= fpp, so per-doc counts are >= the exact answer and
    * exceed it by ~fpp of clean probes in expectation. DedupSpec pins
    * both bounds and exact agreement on fully-contaminated docs.
    */
  def contaminationCheckBloom(corpus: DataFrame, benchmark: DataFrame,
      idCol: String = "doc_id", textCol: String = "text", topK: Int = 100,
      expectedItems: Long = 1000000L, fpp: Double = 0.01): DataFrame = {
    val cs = contaminationShingles(corpus, idCol, textCol)
    val bloom = contaminationShingles(benchmark, idCol, textCol)
      .agg(graft.functions.BloomSketch.bloomAgg(corpus.sparkSession,
        xxhash64(col("shingle")), expectedItems, fpp).as("bloom"))
    contaminationRollup(cs,
      cs.filter(graft.functions.BloomSketch.mightContain(bloom, xxhash64(col("shingle")))), topK)
  }

  /** Serialize the benchmark's shingle membership to bloom BYTES — the
    * form a streaming probe needs ([[contaminationFlagsAgainstBloom]]):
    * `BloomFilterMightContain` accepts only a CONSTANT or
    * scalar-subquery bloom, and streaming plans admit no scalar
    * subqueries, so the sketch state is fetched once at plan build.
    * One row of optimalNumOfBits/8 bytes however large the benchmark —
    * the same cost class as broadcasting a trained codebook, not a
    * data collect.
    */
  def benchmarkBloom(benchmark: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", expectedItems: Long = 1000000L,
      fpp: Double = 0.01): Array[Byte] =
    contaminationShingles(benchmark, idCol, textCol)
      .agg(graft.functions.BloomSketch.bloomAgg(benchmark.sparkSession,
        xxhash64(col("shingle")), expectedItems, fpp).as("bloom"))
      .head.getAs[Array[Byte]](0)

  /** Per-doc contamination flags computed entirely INSIDE the row — no
    * explode, no rollup shuffle: the distinct-shingle array folds
    * through `aggregate` with a bloom-membership probe per element, so
    * the operator is map-only and therefore STREAMING-legal
    * ([[graft.streaming.StreamingOps.contaminationGate]] wires it to an
    * unbounded corpus). Same per-doc counts as
    * [[contaminationCheckBloom]]'s rollup by construction (same shingle
    * store, same sketch geometry) — pinned in DedupSpec.
    */
  def contaminationFlagsAgainstBloom(docs: DataFrame, bloomBytes: Array[Byte],
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val s = docs.sparkSession
    graft.functions.BloomSketch.register(s)
    normalized(docs, idCol, textCol)
      .withColumn("tokens", split(col("text"), " "))
      .filter(size(col("tokens")) >= 3)
      .withColumn("shingles",
        array_distinct(graft.functions.WordShingles.shingles(s, col("tokens"), 3)))
      .select(col("doc_id"),
        size(col("shingles")).cast("long").as("n_shingles"),
        aggregate(col("shingles"), lit(0L), (acc, sh) =>
          acc + when(call_function("graft_might_contain", lit(bloomBytes), xxhash64(sh)), 1L)
            .otherwise(0L)).as("n_contaminated"))
      .withColumn("contamination_frac",
        round(col("n_contaminated").cast("double") / col("n_shingles"), 6))
  }

  /** d06: gate binding of [[contaminationCheck]] — docs with
    * doc_id % 10 == 7 stand in as the held-out benchmark, the rest as
    * the training corpus.
    */
  def d06Contamination(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    contaminationCheck(
      docs.filter(pmod(col("doc_id"), lit(10L)) =!= 7L),
      docs.filter(pmod(col("doc_id"), lit(10L)) === 7L))
  }

  /** d10: gate binding of [[contaminationCheckBloom]] on the same
    * corpus/benchmark split as d06. rows-only oracle (which clean
    * shingles false-hit depends on the sketch's hash geometry —
    * engine-local by construction); DedupSpec holds the sketch answer
    * against exact d06: never below it per doc, within the fpp budget
    * in total, identical on fully-contaminated docs.
    */
  def d10ContaminationBloom(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    contaminationCheckBloom(
      docs.filter(pmod(col("doc_id"), lit(10L)) =!= 7L),
      docs.filter(pmod(col("doc_id"), lit(10L)) === 7L))
  }

  // -----------------------------------------------------------------
  // d11: semantic dedup (SemDeDup, Abbas et al. 2023 — the curation
  // step LAION/pretraining pipelines run on embedding space): cluster
  // the corpus with the TRAINED coarse quantizer, prune within each
  // cluster by exact cosine, keep one representative per semantic-
  // duplicate group. d05/d08 find near-dup PAIRS; this composes the
  // s04 trained codebook with the capped in-bucket pair machinery and
  // d07's cluster resolution into the full keep/drop decision.
  // -----------------------------------------------------------------

  /** Candidate near-dup pairs for [[semanticDedup]]: Lloyd-trained
    * coarse cells ([[Similarity.trainIvfCodebook]]) as the blocking
    * key — every vector assigned to its `assignReplicas` nearest
    * centroids (multi-assignment heals cluster-boundary splits, the
    * s03/s06 trick), capped in-cell (v1 < v2) pair generation, exact
    * native `graft_cosine` rescore at or above `minCosine`, duplicate
    * candidates (pairs meeting in several cells) dropped AFTER the
    * threshold like d08.
    *
    * Scale shape: training is the bounded Lloyd loop (one broadcast
    * scoring pass + one cells x dim mean agg per round); assignment is
    * map-only against the broadcast codebook; pairs explode only
    * inside capped cells (quadratic term bounded by `maxCellSize`,
    * never corpus-sized); rescore joins are id-equi. A cell beyond
    * the cap is DROPPED (the house skew guard) — a corpus where one
    * semantic cluster exceeds the cap should raise `numCells` (finer
    * centroids split it) or run d08's multi-table LSH first. Sizing
    * `maxCellSize` against spill capacity is
    * [[Similarity.suggestedPairCap]] (worst-case in-cell pair volume
    * — the CHECK_sf100_ann.txt occupancy law productized).
    */
  def semanticDedupPairs(emb: DataFrame, idCol: String = "vec_id",
      vecCol: String = "embedding", minCosine: Double = 0.95, numCells: Int = 64,
      iterations: Int = 2, assignReplicas: Int = 2, maxCellSize: Int = 1000): DataFrame = {
    val e = emb.select(Cols.q(idCol).as("vec_id"), Cols.q(vecCol).as("embedding"))
    semanticPairsWithCodebook(e,
      Similarity.trainIvfCodebook(e, numCells = numCells, iterations = iterations),
      minCosine, assignReplicas, maxCellSize)
  }

  /** The pair generator with a CALLER-supplied codebook (cell,
    * centroid) — train once (s04's `trainIvfCodebook`), reuse across
    * runs/thresholds, exactly like [[Similarity.annIvfWithCodebook]].
    */
  private def semanticPairsWithCodebook(e: DataFrame, codebook: DataFrame,
      minCosine: Double, assignReplicas: Int, maxCellSize: Int): DataFrame = {
    val s = e.sparkSession
    val assigned = Similarity.assignCells(e,
      codebook.select(col("cell"), col("centroid").as("seed_emb")), assignReplicas)
    val buckets = cappedIdBuckets(assigned.select(col("cell"), col("vec_id")),
      Seq("cell"), "vec_id", maxCellSize.toLong, minSize = 2L)
    bucketPairs(buckets)
      .join(e.select(col("vec_id").as("d1"), col("embedding").as("e1")), "d1")
      .join(e.select(col("vec_id").as("d2"), col("embedding").as("e2")), "d2")
      .select(col("d1").as("v1"), col("d2").as("v2"),
        graft.functions.FastRound.round6(s,
          CosineSimilarity.cosine(s, col("e1"), col("e2"))).as("cosine"))
      .filter(col("cosine") >= minCosine)
      .dropDuplicates("v1", "v2")
  }

  /** Full SemDeDup resolution over any embedding frame: one row per
    * vector — `group_id` (the transitive semantic-duplicate group via
    * [[dupClusters]] min-label propagation; a vector in no group is its
    * own) and `kept` (true exactly for each group's min-id
    * representative — deterministic, like d01's keep-min rule). The
    * training-pipeline contract: filter `kept` and the corpus is
    * semantically deduplicated at `minCosine`.
    */
  def semanticDedup(emb: DataFrame, idCol: String = "vec_id",
      vecCol: String = "embedding", minCosine: Double = 0.95, numCells: Int = 64,
      iterations: Int = 2, assignReplicas: Int = 2, maxCellSize: Int = 1000): DataFrame =
    resolveKeepSet(emb.select(Cols.q(idCol).as("vec_id")),
      semanticDedupPairs(emb, idCol, vecCol, minCosine, numCells,
        iterations, assignReplicas, maxCellSize))

  /** [[semanticDedup]] with a caller-trained (cell, centroid) codebook
    * — the deployment shape: train the quantizer once, reuse it across
    * dedup sweeps at different thresholds (and share it with the s04
    * ANN index, which accepts the same codebook).
    */
  def semanticDedupWithCodebook(emb: DataFrame, codebook: DataFrame,
      idCol: String = "vec_id", vecCol: String = "embedding",
      minCosine: Double = 0.95, assignReplicas: Int = 2,
      maxCellSize: Int = 1000): DataFrame = {
    val e = emb.select(Cols.q(idCol).as("vec_id"), Cols.q(vecCol).as("embedding"))
    resolveKeepSet(e.select(col("vec_id")),
      semanticPairsWithCodebook(e, codebook, minCosine, assignReplicas, maxCellSize))
  }

  private def resolveKeepSet(ids: DataFrame, pairs: DataFrame): DataFrame = {
    val groups = dupClusters(pairs, "v1", "v2")
      .select(col("doc_id").as("vec_id"), col("cluster_id"))
    ids.join(groups, Seq("vec_id"), "left")
      .select(col("vec_id"),
        coalesce(col("cluster_id"), col("vec_id")).as("group_id"),
        (coalesce(col("cluster_id"), col("vec_id")) === col("vec_id")).as("kept"))
      .orderBy("vec_id")
  }

  /** d11: gate binding of [[semanticDedupWithCodebook]] over a
    * session-cached trained codebook (SharedIndex, the s04 pattern —
    * the quantizer is a reusable artifact, so bench reps measure the
    * dedup pass, not retraining). The synthetic embeddings are
    * near-orthogonal (max pairwise cosine ~0.5), so the gate thresholds
    * at 0.3 — the top of THIS corpus's similarity range, like d08's
    * gate; a real near-dup corpus runs the 0.95 default. rows-only
    * oracle (trained centroids and cell membership are engine-local);
    * DedupSpec proves planted semantic groups collapse to one kept
    * representative, singletons survive, and the mass-identical
    * adversarial corpus stays capped.
    */
  def d11SemanticDedup(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    val codebook = SharedIndex(s, dir, "semdedup_codebook_c32") {
      Similarity.trainIvfCodebook(
        emb.select(col("vec_id"), col("embedding")), numCells = 32, iterations = 2)
    }
    semanticDedupWithCodebook(emb, codebook, minCosine = 0.3)
  }

  // ─── d12: incremental dedup against a persisted MinHash index ───

  /** MinHash signature + LSH band index over a corpus — the PERSISTED
    * artifact an ingest pipeline maintains so each day's batch dedups
    * against all of history WITHOUT re-scanning history's pairs.
    * Returns `(sigs, bands)`:
    *   - `sigs`: one row per doc, `sig` = 64 minhash components
    *     (~512 B/doc whatever the doc size);
    *   - `bands`: `(band, bucket, doc_id)` — the d03 16x4 banding with
    *     the over-cap buckets ALREADY dropped (the cap is a property of
    *     the index, paid once at build, so no per-batch window ever
    *     touches the index again).
    *
    * Unlike the d03-internal signature build (which runs over the
    * corpus-DF-capped bucket store), signatures here are computed from
    * each doc's own raw distinct shingles, so two INDEPENDENT builds —
    * history today, a batch tomorrow — yield comparable signatures; the
    * DF cap exists to bound pair generation, which banding + the bucket
    * cap already bound here.
    */
  def minhashIndex(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", maxBucketSize: Long = MaxLshBucket): (DataFrame, DataFrame) = {
    val sigs = buildSigArrays(docs, idCol, textCol)
    (sigs, indexFromSigs(sigs, maxBucketSize))
  }

  /** Rebuild the band side of a MinHash index from its signature side —
    * map-only banding plus the global bucket cap. This is the
    * COMPACTION step of the [[indexAppend]] LSM story: signatures are
    * per-doc (a union of appends is already canonical), so re-banding
    * the signature union yields exactly the index a fresh
    * [[minhashIndex]] build over the whole corpus would — per-build
    * caps that accumulated across appends collapse back to the one
    * global cap, without touching any document text.
    */
  def indexFromSigs(sigs: DataFrame, maxBucketSize: Long = MaxLshBucket): DataFrame =
    cappedFlatBuckets(
      sigBands(sigs).select(col("band"), col("bucket"), col("ds.doc_id").as("doc_id")),
      Seq("band", "bucket"), maxBucketSize, minSize = 1L)

  /** Raw-shingle signature arrays: `(doc_id, sig: array<long>[64])`.
    * MAP-ONLY: the native `graft_minhash64` expression folds all 64
    * components inside the scan row, so building an index — or signing
    * an ingest batch — costs zero exchanges (the explode + 64-min-agg
    * formulation this replaces shuffled the whole shingle store;
    * DedupSpec pins the two bit-identical).
    */
  private def buildSigArrays(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val s = docs.sparkSession
    normalized(docs, idCol, textCol)
      .filter(col("text").isNotNull)
      .withColumn("tokens", split(col("text"), " "))
      .filter(size(col("tokens")) >= 3)
      .select(col("doc_id"), graft.functions.MinHash64.sig(s,
        graft.functions.WordShingles.shingles(s, col("tokens"), 3)).as("sig"))
      .filter(col("sig").isNotNull)
  }

  /** `(ds: struct(doc_id, sig), band, bucket)` — d03's banding derived
    * map-only from compact signature arrays.
    */
  private def sigBands(sigs: DataFrame): DataFrame =
    sigs.select(struct(col("doc_id"), col("sig")).as("ds"),
        explode(array((0 until NumBands).map { b =>
          struct(lit(b).as("band"),
            xxhash64((b * RowsPerBand until (b + 1) * RowsPerBand)
              .map(i => col("sig")(i)): _*).as("bucket"))
        }: _*)).as("bb"))
      .select(col("ds"), col("bb.band").as("band"), col("bb.bucket").as("bucket"))

  /** Near-dup matches of a NEW batch against an existing [[minhashIndex]]
    * — the incremental-ingest flavor of d03: history is touched only
    * through its index, never its text, and never pairwise with itself.
    * Jaccard is ESTIMATED as the fraction of agreeing signature
    * components (the unbiased MinHash estimator, stderr
    * sqrt(J(1-J)/64) <= 0.063) — the index doesn't carry shingle sets,
    * that's the point of it being 512 B/doc.
    *
    * Scale shape: the batch side builds its own signatures (one groupBy
    * OVER THE BATCH), bands map-only, and caps ITS buckets with a
    * batch-sized window; the band join and the old-sig fetch are both
    * equi-joins where the batch/candidate side is the small build side
    * (AQE broadcasts it), so the index is SCANNED but never shuffled —
    * per-batch cost is O(batch) + one index scan, independent of
    * history's pair structure. Candidate pairs dedupe across bands
    * before the sig fetch; over-cap batch buckets drop (house rule —
    * mass-identical batch content caps out instead of going quadratic
    * against the index).
    */
  def incrementalNearDups(sigs: DataFrame, bands: DataFrame, newDocs: DataFrame,
      idCol: String = "doc_id", textCol: String = "text",
      minEstJaccard: Double = 0.5, maxBucketSize: Long = MaxLshBucket): DataFrame = {
    val (newSigs, newBands) = minhashIndex(newDocs, idCol, textCol, maxBucketSize)
    incrementalNearDupsSigned(sigs, bands, newSigs, newBands, minEstJaccard)
  }

  /** [[incrementalNearDups]] with the batch already signed (its own
    * [[minhashIndex]] output) — the ingest-loop form: sign each
    * arriving batch ONCE, probe the index with this, then fold the
    * same signed batch into the index with [[indexAppend]]. All three
    * joins carry the batch-derived side as the small build side.
    */
  def incrementalNearDupsSigned(sigs: DataFrame, bands: DataFrame,
      newSigs: DataFrame, newBands: DataFrame,
      minEstJaccard: Double = 0.5): DataFrame = {
    val cand = newBands
      .join(bands.withColumnRenamed("doc_id", "old_id"), Seq("band", "bucket"))
      .filter(col("doc_id") =!= col("old_id"))
      .select(col("doc_id").as("new_id"), col("old_id"))
      .dropDuplicates("new_id", "old_id")
    cand
      .join(newSigs.select(col("doc_id").as("new_id"), col("sig").as("new_sig")), "new_id")
      .join(sigs.select(col("doc_id").as("old_id"), col("sig").as("old_sig")), "old_id")
      .select(col("new_id"), col("old_id"),
        round(
          expr("aggregate(zip_with(new_sig, old_sig, (a, b) -> IF(a = b, 1, 0)), 0, (acc, v) -> acc + v)")
            .cast("double") / NumHashes, 6).as("est_jaccard"))
      .filter(col("est_jaccard") >= minEstJaccard)
      .orderBy(col("est_jaccard").desc, col("new_id"), col("old_id"))
  }

  /** Fold a signed batch into the index — the LSM-style append step of
    * the ingest loop: two map-only unions, no recompute of history.
    * Each side keeps the bucket cap its own build applied, so after
    * many appends one logical bucket can hold up to cap x builds rows;
    * like an LSM tree, compact periodically (rebuild with
    * [[minhashIndex]] over the signature union) to re-apply the global
    * cap. Probes stay correct in between — the cap is a skew guard,
    * not a semantics bound.
    */
  def indexAppend(sigs: DataFrame, bands: DataFrame,
      newSigs: DataFrame, newBands: DataFrame): (DataFrame, DataFrame) =
    (sigs.unionByName(newSigs), bands.unionByName(newBands))

  /** d12: gate binding — history = 80% of the corpus (doc_id % 5 != 0),
    * today's batch = the other 20%, dedup the batch against history's
    * session-cached index (reps measure per-batch work, not the index
    * build — exactly the deployment split). rows-only oracle (minhash
    * seeds and banding are engine-local); DedupSpec pins planted-dup
    * recall, estimator accuracy vs exact Jaccard, and determinism;
    * AdversarialShapeSpec pins the batch-bucket cap.
    */
  def d12IncrementalDedup(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val sigs = SharedIndex(s, dir, "minhash_sig_index_80") {
      buildSigArrays(docs.filter(col("doc_id") % 5 =!= 0), "doc_id", "text")
    }
    // bands derive from the CACHED sigs so the index is aggregated once
    val bands = SharedIndex(s, dir, "minhash_band_index_80") {
      indexFromSigs(sigs)
    }
    incrementalNearDups(sigs, bands, docs.filter(col("doc_id") % 5 === 0),
      minEstJaccard = 0.35).limit(100)
  }

  // ----- d14: C4-style line-level dedup (sub-document granularity) ---

  /** (doc, pos) encoded into ONE bounded long — `doc << 32 | pos`,
    * strictly monotone in the (doc, pos) lexicographic order over the
    * guarded domain 0 <= doc < 2^31, 0 <= pos < 2^32 — so the
    * keep-first `min(struct(doc, pos))` aggregations (d14/d18) become
    * `min(LONG)`: a fixed-width agg buffer that HASH-aggregates
    * instead of forcing the exploded occurrence stream through
    * Sort + SortAggregate (a var-width struct buffer cannot hash —
    * r18, guide §5, VERDICT r17 #4). The domain guard fails LOUDLY
    * (raise_error with the offending pair) on the row that exceeds
    * it, never silently mis-orders. Callers gate on integral id/pos
    * column types and keep the struct path otherwise.
    */
  private def docPosKey(doc: Column, pos: Column): Column =
    when(doc.cast("long").between(0L, 2147483647L) &&
        pos.cast("long").between(0L, 4294967295L),
      shiftleft(doc.cast("long"), 32) + pos.cast("long"))
      .otherwise(raise_error(concat(
        lit("keep-first long-encoding domain exceeded: (doc, pos) = ("),
        doc.cast("string"), lit(", "), pos.cast("string"),
        lit(") outside [0, 2^31) x [0, 2^32)"))))

  private def isIntegral(t: org.apache.spark.sql.types.DataType): Boolean = t match {
    case org.apache.spark.sql.types.ByteType | org.apache.spark.sql.types.ShortType |
         org.apache.spark.sql.types.IntegerType | org.apache.spark.sql.types.LongType => true
    case _ => false
  }

  /** Global keep-first line deduplication over an exploded
    * `(doc, pos, line)` frame — C4's cleaning rule at line granularity:
    * every distinct line survives exactly ONCE corpus-wide (at its
    * first occurrence in `(doc, pos)` order) and every later
    * occurrence is dropped, which is how boilerplate (nav bars, cookie
    * banners, license headers) is stripped from web corpora without
    * touching whole-document dedup. Returns one row per document:
    * `(doc_id, n_lines, n_kept, n_removed, kept_text)` with the
    * surviving lines rejoined in order.
    *
    * Scale shape: keep-first is a MERGEABLE min(struct(doc, pos)) agg
    * keyed by the line digest — never a row_number window partitioned
    * by line content, which would pour a boilerplate line repeated
    * millions of times into ONE window task (the d02 stop-phrase skew
    * lesson at line granularity). The min table (one row per distinct
    * line) joins back by digest; the per-doc reassembly groups by
    * doc_id with a doc-bounded collect. Two aggregation shuffles plus
    * the join — all mergeable, no skewed window anywhere.
    *
    * NULL lines carry no content to deduplicate and are dropped (their
    * digest joins nothing); a document consisting ONLY of null lines
    * drops with them — spec-pinned, so callers with nullable line
    * sources coalesce first if empty-doc rows must survive.
    */
  def lineDedup(lines: DataFrame, docCol: String = "doc_id",
      posCol: String = "line_no", lineCol: String = "line"): DataFrame = {
    val l = lines.select(Cols.q(docCol).as("__doc"), Cols.q(posCol).as("__pos"),
      Cols.q(lineCol).as("__line"))
      .withColumn("__h", md5(col("__line").cast("binary")))
    // r18: integral (doc, pos) → keep-first as min(LONG) instead of
    // min(struct) so the distinct-line aggregation HASH-aggregates
    // (see [[docPosKey]]); __keep compares the same encoded key, so
    // the surviving occurrence set is identical. Non-integral ids
    // keep the struct path. The firsts frame keeps only digests with
    // >= 2 occurrences (guide §3.2 — a unique line is trivially its
    // own first, decided by the LEFT join's null instead of a
    // corpus-sized join build side; identical __keep per row).
    val (firsts, keyCmp) =
      if (isIntegral(l.schema("__doc").dataType) && isIntegral(l.schema("__pos").dataType)) {
        val k = docPosKey(col("__doc"), col("__pos"))
        (l.groupBy(col("__h")).agg(min(k).as("__kf"), count(lit(1)).as("__c"))
          .filter(col("__c") >= 2L).drop("__c"),
          col("__kf").isNull || k === col("__kf"))
      } else {
        (l.groupBy(col("__h"))
          .agg(min(struct(col("__doc"), col("__pos"))).as("__first"),
            count(lit(1)).as("__c"))
          .filter(col("__c") >= 2L).drop("__c"),
          col("__first").isNull ||
            (col("__doc") === col("__first.__doc") && col("__pos") === col("__first.__pos")))
      }
    l.join(firsts, Seq("__h"), "left")
      .withColumn("__keep", keyCmp)
      .groupBy(col("__doc").as("doc_id"))
      .agg(
        count(lit(1)).as("n_lines"),
        sum(when(col("__keep"), 1L).otherwise(0L)).as("n_kept"),
        concat_ws(" ",
          array_sort(collect_list(when(col("__keep"),
            struct(col("__pos"), col("__line"))))).getField("__line"))
          .as("kept_text"))
      .withColumn("n_removed", col("n_lines") - col("n_kept"))
      .select("doc_id", "n_lines", "n_kept", "n_removed", "kept_text")
  }

  /** d14: gate binding of [[lineDedup]] — documents are cut into
    * disjoint 16-token segments ([[Text.chunkDocs]] with stride =
    * chunkSize, the flat synthetic corpus's stand-in for newlines) and
    * deduped keep-first corpus-wide. Fully SQL-oracled: the chunking,
    * the global first-occurrence rule, and the ordered reassembly all
    * have exact DuckDB twins.
    */
  def d14LineDedup(s: SparkSession, dir: String): DataFrame =
    lineDedup(
      Text.chunkDocs(Tables.documents(s, dir), chunkSize = 16, stride = 16)
        .select(col("doc_id"), col("chunk_id"), col("chunk_text")),
      "doc_id", "chunk_id", "chunk_text")
      .orderBy("doc_id")

  /** Canonical "template" form of a document: lowercase, digit runs
    * collapsed to a single `0`, whitespace runs to one space, trimmed —
    * the CCNet-style normalization that makes boilerplate pages
    * differing only in counters, timestamps, casing, or formatting
    * hash identically. Deliberately spelled in the RE2-portable regex
    * subset (`[ \t\n\r]` written out, never `\s` — Java and RE2
    * disagree on `\s`'s membership) so the DuckDB oracle applies the
    * character-identical regexes.
    */
  private[graft] def templateCanon(text: Column): Column =
    lower(trim(regexp_replace(regexp_replace(text, "[0-9]+", "0"),
      "[ \\t\\n\\r]+", " ")))

  /** Normalize-then-hash ("template") dedup: exact dedup after
    * [[templateCanon]] — the cheap near-dup tier that catches pages
    * differing ONLY in casing / counters / whitespace, run BEFORE the
    * shingle methods (d02/d03) in real pipelines so the expensive
    * tiers see fewer rows. Reference analog: the extractor's
    * exact-duplicate drop (datapackage.py:524-533) operates on values
    * already normalized by fact parsing; this is the same
    * canonicalize-then-exact discipline at document granularity.
    *
    * Scale shape: identical to d01 — canonicalization is map-only
    * codegen'd string work fused into the scan, then ONE digest
    * groupBy with map-side partials. At 100 TB: hash-partition by
    * digest; the shuffle carries one row per distinct template per
    * map partition.
    */
  def templateDedup(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    normalized(docs, idCol, textCol)
      .groupBy(md5(templateCanon(col("text")).cast("binary")).as("canon_md5"))
      .agg(min(col("doc_id")).as("keep_doc_id"), count(lit(1)).as("n_copies"))

  /** d15: gate binding of [[templateDedup]] — fully SQL-oracled (the
    * canonicalization is the same two RE2-portable regexes in DuckDB;
    * md5-of-text equality is the d01/m04 convention). The gate corpus
    * is already canonical, so the planted-variant collapse (case /
    * digit / whitespace variants into one group) is pinned in
    * DedupSpec rather than exercised here.
    */
  def d15TemplateDedup(s: SparkSession, dir: String): DataFrame =
    templateDedup(Tables.documents(s, dir)).orderBy("keep_doc_id")

  /** RFC-3986-style URL canonicalization, the web-corpus twin of
    * [[templateCanon]]: lowercase scheme+host (case-insensitive per
    * RFC), strip the scheme's default port (:80/:443), drop the
    * fragment (never sent to the server), strip trailing slashes from
    * the path, and drop tracking parameters (utm_*, gclid, fbclid,
    * ref) while SORTING the surviving query params — the variants
    * crawlers see of one underlying page. Path and parameter case are
    * preserved (case-sensitive per RFC). A schemeless input passes
    * through the path/query steps only. Built entirely from
    * RE2-portable extract/replace steps (no replacement backreferences
    * — each engine's `$1` vs `\1` divergence never arises), so the
    * same canon restates in any engine.
    *
    * `trackingParams` is the drop-list POLICY (default: `utm_` prefix,
    * `gclid`, `fbclid`, `ref`). False-positive risk, by design: a site
    * that uses `ref=` SEMANTICALLY (e.g. a code-hosting site's branch
    * ref) would over-collapse distinct pages under the default list —
    * pass a corpus-appropriate list (e.g. drop `"ref"`) when that
    * matters. Entries ending in `_` match as prefixes; others match
    * the exact parameter name.
    */
  def canonicalizeUrl(url: Column,
      trackingParams: Seq[String] = Seq("utm_", "gclid", "fbclid", "ref"))
      : Column = {
    require(trackingParams.forall(_.matches("[A-Za-z0-9_.-]+")),
      s"tracking params must be plain token names, got $trackingParams")
    val sh = regexp_extract(url, "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*", 0)
    val shl = lower(sh)
    val shp = when(shl.startsWith("http://"), regexp_replace(shl, ":80$", ""))
      .when(shl.startsWith("https://"), regexp_replace(shl, ":443$", ""))
      .otherwise(shl)
    val rest = url.substr(length(sh) + 1, length(url))
    val nofrag = regexp_replace(rest, "#.*$", "")
    val path = regexp_replace(nofrag, "\\?.*$", "")
    val qs = regexp_extract(nofrag, "\\?(.*)$", 1)
    val pathc = regexp_replace(path, "/+$", "")
    // prefix entries (trailing _) drop every param they prefix; exact
    // entries drop only `name=`-form params — still one RE2 alternation
    val dropRe = "^(" + trackingParams.map { p =>
      if (p.endsWith("_")) java.util.regex.Pattern.quote(p)
      else java.util.regex.Pattern.quote(p) + "="
    }.mkString("|") + ")"
    val kept = array_sort(filter(split(qs, "&"), x =>
      x =!= lit("") && not(x.rlike(dropRe))))
    val qsc = array_join(kept, "&")
    concat(shp, pathc,
      when(qsc =!= lit(""), concat(lit("?"), qsc)).otherwise(lit("")))
  }

  /** Canonical-URL dedup: [[canonicalizeUrl]] then the d01/d15
    * keep-first discipline — the FIRST dedup tier of a web-scraped
    * corpus (a crawl sees the same page as http/https, with and
    * without tracking params, fragments, and trailing slashes; URL
    * canon collapses those before any content hashing runs).
    *
    * Scale shape: identical to d15 — the canon is map-only codegen'd
    * string work fused into the scan, then ONE canonical-key groupBy
    * with map-side partials; the shuffle carries one row per distinct
    * canonical URL per map partition.
    */
  def urlDedup(df: DataFrame, idCol: String = "doc_id",
      urlCol: String = "url"): DataFrame =
    df.select(Cols.q(idCol).as("__id"),
        canonicalizeUrl(Cols.q(urlCol)).as("canon_url"))
      .groupBy(col("canon_url"))
      .agg(min(col("__id")).as("keep_doc_id"), count(lit(1)).as("n_copies"))

  /** d16: gate binding of [[urlDedup]] — the gate corpus has no URL
    * column, so both engines construct the SAME messy URLs
    * deterministically from doc_id: mixed-case scheme/host, a default
    * :80 port on every 5th, a trailing slash on every 3rd, a utm_
    * tracking param on all, a ref param + fragment on every 4th. The
    * page identity is (doc_id % 60) — the id param's % 12 divides 60 —
    * so the 500 sf0.01 docs are 60 real pages seen under ~8 crawl
    * variants each, and the gate exercises the ACTUAL collapse (counts
    * + keep-first), not just canon-string equality. Fully SQL-oracled
    * (the d15 RE2-portability discipline).
    */
  def d16UrlDedup(s: SparkSession, dir: String): DataFrame = {
    val messy = Tables.documents(s, dir).select(col("doc_id"), concat(
      lit("HTTP://"),
      when(col("doc_id") % 2 === 0, lit("WWW.")).otherwise(lit("www.")),
      lit("Example.COM"),
      when(col("doc_id") % 5 === 0, lit(":80")).otherwise(lit("")),
      lit("/Docs/"), (col("doc_id") % 60).cast("string"),
      when(col("doc_id") % 3 === 0, lit("/")).otherwise(lit("")),
      lit("?utm_source=feed&id="), (col("doc_id") % 12).cast("string"),
      when(col("doc_id") % 4 === 0, lit("&ref=tw#sec2")).otherwise(lit(""))
    ).as("url"))
    urlDedup(messy).orderBy("canon_url")
  }

  /** Per-doc n-gram novelty against a reference corpus: the fraction
    * of each doc's distinct word-3-grams that appear NOWHERE in the
    * reference — the inverse of [[contaminationCheck]], scored over
    * every doc rather than a contaminated top-k. The training-data
    * read: novelty ~ 0 against the existing training set means the
    * candidate doc adds nothing (skip it); novelty ~ 1 against a
    * deduped corpus flags genuinely new material (or noise — pair with
    * t02's quality score). Shares the contamination family's shingle
    * store, so the 100 TB story is d06's: one mergeable distinct-
    * shingle aggregation per side, one shingle-keyed equi-join, one
    * per-doc rollup — never doc × doc.
    */
  def ngramNovelty(corpus: DataFrame, reference: DataFrame,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val cs = contaminationShingles(corpus, idCol, textCol)
    val rs = contaminationShingles(reference, idCol, textCol)
      .select("shingle").distinct()
    val sizes = cs.groupBy("doc_id").agg(count(lit(1)).as("n_shingles"))
    val seen = cs.join(rs, Seq("shingle"))
      .groupBy("doc_id").agg(count(lit(1)).as("__seen"))
    sizes.join(seen, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_shingles"),
        (col("n_shingles") - coalesce(col("__seen"), lit(0L))).as("n_novel"),
        round((col("n_shingles") - coalesce(col("__seen"), lit(0L)))
          .cast("double") / col("n_shingles"), 6).as("novelty"))
  }

  /** Exact-substring span-REMOVAL dedup (the Lee et al. 2022
    * "Deduplicating Training Data Makes Language Models Better"
    * operation, arXiv:2107.06499): where d09/d14 FIND duplicate
    * candidates, this produces the DEDUPLICATED CORPUS — every
    * duplicated token run of at least `minTokens` whitespace tokens
    * keeps its first occurrence (global (doc_id, pos) order, the
    * d14 keep-first discipline at span granularity) and is REMOVED
    * everywhere else, including later repeats inside the same doc.
    * Output: one row per input doc with the surviving text (kept
    * tokens re-joined single-spaced — whitespace canonicalization is
    * part of the contract), the original token count, and the number
    * of removed token positions.
    *
    * Mechanism: every `minTokens`-token window hashes to a portable
    * md5 gram key; the first occurrence of each distinct key is the
    * min (doc_id, pos) — a MERGEABLE min-struct aggregate, so the
    * hottest boilerplate gram (shared by millions of docs at 100 TB)
    * folds map-side and never builds a giant group; all other
    * occurrences mark their `minTokens` positions covered, covered
    * positions union per doc, and uncovered tokens re-join in
    * position order. A run of L ≥ minTokens shared tokens is covered
    * completely by its L − minTokens + 1 duplicated windows, so
    * whole duplicated paragraphs vanish, not just one window.
    *
    * Scale shape: gram hashing is in-scan (slice + md5 inside one
    * codegen'd transform — grams never materialize as strings past
    * the md5); keep-first is ONE mergeable agg; the occurrence⋈first
    * equi-join on the gram hash is AQE-skew-handled; covered-position
    * expansion is bounded by minTokens × duplicated windows; the
    * final assembly is doc-keyed joins. Never doc × doc anywhere.
    *
    * Reference analog: none (the extractor's fuzzy_dedup
    * (datapackage.py:524-533) drops whole duplicate ROWS); this is
    * beyond-reference training-data-pipeline surface.
    */
  def substringDedup(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", minTokens: Int = 8): DataFrame = {
    require(minTokens >= 2, s"minTokens must be >= 2, got $minTokens")
    val T = minTokens
    val base = docs.select(Cols.q(idCol).as("doc_id"), Cols.q(textCol).as("text"))
      .filter(col("text").isNotNull)
    val tokd = base
      .withColumn("toks",
        when(trim(col("text")) === "", array().cast("array<string>"))
          .otherwise(split(trim(col("text")), "\\s+")))
      .withColumn("n", size(col("toks")).cast("long"))
    // (doc, pos, gramhash) for every T-token window; 1-based pos
    val grams = tokd.filter(col("n") >= T)
      .select(col("doc_id"), explode(expr(
        s"transform(sequence(1, n - ${T - 1}), i -> " +
          s"struct(CAST(i AS BIGINT) AS pos, md5(concat_ws(' ', slice(toks, i, $T))) AS gh))"))
        .as("g"))
      .select(col("doc_id"), col("g.pos").as("pos"), col("g.gh").as("gh"))
    // non-first window STARTS collapse to one sorted array per doc —
    // everything after is in-row: the position explode + anti-join +
    // re-collect formulation this replaced spent three more exchanges
    // materializing every token as a row (measured ~1.4x slower at
    // sf0.1; identical output)
    //
    // r18 (guide §5, VERDICT r17 #4): an integral doc_id encodes
    // (doc_id, pos) into ONE bounded long — doc_id << 32 | pos, strictly
    // monotone in the (doc_id, pos) lexicographic order over the guarded
    // domain 0 <= doc_id < 2^31, 1 <= pos < 2^32 — so keep-first becomes
    // min(LONG): a fixed-width agg buffer that HASH-aggregates instead
    // of forcing the whole exploded gram stream through Sort +
    // SortAggregate (a var-width struct buffer cannot hash). The domain
    // guard fails LOUDLY (raise_error with the offending pair) the row
    // it is exceeded, never silently mis-orders. The occurrence⋈first
    // exchanges also shrink: both sides now carry (gh, one long) and
    // doc/pos decode AFTER the join (guide §2.3 — shuffle keys, not
    // payloads). Non-integral ids keep the struct path unchanged.
    // r18 #2 (guide §3.2 — reduce the join's build side): only ghs with
    // >= 2 occurrences can produce a non-first occurrence, and for a
    // unique gh the sole occurrence IS the min, so the old `__k != __kf`
    // filter dropped it anyway. Keeping only duplicated ghs in the
    // firsts frame (count rides the same hash agg) makes the INNER join
    // produce the identical row set while the build side shrinks from
    // every-distinct-gram to the duplicated fraction — at sf0.1 that is
    // what keeps the join broadcastable, and at 100 TB it is what keeps
    // the sort-merge fallback's small side proportional to actual
    // duplication instead of the corpus.
    // r18 #3 (guide §2.4 — two operations keyed the same way share one
    // exchange): the keep-first agg and the occurrence⋈first probe both
    // consume the gram stream keyed by gh. Without the explicit
    // repartition the probe branch RE-RAN the whole explode+md5 gram
    // projection (the broadcast join needs no exchange of its own, so
    // nothing canonicalized for AQE to reuse) — measured r18: the
    // second gram pass was ~0.7 s of the 2.5 s wall at sf0.1. With it,
    // both branches canonicalize onto ONE hashpartitioning(gh) exchange
    // (ReusedExchange in the executed plan): the grams hash ONCE, and
    // at 100 TB — where the dup side outgrows broadcast and the join
    // becomes sort-merge, shuffling the occurrence stream anyway — the
    // exchange this adds is the one the join already needed.
    val idType = base.schema("doc_id").dataType
    val coveredStarts = if (isIntegral(idType)) {
      val keyed = grams.select(col("gh"),
        docPosKey(col("doc_id"), col("pos")).as("__k"))
        .repartition(col("gh"))
      val firsts = keyed.groupBy("gh")
        .agg(min(col("__k")).as("__kf"), count(lit(1)).as("__c"))
        .filter(col("__c") >= 2L).drop("__c")
      keyed.join(firsts, Seq("gh"))
        .filter(col("__k") =!= col("__kf"))
        .select(shiftright(col("__k"), 32).cast(idType).as("doc_id"),
          col("__k").bitwiseAND(lit(4294967295L)).as("pos"))
        .groupBy("doc_id")
        .agg(sort_array(collect_set(col("pos"))).as("__starts"))
    } else {
      val g2 = grams.repartition(col("gh"))
      val firsts = g2.groupBy("gh")
        .agg(min(struct(col("doc_id"), col("pos"))).as("first"),
          count(lit(1)).as("__c"))
        .filter(col("__c") >= 2L).drop("__c")
      g2.join(firsts, Seq("gh"))
        .filter(col("doc_id") =!= col("first.doc_id") ||
          col("pos") =!= col("first.pos"))
        .groupBy("doc_id")
        .agg(sort_array(collect_set(col("pos"))).as("__starts"))
    }
    // in-row assembly is O(|starts| + |tokens|): the sorted window
    // starts merge into disjoint covered intervals via shifted-zip
    // boundary detection (a start opens an interval iff the previous
    // start's window cannot reach it; closes one iff the next start's
    // window does not overlap), the kept text is the gap slices
    // re-joined, and removed mass is the interval lengths summed.
    // The per-token array_contains(__cov) formulation this replaced
    // was O(tokens × covered) — quadratic on the adversarial megadoc
    // that is thousands of copies of one sentence (covered ≈ n), which
    // here merges to ONE interval (AdversarialShapeSpec pins it).
    val T1 = T - 1
    tokd.join(coveredStarts, Seq("doc_id"), "left")
      .withColumn("__st", coalesce(col("__starts"), expr("array()").cast("array<bigint>")))
      .withColumn("__prevs", expr(
        "concat(array(CAST(NULL AS BIGINT)), slice(__st, 1, greatest(size(__st) - 1, 0)))"))
      .withColumn("__nexts", expr(
        "concat(slice(__st, 2, greatest(size(__st) - 1, 0)), array(CAST(NULL AS BIGINT)))"))
      .withColumn("__los", expr(
        s"filter(zip_with(__st, __prevs, (s, p) -> " +
          s"CASE WHEN p IS NULL OR s > p + $T1 THEN s END), x -> x IS NOT NULL)"))
      .withColumn("__his", expr(
        s"filter(zip_with(__st, __nexts, (s, nx) -> " +
          s"CASE WHEN nx IS NULL OR nx > s + $T1 THEN s + $T1 END), x -> x IS NOT NULL)"))
      .withColumn("__gaplos", expr("concat(array(CAST(1 AS BIGINT)), transform(__his, h -> h + 1))"))
      .withColumn("__gaphis", expr("concat(transform(__los, l -> l - 1), array(n))"))
      .select(col("doc_id"),
        concat_ws(" ", expr(
          "flatten(zip_with(__gaplos, __gaphis, (a, b) -> " +
            "slice(toks, CAST(a AS INT), CAST(greatest(b - a + 1, CAST(0 AS BIGINT)) AS INT))))"))
          .as("text_dedup"),
        col("n").as("n_tokens"),
        expr("aggregate(zip_with(__los, __his, (l, h) -> h - l + 1), " +
          "CAST(0 AS BIGINT), (acc, x) -> acc + x)").as("n_removed"))
  }

  /** d18: gate binding of [[substringDedup]] at the 8-token threshold
    * (the sf0.01 corpus carries ~1.1k genuinely duplicated 8-token
    * windows, so the gate exercises real span removal, not a no-op).
    * Fully SQL-oracled: tokenization, the md5 gram key, keep-first
    * by (doc_id, pos), covered-position expansion, and the ordered
    * re-join restate exactly in DuckDB — surviving TEXT is pinned
    * byte-for-byte cross-engine.
    */
  def d18SubstringDedup(s: SparkSession, dir: String): DataFrame =
    substringDedup(Tables.documents(s, dir)).orderBy("doc_id")

  /** Near-duplicate corpus EMITTER — the NearDup half of Lee et al.
    * 2022 (arXiv:2107.06499) that [[substringDedup]] completed for
    * exact substrings: where the pair generators (d02/d03/d04/d05)
    * FIND near-duplicates and [[dupClusters]] RESOLVES them into
    * components, this composes both and EMITS the deduplicated corpus
    * — one deterministic canonical survivor per duplicate cluster,
    * every other cluster member dropped, untouched docs passed
    * through. This is the end-to-end operation a production
    * training-data pipeline actually runs; everything upstream of it
    * was the machinery.
    *
    * Survivor rule: the cluster member with the greatest `prefer`
    * value (e.g. a quality score, or text length to keep the fullest
    * variant), ties broken by SMALLEST doc id; with no preference the
    * survivor is the smallest id in the cluster — which is exactly
    * the cluster label [[dupClusters]] assigns, so the rule is
    * deterministic and repartition-proof in both modes.
    *
    * Output: one row per surviving doc — (doc_id, text, cluster_id,
    * cluster_size), cluster_id/size = (own id, 1) for docs in no
    * cluster, so `sum(cluster_size) == |input corpus|` always holds
    * (the conservation invariant the spec pins).
    *
    * Scale shape: the cluster frame is bounded by the docs named in
    * `pairs` (at 100 TB: the near-dup fraction, orders of magnitude
    * smaller than the corpus), so survivor election runs entirely on
    * the SMALL side — one inner join to fetch preferences, ONE
    * mergeable max-struct agg (the d18 keep-first discipline: the
    * hottest cluster folds map-side). The full corpus is touched by
    * exactly two doc-id joins against that small side (drop-removed
    * anti-join + survivor-metadata left join), both
    * broadcast-eligible; the corpus itself never shuffles and never
    * pairs doc × doc.
    *
    * Reference analog: none — the extractor's fuzzy dedup
    * (datapackage.py:524-533) drops whole duplicate ROWS by exact
    * key; near-dup graph dedup is beyond-reference
    * training-data-pipeline surface.
    */
  def nearDupCorpus(docs: DataFrame, pairs: DataFrame,
      idCol: String = "doc_id", textCol: String = "text",
      prefer: Option[Column] = None,
      aCol: String = "d1", bCol: String = "d2"): DataFrame = {
    val base = docs.select(Cols.q(idCol).cast("long").as("doc_id"),
      Cols.q(textCol).as("text"),
      prefer.getOrElse(lit(0.0)).cast("double").as("__pref"))
    val clusters = dupClusters(pairs, aCol, bCol)
    // survivor election on the SMALL side only: docs named in pairs
    val clustered = clusters
      .join(base.select(col("doc_id"), col("__pref")), Seq("doc_id"))
    val surv = clustered.groupBy("cluster_id")
      .agg(max(struct(col("__pref").as("p"), (-col("doc_id")).as("negid"))).as("__w"),
        count(lit(1)).as("cluster_size"))
      .select(col("cluster_id"), (-col("__w.negid")).as("doc_id"),
        col("cluster_size"))
    val removed = clusters.join(
        surv.select(col("cluster_id"), col("doc_id").as("__surv")), Seq("cluster_id"))
      .filter(col("doc_id") =!= col("__surv"))
      .select("doc_id")
    base.join(removed, Seq("doc_id"), "left_anti")
      .join(surv, Seq("doc_id"), "left")
      .select(col("doc_id"), col("text"),
        coalesce(col("cluster_id"), col("doc_id")).as("cluster_id"),
        coalesce(col("cluster_size"), lit(1L)).as("cluster_size"))
  }

  /** d19: gate binding of [[nearDupCorpus]] over the session-cached
    * exact-Jaccard top pairs (the SAME pair set d07 clusters, so the
    * three gates d02/d07/d19 share one pair computation), electing the
    * LONGEST text per cluster (ties to the smallest id) — the
    * keep-the-fullest-variant rule production corpus dedup uses.
    * Fully SQL-oracled: the d07 recursive-closure twin plus a
    * rank-window survivor and the pass-through left joins restate
    * exactly in DuckDB; the surviving corpus is pinned row-for-row.
    */
  def d19NearDupCorpus(s: SparkSession, dir: String): DataFrame =
    nearDupCorpus(Tables.documents(s, dir), d02NgramJaccard(s, dir),
      prefer = Some(length(col("text"))))
      .orderBy("doc_id")

  /** d17: gate binding of [[ngramNovelty]] — the q19 deterministic
    * val/test docs scored against the train split (the
    * "is the held-out set actually held out, and is new data actually
    * new" composition a real pipeline runs). Fully SQL-oracled: the
    * md5 split, the shingle CTE, and the anti-count restate exactly.
    */
  def d17NgramNovelty(s: SparkSession, dir: String): DataFrame = {
    val docs = graft.operators.Relational.deterministicSplit(
      Tables.documents(s, dir), "doc_id")
    ngramNovelty(
      docs.filter(col("split") =!= "train"),
      docs.filter(col("split") === "train"))
      .orderBy("doc_id")
  }
}
