package graft

import graft.operators.Dedup
import org.apache.spark.sql.functions._

/** Dedup-family specs: LSH candidate recall vs the exact shingle-join
  * baseline, SimHash determinism, and the scale guards the operators
  * claim (DF cap, candidate-driven verification).
  */
class DedupSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("d03 MinHash-LSH finds the exact top near-duplicate pairs (recall)") {
    val exact = Dedup.d02NgramJaccard(spark, sf)
      .filter(col("jaccard") >= 0.8)
      .select("d1", "d2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assume(exact.nonEmpty, "corpus has near-dup pairs at this sf")
    val lsh = Dedup.d03MinhashLsh(spark, sf)
      .select("d1", "d2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = exact.count(lsh.contains).toDouble / exact.size
    assert(recall >= 0.9, s"recall $recall over ${exact.size} pairs")
  }

  test("d03 verified jaccard values match d02's exact values") {
    val exact = Dedup.d02NgramJaccard(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val verified = Dedup.d03MinhashLsh(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
    assume(verified.nonEmpty)
    verified.foreach { case (pair, j) =>
      exact.get(pair).foreach(ej => assert(ej === j, s"pair $pair"))
    }
  }

  test("containmentPairs catches a short doc embedded in a long one where Jaccard fails") {
    import spark.implicits._
    // doc 1 appears VERBATIM inside doc 2 (plus 3x unrelated filler),
    // docs 3/4 are moderately similar to each other, 5 is background
    val small = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val filler = (1 to 30).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      (1L, small),
      (2L, s"$filler $small " + (31 to 60).map(i => s"w$i").mkString(" ")),
      (3L, "one two three four five six seven eight nine ten"),
      (4L, "one two three four five six seven eight nine eleven"),
      (5L, "completely different background content here now")
    ).toDF("id", "body")
    val cont = Dedup.containmentPairs(docs, "id", "body")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(5)).toMap
    // every shingle of doc 1 appears in doc 2 -> containment exactly 1.0
    assert(cont((1L, 2L)) === 1.0)
    // symmetric Jaccard on the same pair is diluted far below the
    // near-dup regime: that is the detection gap this operator closes
    val jac = Dedup.ngramJaccardPairs(docs, "id", "body")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(jac((1L, 2L)) < 0.2)
    // and containment ranks the embedded pair FIRST (ties impossible here)
    val top = Dedup.containmentPairs(docs, "id", "body").collect().head
    assert((top.getLong(0), top.getLong(1)) === ((1L, 2L)))
  }

  test("d04 SimHash is deterministic and near-dups have small hamming") {
    val a = Dedup.d04Simhash(spark, sf).collect().map(_.toSeq).toSeq
    val b = Dedup.d04Simhash(spark, sf).collect().map(_.toSeq).toSeq
    assert(a === b)
    a.foreach(r => assert(r(2).asInstanceOf[Number].longValue <= 3L))
  }

  test("native graft_simhash equals the explode + 64-agg formulation") {
    val docs = graft.Tables.documents(spark, sf).filter(col("text").isNotNull)
    val native = docs
      .select(col("doc_id"), graft.functions.SimHash.simhash(spark, col("text")).as("simhash"))
    // the original aggregate formulation, kept as the spec's ground truth
    val toks = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .withColumn("h", xxhash64(col("tok")))
    val bitSums = (0 until 64).map(j =>
      sum(when(shiftright(col("h"), j).bitwiseAND(1) === 1, 1).otherwise(-1)).as(s"b$j"))
    val agg = toks.groupBy("doc_id").agg(bitSums.head, bitSums.tail: _*)
      .withColumn("simhash",
        (0 until 64).map(j => when(col(s"b$j") > 0, lit(1L << j)).otherwise(0L)).reduce(_ + _))
      .select(col("doc_id"), col("simhash"))
    val mismatches = native.as("n").join(agg.as("a"), "doc_id")
      .filter(col("n.simhash") =!= col("a.simhash")).count()
    assert(mismatches === 0L)
    assert(native.count() === docs.count())
  }

  test("dupClusters matches a driver union-find on random pair graphs") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 5) {
      val n = 60
      val pairs = Seq.fill(40)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
      val got = Dedup.dupClusters(pairs.toDF("d1", "d2"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      // reference: union-find with min-id representative
      val parent = scala.collection.mutable.Map.empty[Long, Long]
      def find(x: Long): Long = {
        val p = parent.getOrElse(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      def union(a: Long, b: Long): Unit = {
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
      }
      pairs.foreach { case (a, b) => union(a, b) }
      val expected = pairs.flatMap(p => Seq(p._1, p._2)).distinct
        .map(x => x -> find(x)).toMap
      assert(got === expected, s"pairs=$pairs")
    }
  }

  test("dupClusters handles an empty pair set and a path longer than the round cap") {
    import spark.implicits._
    val empty = Dedup.dupClusters(Seq.empty[(Long, Long)].toDF("d1", "d2"))
    assert(empty.count() === 0L)
    // a 60-node path has diameter 59 > maxIterations: only the
    // pointer-doubling shortcut converges it inside the cap
    val chain = (0L until 59L).map(i => (i, i + 1))
    val got = Dedup.dupClusters(chain.toDF("d1", "d2"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === (0L to 59L).map(_ -> 0L).toMap)
  }

  test("dupClusters releases superseded checkpoint storage (flat footprint)") {
    import spark.implicits._
    val before = spark.sparkContext.getPersistentRDDs.size
    // a 59-diameter path drives ~6 pointer-doubling rounds; each round
    // checkpoints two new generations, so an unreleased loop would leave
    // ~13 persisted RDDs behind — only the FINAL labels generation (the
    // one backing the returned frame) may remain
    val chain = (0L until 59L).map(i => (i, i + 1))
    val out = Dedup.dupClusters(chain.toDF("d1", "d2"))
    val after = spark.sparkContext.getPersistentRDDs.size
    assert(after - before <= 1, s"persistent RDDs grew $before -> $after")
    assert(out.count() === 60L)
  }

  test("nearDupCorpus: planted clusters elect the preferred survivor; conservation and pass-through hold under repartitioning") {
    import spark.implicits._
    // three planted clusters + two untouched docs. Cluster A {1,2,3}:
    // doc 3 is longest -> survives despite the largest id. Cluster B
    // {10,11}: tie on length -> smallest id 10 survives. Cluster C
    // {20,21,22} is a PATH (20-21, 21-22): transitive closure must
    // cluster all three even though 20 and 22 never pair directly;
    // doc 21 longest -> survives.
    val docs = Seq(
      (1L, "short a"), (2L, "short b"), (3L, "the much longer surviving variant"),
      (10L, "same len"), (11L, "also len"),
      (20L, "mid text here"), (21L, "the longest text of cluster c"), (22L, "tiny"),
      (30L, "untouched doc one"), (31L, "untouched doc two"))
      .toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L), (20L, 21L), (21L, 22L))
      .toDF("d1", "d2")
    def run(d: org.apache.spark.sql.DataFrame, p: org.apache.spark.sql.DataFrame) =
      Dedup.nearDupCorpus(d, p, prefer = Some(length(col("text"))))
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
        .sortBy(_._1)
    val out = run(docs, pairs)
    assert(out.map(_._1).toSeq === Seq(3L, 10L, 21L, 30L, 31L))
    // survivors carry their cluster's min-id label and full size
    val meta = out.map(r => r._1 -> ((r._3, r._4))).toMap
    assert(meta(3L) === ((1L, 3L)))
    assert(meta(10L) === ((10L, 2L)))
    assert(meta(21L) === ((20L, 3L)))
    // untouched docs pass through as their own singleton cluster
    assert(meta(30L) === ((30L, 1L)))
    assert(meta(31L) === ((31L, 1L)))
    // conservation: every input doc is accounted for exactly once
    assert(out.map(_._4).sum === 10L)
    // the survivor choice is a global rule, not a partition accident
    assert(run(docs.repartition(7), pairs.repartition(3)).toSeq === out.toSeq)
    // no preference -> the min-id member survives (== cluster label)
    val minId = Dedup.nearDupCorpus(docs, pairs)
      .collect().map(r => (r.getLong(0), r.getLong(2))).sortBy(_._1)
    assert(minId.map(_._1).toSeq === Seq(1L, 10L, 20L, 30L, 31L))
    assert(minId.forall { case (id, cl) => id == cl })
  }

  test("nearDupCorpus property: randomized graphs with COLLIDING preference values pin the smallest-id tiebreak against a driver model, under repartitioning") {
    import spark.implicits._
    // the max(struct(pref, -doc_id)) election's tie path exercised
    // beyond planted cases: preferences drawn from a 3-value set so
    // most clusters tie, random edges so cluster shapes vary; expected
    // survivors computed by an independent driver-side union-find
    val rnd = new scala.util.Random(20260816L)
    for (trial <- 1 to 3) {
      val n = 50 + trial * 10
      val docRows = (1 to n).map { i =>
        (i.toLong, s"text of doc $i", (rnd.nextInt(3) + 1).toDouble)
      }
      val pairRows = (2 to n).flatMap { i =>
        if (rnd.nextDouble() < 0.4) Some((rnd.nextInt(i - 1) + 1L, i.toLong))
        else None
      }
      // driver model: union-find closure, then max-pref / min-id election
      val parent = scala.collection.mutable.Map((1 to n).map(i => i.toLong -> i.toLong): _*)
      def find(x: Long): Long =
        if (parent(x) == x) x else { val r = find(parent(x)); parent(x) = r; r }
      pairRows.foreach { case (a, b) => parent(find(a)) = find(b) }
      val pref = docRows.map(d => d._1 -> d._3).toMap
      val comps = (1 to n).map(i => i.toLong).groupBy(find)
      val clusteredIds = pairRows.flatMap(p => Seq(p._1, p._2)).toSet
      val expected = comps.values.flatMap { members0 =>
        // only docs named in pairs cluster; union-find roots of
        // singletons stay singleton pass-throughs
        val members = members0.filter(clusteredIds.contains)
        if (members.isEmpty) members0.map(id => (id, id, 1L))
        else {
          val surv = members.maxBy(m => (pref(m), -m))
          val passthrough = members0.filterNot(members.contains)
            .map(id => (id, id, 1L))
          passthrough :+ ((surv, members.min, members.size.toLong))
        }
      }.toSeq.sortBy(_._1)
      val out = Dedup.nearDupCorpus(
          docRows.toDF("doc_id", "text", "pref").repartition(trial * 3),
          pairRows.toDF("d1", "d2").repartition(trial + 1),
          prefer = Some(col("pref")))
        .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
        .sortBy(_._1)
      assert(out.toSeq === expected,
        s"trial $trial: survivor election diverged from the driver model")
    }
  }

  test("nearDupCorpus composes with the MinHash-LSH generator: planted paraphrase groups collapse through d03 pairs") {
    import spark.implicits._
    // the generator-agnostic claim, end-to-end on a REAL pair frame
    // (d03's (d1, d2, jaccard) schema, not a synthetic two-column
    // edge list): three verbatim-plus-prefix variants of one passage
    // share nearly all shingles, so LSH banding must pair them; the
    // emitter then keeps exactly one
    val passage = (1 to 40).map(i => s"tok$i").mkString(" ")
    val docs = Seq(
      (1L, s"$passage"),
      (2L, s"$passage extra tail"),
      (3L, s"prefix words $passage"),
      (7L, (101 to 140).map(i => s"unrelated$i").mkString(" ")))
      .toDF("doc_id", "text")
    val pairs = Dedup.minhashLshPairs(docs, topK = 100)
    assert(pairs.count() >= 2L, "LSH must pair the planted variants")
    val out = Dedup.nearDupCorpus(docs, pairs,
      prefer = Some(length(col("text"))))
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3))).sortBy(_._1)
    // one survivor for the planted group (the longest variant, doc 3:
    // 40 + 2 prefix tokens beats 40 + 2 tail on char length parity —
    // compute expected from the data itself to avoid off-by-one)
    val lens = Map(1L -> passage.length,
      2L -> s"$passage extra tail".length, 3L -> s"prefix words $passage".length)
    val expectedSurvivor = lens.toSeq.sortBy { case (id, n) => (-n, id) }.head._1
    val survivors = out.map(_._1).toSet
    assert(survivors.contains(7L) && survivors.contains(expectedSurvivor))
    assert(out.length === 2, s"planted group must collapse to one: ${out.mkString(",")}")
    assert(out.find(_._1 == expectedSurvivor).get._2 === 1L) // min-id cluster label
    assert(out.find(_._1 == expectedSurvivor).get._3 === 3L)
  }

  test("d19 gate emits the deduplicated corpus: survivors + pass-through, conservation vs the input count") {
    val docs = Tables.documents(spark, sf)
    val out = Dedup.d19NearDupCorpus(spark, sf)
    val nDocs = docs.count()
    val stats = out.agg(
      count(lit(1)), sum(col("cluster_size")),
      sum(when(col("cluster_size") > 1, 1L).otherwise(0L))).head
    // real clusters exist in the gate corpus (d07 finds 160 clustered
    // docs at sf0.001+) and every input doc lands in exactly one
    // survivor's cluster_size
    assert(stats.getLong(2) > 0L, "gate corpus must exercise real cluster collapse")
    assert(stats.getLong(1) === nDocs, "sum(cluster_size) must equal the input corpus")
    assert(stats.getLong(0) < nDocs, "some duplicates must actually drop")
    // emitted text is the ORIGINAL doc text, untouched
    val joined = out.join(docs.withColumnRenamed("text", "orig"), Seq("doc_id"))
    assert(joined.filter(col("text") =!= col("orig")).count() === 0L)
  }

  test("trainIvfCodebook releases superseded checkpoint storage (flat footprint)") {
    import spark.implicits._
    val rnd = new scala.util.Random(3)
    val emb = Seq.tabulate(200)(i => (i.toLong, Array.fill(8)(rnd.nextGaussian().toFloat)))
      .toDF("vec_id", "embedding")
    val before = spark.sparkContext.getPersistentRDDs.size
    val codebook = graft.operators.Similarity.trainIvfCodebook(emb, iterations = 3)
    val after = spark.sparkContext.getPersistentRDDs.size
    // 3 Lloyd rounds x 2 checkpoints each; only the final seeds
    // generation may survive the loop
    assert(after - before <= 1, s"persistent RDDs grew $before -> $after")
    assert(codebook.count() === 32L)
  }

  private def driverCos(a: Array[Float], b: Array[Float]): Double = {
    var d = 0.0; var na = 0.0; var nb = 0.0
    for (i <- a.indices) { d += a(i).toDouble * b(i); na += a(i).toDouble * a(i); nb += b(i).toDouble * b(i) }
    d / math.sqrt(na * nb)
  }

  test("d08 gate emits exact-rescored valid candidates on the standard corpus") {
    // exact model: all-pairs cosine on the driver (500 vectors at this
    // sf). The synthetic corpus is near-orthogonal (top cosines ~0.4-
    // 0.5) — far below the near-dup angles the fine 8x8 blocking is
    // tuned for, so candidate recall here is incidental (logged, not
    // bounded); the operator's target regime is proven at ~1.0 recall
    // by the planted-pair test below.
    val rows = graft.Tables.embeddings(spark, sf)
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
    val exact = (for {
      i <- rows.indices; j <- (i + 1) until rows.length
    } yield {
      val (a, b) = (rows(i)._1, rows(j)._1)
      (math.min(a, b), math.max(a, b)) -> driverCos(rows(i)._2, rows(j)._2)
    }).toMap
    val got = graft.operators.Dedup.d08EmbeddingLsh(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
    assert(got.nonEmpty)
    val topExact = exact.toSeq.filter(_._2 >= 0.3)
      .sortBy { case ((a, b), c) => (-c, a, b) }.take(100)
    val recall = topExact.count { case (p, _) => got.exists(_._1 == p) }.toDouble /
      math.max(topExact.size, 1)
    info(s"d08 incidental wide-angle recall over ${topExact.size} exact pairs: $recall")
    got.foreach { case ((a, b), c) =>
      assert(a < b, s"pair order ($a,$b)")
      assert(c >= 0.3 - 1e-9, s"below threshold: ($a,$b) $c")
      // returned cosines are exact rescores (round-6 match vs the model)
      exact.get((a, b)).foreach(ec => assert(math.abs(ec - c) < 5e-7, s"pair ($a,$b): $ec vs $c"))
    }
  }

  test("d08 finds every planted near-identical pair (the near-dup regime)") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val dim = 24
    // 400 random noise vectors + 30 planted pairs at cosine ~0.999
    val noise = Seq.tabulate(400)(i => (i.toLong, Array.fill(dim)(rnd.nextGaussian().toFloat)))
    val planted = (0 until 30).flatMap { p =>
      val base = Array.fill(dim)(rnd.nextGaussian().toFloat)
      val dup = base.map(x => x + 0.01f * rnd.nextGaussian().toFloat)
      Seq((1000L + 2 * p, base), (1000L + 2 * p + 1, dup))
    }
    val emb = (noise ++ planted).toDF("vec_id", "embedding")
    val got = graft.operators.Dedup.embeddingLshPairs(emb, minCosine = 0.9, topK = 1000)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = (0 until 30).map(p => (1000L + 2 * p, 1000L + 2 * p + 1)).toSet
    // every planted pair must surface (at cosine ~1 a table misses with
    // p ~ (1 - ~1)^4 ~ 0, so 8 tables essentially cannot all miss);
    // noise pairs are excluded by the 0.9 exact-rescore threshold
    assert(expected.subsetOf(got), s"missing ${expected -- got}")
    assert(got.forall(p => expected.contains(p) ||
      driverCosOf(emb, p._1, p._2) >= 0.9 - 1e-6))
  }

  private def driverCosOf(emb: org.apache.spark.sql.DataFrame, a: Long, b: Long): Double = {
    val m = emb.filter(col("vec_id").isin(a, b)).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    driverCos(m(a), m(b))
  }

  test("winnowDups honors the winnowing guarantee on planted shared runs") {
    import spark.implicits._
    val run = "alpha bravo charlie delta echo foxtrot golf" // 7 tokens = w+window-1
    val docs = Seq(
      (1L, s"unique lead text one two $run"),
      (2L, s"$run completely different tail words here"),
      (3L, "nothing shared with anything else at all whatsoever today"),
      (4L, "another fully distinct document about other things entirely")
    ).toDF("id", "body")
    val pairs = Dedup.winnowDups(docs, "id", "body")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // the guarantee: a shared token run of >= w + window - 1 tokens
    // MUST yield at least one shared selected fingerprint
    assert(pairs.exists { case (d1, d2, n) => d1 == 1L && d2 == 2L && n >= 1L },
      s"planted pair missing from ${pairs.toSeq}")
    // unrelated docs never pair
    assert(!pairs.exists { case (d1, d2, _) => d1 == 3L || d2 == 3L || d1 == 4L || d2 == 4L })
  }

  test("winnowDups is partition-independent on the standard corpus") {
    val docs = Tables.documents(spark, sf)
    val a = Dedup.winnowDups(docs).collect().map(_.toString).toSeq
    val b = Dedup.winnowDups(docs.repartition(13, org.apache.spark.sql.functions.col("source")))
      .collect().map(_.toString).toSeq
    assert(a === b)
    assert(a.nonEmpty)
  }

  test("d01 exact dedup groups by content hash with deterministic representative") {
    val out = Dedup.d01ExactHash(spark, sf)
    val n = out.count()
    val docs = graft.Tables.documents(spark, sf).count()
    assert(n <= docs) // one row per distinct content
    assert(out.agg(sum("n_copies")).collect().head.getLong(0) === docs)
  }

  test("bloom contamination never under-reports exact d06 and stays in the FP budget") {
    val docs = Tables.documents(spark, sf)
    val corpus = docs.filter(pmod(col("doc_id"), lit(10L)) =!= 7L)
    val bench = docs.filter(pmod(col("doc_id"), lit(10L)) === 7L)
    def toMap(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val exact = toMap(Dedup.contaminationCheck(corpus, bench, topK = 100000))
    val bloom = toMap(Dedup.contaminationCheckBloom(corpus, bench, topK = 100000,
      expectedItems = 100000L, fpp = 0.01))
    assert(exact.keySet === bloom.keySet)
    exact.foreach { case (doc, (nSh, nExact)) =>
      val (nShB, nBloom) = bloom(doc)
      assert(nShB === nSh, s"doc $doc shingle count")
      // one-sided error: the sketch can only over-report
      assert(nBloom >= nExact, s"doc $doc under-reported: $nBloom < $nExact")
      assert(nBloom <= nSh, s"doc $doc over total")
    }
    val totalShingles = exact.values.map(_._1).sum
    val overcount = bloom.values.map(_._2).sum - exact.values.map(_._2).sum
    // expectation is fpp (1%) of clean probes; 5x slack keeps the
    // deterministic small-sample draw comfortably inside the bound
    assert(overcount <= 0.05 * totalShingles,
      s"FP overcount $overcount over $totalShingles probes")
    info(s"bloom overcount: $overcount of $totalShingles probes")
  }

  test("embeddingLshPairs auto-geometry survives the fixed-plane occupancy cliff") {
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    val dim = 16
    val noise = Seq.tabulate(40000)(i =>
      (i.toLong, Array.fill(dim)(rnd.nextGaussian().toFloat)))
    val twins = (0 until 50).flatMap { p =>
      val base = Array.fill(dim)(rnd.nextGaussian().toFloat)
      val dup = base.map(x => x + 0.005f * rnd.nextGaussian().toFloat)
      Seq((900000L + 2 * p, base), (900001L + 2 * p, dup))
    }
    val emb = (noise ++ twins).toDF("vec_id", "embedding")
    def found(df: org.apache.spark.sql.DataFrame): Int =
      df.filter(col("v1") >= 900000L && col("v2") === col("v1") + 1L &&
        pmod(col("v1"), lit(2L)) === 0L).count().toInt
    // fixed fine geometry: mean occupancy 40102/256 ≈ 157 over the 100
    // cap, so a twin pair survives only where a shared bucket lands in
    // the occupancy distribution's lower tail (orthant sizes spread
    // wide under random hyperplanes) — a third of the planted
    // near-dups silently vanish here (35/50 at this seed), and the
    // loss deepens toward total as the corpus/cap ratio grows. This is
    // the degradation the corpus-sized default exists to prevent.
    val fixedFound = found(Dedup.embeddingLshPairs(emb, minCosine = 0.99,
      maxBucketSize = 100, topK = 100000, planesPerTable = 8))
    assert(fixedFound <= 45, s"fixed geometry should lose twins, found $fixedFound of 50")
    // corpus-sized planes (12 here): occupancy ~10, the cap guards
    // genuine skew again, and every planted twin survives
    val autoFound = found(Dedup.embeddingLshPairs(emb, minCosine = 0.99,
      maxBucketSize = 100, topK = 100000))
    assert(autoFound === 50, s"auto geometry found $autoFound of 50")
  }

  test("map-only contamination flags carry the exact per-doc counts of the bloom rollup") {
    val docs = Tables.documents(spark, sf)
    val corpus = docs.filter(pmod(col("doc_id"), lit(10L)) =!= 7L)
    val bench = docs.filter(pmod(col("doc_id"), lit(10L)) === 7L)
    val rollup = Dedup.contaminationCheckBloom(corpus, bench, topK = 100000,
      expectedItems = 100000L, fpp = 0.01)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    val flags = Dedup.contaminationFlagsAgainstBloom(corpus,
      Dedup.benchmarkBloom(bench, expectedItems = 100000L, fpp = 0.01))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    // same shingle store, same sketch geometry -> identical numbers,
    // with the rollup's two shuffles traded for none
    assert(flags === rollup)
  }

  test("bloom contamination flags planted fully-contaminated docs exactly") {
    import spark.implicits._
    val bench = Seq(
      (100L, "alpha beta gamma delta epsilon zeta eta theta"),
      (101L, "one two three four five six seven eight nine"))
      .toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"), // verbatim leak
      (2L, "one two three four five six seven"),             // every 3-gram in bench
      (3L, "totally disjoint words nowhere in the benchmark suite"))
      .toDF("doc_id", "text")
    val got = Dedup.contaminationCheckBloom(corpus, bench,
      expectedItems = 1000L, fpp = 0.001)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(got(1L) === 1.0)
    assert(got(2L) === 1.0)
    // the disjoint doc has 8 probes at fpp 1e-3 — a false hit would be
    // a deterministic-seed miracle; pin zero to catch a sketch misuse
    assert(got(3L) === 0.0)
  }

  // ---------------------------------------------------------------
  // d11 semantic dedup (SemDeDup)
  // ---------------------------------------------------------------

  test("d11 collapses every planted semantic group to one kept representative") {
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    val dim = 24
    // 200 near-orthogonal noise singletons + 25 planted groups of 4
    // near-identical vectors (cosine ~0.999 inside a group)
    val noise = Seq.tabulate(200)(i => (i.toLong, Array.fill(dim)(rnd.nextGaussian().toFloat)))
    val groups = (0 until 25).flatMap { g =>
      val base = Array.fill(dim)(rnd.nextGaussian().toFloat)
      (0 until 4).map(j =>
        (1000L + 4 * g + j, base.map(x => x + 0.01f * rnd.nextGaussian().toFloat)))
    }
    val emb = (noise ++ groups).toDF("vec_id", "embedding")
    val got = Dedup.semanticDedup(emb, minCosine = 0.95, numCells = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    // complete: one verdict per vector
    assert(got.map(_._1).toSet === (noise ++ groups).map(_._1).toSet)
    val byId = got.map(t => t._1 -> t).toMap
    // every planted group collapses to ITS min id: multi-assignment
    // (2 nearest trained cells) makes an intra-group split across a
    // cell boundary effectively impossible at cosine ~1
    for (g <- 0 until 25; j <- 0 until 4) {
      val id = 1000L + 4 * g + j
      assert(byId(id)._2 === 1000L + 4 * g, s"vector $id group")
      assert(byId(id)._3 === (j == 0), s"vector $id kept flag")
    }
    // noise vectors are their own kept singletons (threshold excludes
    // near-orthogonal pairs)
    for (i <- 0 until 200)
      assert(byId(i.toLong) === ((i.toLong, i.toLong, true)), s"noise $i")
  }

  test("d11 pairs are sound and the resolution honors its invariants on the standard corpus") {
    val emb = Tables.embeddings(spark, sf).select("vec_id", "embedding")
    val thr = 0.3
    // soundness: every candidate pair the trained-cell blocking
    // surfaces genuinely clears the exact-cosine threshold (the
    // rescore is exact, so blocking can only LOSE cross-cell pairs —
    // SemDeDup's contract is within-cluster collapse, NOT the global
    // transitive closure a weak threshold chains across clusters)
    val rows = emb.collect().map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    val pairs = Dedup.semanticDedupPairs(emb, minCosine = thr, numCells = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty, "gate threshold must be non-vacuous on this corpus")
    pairs.foreach { case (a, b) =>
      assert(driverCos(rows(a), rows(b)) >= thr - 1e-6, s"unsound pair ($a,$b)")
    }
    // resolution invariants: complete, kept == own-group-min, min
    // representative deterministic, groups closed over the id set
    val out = Dedup.semanticDedup(emb, minCosine = thr, numCells = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    assert(out.map(_._1).toSet === rows.keySet)
    out.foreach { case (id, g, kept) =>
      assert(g <= id, s"group label must be the min id, got $g for $id")
      assert(kept === (g == id), s"kept flag inconsistent for $id")
      assert(rows.contains(g), s"group $g is not a corpus id")
    }
    // every group's representative is kept exactly once
    val byGroup = out.groupBy(_._2)
    byGroup.foreach { case (g, members) =>
      assert(members.count(_._3) === 1, s"group $g kept count")
      assert(members.filter(_._3).head._1 === g)
    }
    // deterministic end to end (trained centroids, capped cells, min
    // labels — no randomness anywhere)
    val again = Dedup.semanticDedup(emb, minCosine = thr, numCells = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    assert(out.toSeq === again.toSeq)
  }

  test("d11 adversarial mass-identical corpus stays capped, never quadratic") {
    import spark.implicits._
    val dim = 8
    val base = Array.fill(dim)(0.5f)
    // 5000 copies of one vector: one semantic cluster far beyond the
    // cell cap. The house skew guard drops over-cap cells, so the
    // operator must return quickly with ZERO pairs (documented: raise
    // numCells or run d08 first), not explode to 12.5M pairs
    val emb = Seq.tabulate(5000)(i => (i.toLong, base)).toDF("vec_id", "embedding")
    val pairs = Dedup.semanticDedupPairs(emb, minCosine = 0.95, numCells = 4,
      maxCellSize = 1000)
    assert(pairs.count() === 0L)
    val out = Dedup.semanticDedup(emb, minCosine = 0.95, numCells = 4, maxCellSize = 1000)
    assert(out.count() === 5000L)
  }

  // ---------------------------------------------------------------
  // d12 incremental dedup against a persisted MinHash index
  // ---------------------------------------------------------------

  test("d12 index catches every planted near-dup in a new batch, nothing else") {
    import spark.implicits._
    // history: 50 docs with disjoint vocabularies (30 tokens each)
    val history = Seq.tabulate(50) { i =>
      (i.toLong, (0 until 30).map(j => s"h${i}w$j").mkString(" "))
    }.toDF("doc_id", "text")
    // batch: 10 mutated copies of history docs (last 2 tokens replaced,
    // shingle-Jaccard ~0.81) + 10 fresh docs sharing no vocabulary
    val planted = (0 until 10).map { i =>
      val toks = (0 until 28).map(j => s"h${i}w$j") ++ Seq(s"x${i}a", s"x${i}b")
      (1000L + i, toks.mkString(" "))
    }
    val fresh = (0 until 10).map { i =>
      (2000L + i, (0 until 30).map(j => s"n${i}w$j").mkString(" "))
    }
    val batch = (planted ++ fresh).toDF("doc_id", "text")
    val (sigs, bands) = Dedup.minhashIndex(history)
    // the persisted artifact is compact: one 64-component row per doc
    val sigRows = sigs.collect()
    assert(sigRows.length === 50)
    sigRows.foreach(r => assert(r.getSeq[Long](1).length === 64))
    val got = Dedup.incrementalNearDups(sigs, bands, batch, minEstJaccard = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // every planted pair surfaces, estimate near the true ~0.81
    for (i <- 0 until 10) {
      val est = got.get((1000L + i, i.toLong))
      assert(est.nonEmpty, s"planted pair $i missed")
      assert(math.abs(est.get - 0.81) <= 0.3, s"planted pair $i estimate ${est.get}")
    }
    // no spurious matches: fresh docs share no shingles with history
    assert(got.keySet.map(_._1).forall(_ < 2000L), s"spurious matches: ${got.keySet}")
  }

  test("d12 estimates track the exact shingle Jaccard on the real corpus") {
    val got = Dedup.d12IncrementalDedup(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assume(got.nonEmpty, "corpus has cross-split near-dups at this sf")
    // driver-side exact Jaccard with the operator's own tokenization:
    // split on single space, 3-token shingles, distinct
    val ids = got.flatMap(t => Seq(t._1, t._2)).toSet
    val texts = Tables.documents(spark, sf)
      .filter(col("doc_id").isin(ids.toSeq: _*)).filter(col("text").isNotNull)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    def shingleSet(t: String): Set[String] =
      t.split(" ").toSeq.sliding(3).filter(_.size == 3).map(_.mkString(" ")).toSet
    val errs = got.map { case (n, o, est) =>
      val (a, b) = (shingleSet(texts(n)), shingleSet(texts(o)))
      val exact = (a & b).size.toDouble / (a | b).size
      val err = math.abs(est - exact)
      // 64-component MinHash estimator: stderr <= 0.063, pin 4.75 sigma
      assert(err <= 0.3, s"pair ($n,$o) est $est vs exact $exact")
      err
    }
    assert(errs.sum / errs.length <= 0.1, s"mean abs error ${errs.sum / errs.length}")
  }

  test("native graft_minhash64 equals the explode + 64-min-agg formulation") {
    val sess = spark
    val docs = graft.Tables.documents(sess, sf).filter(col("text").isNotNull)
      .select(col("doc_id"), col("text"))
      .withColumn("tokens", split(col("text"), " "))
      .filter(size(col("tokens")) >= 3)
    def shingles = graft.functions.WordShingles.shingles(sess, col("tokens"), 3)
    val native = docs
      .select(col("doc_id"), graft.functions.MinHash64.sig(sess, shingles).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    // the original formulation, kept as the spec's ground truth
    val P31 = graft.functions.MinHash64.P31
    val exploded = docs
      .select(col("doc_id"), explode(array_distinct(shingles)).as("shingle"))
      .withColumn("x", pmod(xxhash64(col("shingle")), lit(P31)))
    val mins = graft.functions.MinHash64.coeffs.zipWithIndex.map { case ((a, b), i) =>
      min(pmod(lit(a) * col("x") + lit(b), lit(P31))).as("m" + i)
    }
    val agg = exploded.groupBy("doc_id").agg(mins.head, mins.tail: _*)
      .select(col("doc_id"), array((0 until 64).map(i => col("m" + i)): _*).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(native.keySet === agg.keySet)
    assert(native.keySet.nonEmpty)
    native.foreach { case (id, sig) => assert(sig === agg(id), s"doc $id") }
  }

  test("d12 is deterministic end to end") {
    val a = Dedup.d12IncrementalDedup(spark, sf).collect().map(_.toSeq).toSeq
    val b = Dedup.d12IncrementalDedup(spark, sf).collect().map(_.toSeq).toSeq
    assert(a.nonEmpty)
    assert(a === b)
  }

  test("d12 index survives a parquet round trip and compaction restores the global cap") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf).filter(col("text").isNotNull)
    val history = docs.filter(col("doc_id") % 5 =!= 0)
    val batch = docs.filter(col("doc_id") % 5 === 0)
    val (sigs, bands) = Dedup.minhashIndex(history)
    val live = Dedup.incrementalNearDups(sigs, bands, batch, minEstJaccard = 0.35)
      .collect().map(_.toSeq).toSeq
    assume(live.nonEmpty)
    // the index IS the persisted artifact: write both sides to parquet,
    // read back, probe — identical matches (signatures are plain
    // bigint arrays, no engine-session state)
    val dir = java.nio.file.Files.createTempDirectory("graft_d12_index").toString
    sigs.write.parquet(s"$dir/sigs")
    bands.write.parquet(s"$dir/bands")
    val fromDisk = Dedup.incrementalNearDups(
      spark.read.parquet(s"$dir/sigs"), spark.read.parquet(s"$dir/bands"),
      batch, minEstJaccard = 0.35).collect().map(_.toSeq).toSeq
    assert(fromDisk === live)
    // compaction: appending 6 mass-identical signed batches leaves each
    // build under ITS cap (800 < 1000) while the logical bucket holds
    // 4800 — a fresh-built index would have dropped it; indexFromSigs
    // over the signature union restores exactly that fresh build
    val mass = (0 until 6).map { b =>
      Dedup.minhashIndex((0L until 800L).map(i =>
        (100000L + 800L * b + i,
          "alpha beta gamma delta epsilon zeta eta theta iota kappa"))
        .toDF("doc_id", "text"))
    }
    val (mSigs, mBands) = mass.foldLeft((sigs, bands)) { case ((s0, b0), (ns, nb)) =>
      Dedup.indexAppend(s0, b0, ns, nb)
    }
    val probe = Seq((999999L,
      "alpha beta gamma delta epsilon zeta eta theta iota kappa"))
      .toDF("doc_id", "text")
    // pre-compaction the appended index still matches the mass (per-build
    // caps only) — 4800 hits through the band join
    assert(Dedup.incrementalNearDups(mSigs, mBands, probe).count() === 4800L)
    val compacted = Dedup.indexFromSigs(mSigs)
    assert(Dedup.incrementalNearDups(mSigs, compacted, probe).count() === 0L)
    // and compaction equals the fresh build over the same corpus
    val freshBands = Dedup.minhashIndex(
      history.select("doc_id", "text").unionByName(
        mass.indices.flatMap(b => (0L until 800L).map(i =>
          (100000L + 800L * b + i,
            "alpha beta gamma delta epsilon zeta eta theta iota kappa")))
          .toDF("doc_id", "text")))._2
    assert(compacted.collect().map(_.toSeq).toSet ===
      freshBands.collect().map(_.toSeq).toSet)
  }

  test("d14 lineDedup keeps each line's global first occurrence and rebuilds docs in order") {
    import spark.implicits._
    // BOILER repeats across three docs; each doc also has unique lines
    val lines = Seq(
      (1L, 0L, "unique one"), (1L, 1L, "BOILER"), (1L, 2L, "tail one"),
      (2L, 0L, "BOILER"), (2L, 1L, "unique two"),
      (3L, 0L, "unique three"), (3L, 1L, "BOILER"), (3L, 2L, "unique two"))
      .toDF("doc_id", "line_no", "line")
    val out = Dedup.lineDedup(lines).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4))))
      .toMap
    // doc 1 owns BOILER's first occurrence (doc order), keeps all 3
    assert(out(1L) === ((3L, 3L, 0L, "unique one BOILER tail one")))
    // doc 2 loses BOILER, keeps "unique two" (its first occurrence)
    assert(out(2L) === ((2L, 1L, 1L, "unique two")))
    // doc 3 loses BOILER and the repeated "unique two"
    assert(out(3L) === ((3L, 1L, 2L, "unique three")))
    // a doc whose EVERY line first-occurred elsewhere keeps nothing,
    // and kept_text is the empty string, never null
    val out4 = Dedup.lineDedup(lines.unionByName(
        Seq((4L, 0L, "BOILER"), (4L, 1L, "unique two")).toDF("doc_id", "line_no", "line")))
      .filter($"doc_id" === 4L).collect().head
    assert(out4.getLong(2) === 0L && out4.getString(4) === "")
    // partitioning cannot change the keep-first winner
    val re = Dedup.lineDedup(lines.repartition(7)).collect()
      .map(r => r.getLong(0) -> r.getString(4)).toMap
    assert(re === out.map { case (k, v) => k -> v._4 })
  }

  test("d14 keep-first is a mergeable min agg, never a line-partitioned window") {
    // the skew guard: a boilerplate line repeated millions of times
    // must spread over the agg's map-side combine, not pour into one
    // window task — pin the executed plan windowless
    val df = Dedup.d14LineDedup(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), plan.take(3000))
    assert(plan.contains("partial_min") || plan.contains("HashAggregate"), plan.take(2000))
  }

  test("d15 templateDedup collapses case / counter / whitespace variants, nothing else") {
    import spark.implicits._
    // four spellings of one template page plus two genuinely distinct
    // docs; only the variants may merge
    val docs = Seq(
      (10L, "Breaking News: 17 items found on page 3"),
      (11L, "breaking news: 42 items found on page 7"),
      (12L, "BREAKING  NEWS: 9 items\tfound on\npage 12"),
      (13L, " breaking news: 0 items found on page 0 "),
      (20L, "breaking views: 17 items found on page 3"), // one letter off
      (21L, "something else entirely")).toDF("doc_id", "text")
    val out = Dedup.templateDedup(docs).collect()
      .map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(out === Map(10L -> 4L, 20L -> 1L, 21L -> 1L))
    // content-determinism under repartitioning
    val re = Dedup.templateDedup(docs.repartition(5)).collect()
      .map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(re === out)
    // and the canon itself is what the scaladoc claims
    val canon = docs.select(Dedup.templateCanon($"text")).distinct().collect().map(_.getString(0))
    assert(canon.toSet === Set("breaking news: 0 items found on page 0",
      "breaking views: 0 items found on page 0", "something else entirely"))
  }

  test("canonicalizeUrl: each RFC step does exactly what it claims, nothing else") {
    import spark.implicits._
    val cases = Seq(
      // scheme+host lowercase; path case preserved
      "HTTP://WWW.Example.COM/Docs/A" -> "http://www.example.com/Docs/A",
      // default ports stripped per scheme; non-default kept
      "http://ex.com:80/a" -> "http://ex.com/a",
      "https://ex.com:443/a" -> "https://ex.com/a",
      "http://ex.com:8080/a" -> "http://ex.com:8080/a",
      // https keeps :80 (not its default)
      "https://ex.com:80/a" -> "https://ex.com:80/a",
      // fragment dropped, trailing slashes stripped (root → bare host)
      "http://ex.com/a/b/#sec" -> "http://ex.com/a/b",
      "http://ex.com/" -> "http://ex.com",
      // tracking params dropped, survivors sorted, empty query dropped
      "http://ex.com/p?utm_source=x&b=2&a=1&ref=tw" -> "http://ex.com/p?a=1&b=2",
      "http://ex.com/p?gclid=1&fbclid=2&utm_b=3" -> "http://ex.com/p",
      // param VALUES keep case, only whole tracking params go
      "http://ex.com/p?Q=Mixed&utm_x=1" -> "http://ex.com/p?Q=Mixed",
      // schemeless input: path/query steps still apply
      "ex.com/a/?utm_a=1&z=9" -> "ex.com/a?z=9")
    val got = cases.map(_._1).toDF("url")
      .select(Dedup.canonicalizeUrl($"url")).collect().map(_.getString(0))
    got.zip(cases).foreach { case (g, (in, want)) => assert(g === want, s"input $in") }
    // the drop-list is a POLICY: a corpus where ref= is semantic keeps
    // it by passing a list without "ref"; prefix vs exact matching —
    // exact "utm" must NOT drop utm_source, prefix "utm_" must
    val noRef = Seq("http://ex.com/p?ref=main&utm_source=x&refresh=1").toDF("url")
      .select(Dedup.canonicalizeUrl($"url",
        trackingParams = Seq("utm_", "gclid", "fbclid")))
      .head.getString(0)
    assert(noRef === "http://ex.com/p?ref=main&refresh=1")
    val exact = Seq("http://ex.com/p?utm=1&utm_source=x&a=2").toDF("url")
      .select(Dedup.canonicalizeUrl($"url", trackingParams = Seq("utm")))
      .head.getString(0)
    assert(exact === "http://ex.com/p?a=2&utm_source=x",
      "exact entry must drop only utm=, never the utm_ prefix family")
    // default list: ref= goes but refresh= stays (exact-name match)
    val refDefault = Seq("http://ex.com/p?ref=tw&refresh=1").toDF("url")
      .select(Dedup.canonicalizeUrl($"url")).head.getString(0)
    assert(refDefault === "http://ex.com/p?refresh=1")
  }

  test("substringDedup removes every duplicated run but its first occurrence, at span granularity") {
    import spark.implicits._
    // a 10-token run planted in three places: doc 1 (the original),
    // doc 2 (embedded mid-text), and AGAIN later in doc 1 itself
    val run = (1 to 10).map(i => s"r$i").mkString(" ")
    val docs = Seq(
      (1L, s"alpha beta $run gamma delta $run"),
      (2L, s"unique opening words here $run and a unique tail"),
      (3L, "totally unrelated text with no shared runs at all"),
      (4L, "short doc")).toDF("doc_id", "text")
    val out = Dedup.substringDedup(docs, minTokens = 8).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    // doc 1: first occurrence survives; the self-repeat is removed
    assert(out(1L) === ((s"alpha beta $run gamma delta", 24L, 10L)))
    // doc 2: the copied run vanishes, its own words survive
    assert(out(2L) === (("unique opening words here and a unique tail", 18L, 10L)))
    // doc 3/4: untouched (doc 4 is below the window size entirely)
    assert(out(3L) === (("totally unrelated text with no shared runs at all", 9L, 0L)))
    assert(out(4L) === (("short doc", 2L, 0L)))
  }

  test("substringDedup: runs longer than the window vanish completely; overlap unions; whitespace canonicalizes") {
    import spark.implicits._
    // 12-token shared run with an 8-token window: all 5 duplicated
    // windows overlap and their union covers the entire run
    val long = (1 to 12).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      (1L, s"first $long"),
      (2L, s"second\t$long\n trailing  words"), // messy whitespace
      (3L, "")).toDF("doc_id", "text")
    val out = Dedup.substringDedup(docs, minTokens = 8).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out(1L) === ((s"first $long", 13L, 0L)))
    assert(out(2L) === (("second trailing words", 15L, 12L)))
    // empty doc survives as the empty row, never dropped
    assert(out(3L) === (("", 0L, 0L)))
    // partition independence: keep-first is a global (doc_id, pos) min
    val re = Dedup.substringDedup(docs.repartition(7), minTokens = 8)
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    assert(re === out)
  }

  test("d18 gate removes real spans from the corpus and never doc x doc") {
    val out = Dedup.d18SubstringDedup(spark, sf)
    val stats = out.agg(
      sum(when(col("n_removed") > 0, 1L).otherwise(0L)),
      sum(col("n_removed")), count(lit(1))).head
    assert(stats.getLong(2) > 0)
    assert(stats.getLong(0) > 0, "gate corpus must exercise real span removal")
    // token conservation: kept + removed = original, per doc
    val bad = out.filter(
      size(split(col("text_dedup"), " ")) =!= col("n_tokens") - col("n_removed") &&
        !(col("text_dedup") === "" && col("n_tokens") === col("n_removed")))
      .count()
    assert(bad === 0L, "kept tokens + removed positions must equal the original count")
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"),
      plan.take(2000))
  }

  test("urlDedup collapses crawl variants of one page and keeps the first id") {
    import spark.implicits._
    val urls = Seq(
      (1L, "HTTP://Ex.COM:80/page/1?utm_s=a&id=7#top"),
      (2L, "http://ex.com/page/1/?id=7"),
      (3L, "http://ex.com/page/1?ref=x&id=7"),
      (4L, "http://ex.com/page/2?id=7"), // different path — must NOT merge
      (5L, "http://ex.com/page/1?id=8")  // different surviving param — must NOT merge
    ).toDF("doc_id", "url")
    val out = Dedup.urlDedup(urls).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out === Map(
      "http://ex.com/page/1?id=7" -> ((1L, 3L)),
      "http://ex.com/page/2?id=7" -> ((4L, 1L)),
      "http://ex.com/page/1?id=8" -> ((5L, 1L))))
    // the gate binding exercises a REAL collapse on the synthetic corpus
    val gate = Dedup.d16UrlDedup(spark, sf)
    val n = gate.count()
    val copies = gate.agg(org.apache.spark.sql.functions.sum("n_copies")).head.getLong(0)
    assert(n < copies, s"$n canon urls over $copies rows — no collapse happened")
    // map-only canon + one groupBy: no join anywhere in the plan
    val plan = gate.queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), plan.take(2000))
  }

  test("ngramNovelty: fully-seen → 0, fully-novel → 1, mixed → exact fraction") {
    import spark.implicits._
    val reference = Seq((100L, "a b c d e")).toDF("doc_id", "text")
    // shingles of ref: {a b c, b c d, c d e}
    val corpus = Seq(
      (1L, "a b c d"),        // both shingles seen → novelty 0
      (2L, "x y z w"),        // none seen → novelty 1
      (3L, "a b c q r"),      // {a b c} seen; {b c q, c q r} novel → 2/3
      (4L, "a b")             // < 3 tokens → excluded
    ).toDF("doc_id", "text")
    val out = Dedup.ngramNovelty(corpus, reference)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(out === Map(
      1L -> ((2L, 0L, 0.0)),
      2L -> ((2L, 2L, 1.0)),
      3L -> ((3L, 2L, 0.666667))))
    // novelty against an EMPTY reference is 1 everywhere it scores
    val empty = Dedup.ngramNovelty(corpus, reference.filter($"doc_id" < 0L))
      .collect().map(r => r.getDouble(3))
    assert(empty.nonEmpty && empty.forall(_ === 1.0))
  }
}
