package graft

import graft.operators.{Dedup, Similarity, Text}
import org.apache.spark.sql.functions._

/** The library forms of the LLM-pipeline operators must work on ANY
  * caller DataFrame with arbitrary column names — not just the gate's
  * standard tables (which the d/s/t entries bind).
  */
class LibraryApiSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (10L, "the cat sat on the mat today"),
    (20L, "the cat sat on the mat today"),
    (30L, "le chat de la table et le tapis"),
    (40L, "completely different words entirely now yes")).toDF("my_id", "body")

  test("exact dedup over renamed columns") {
    val out = Dedup.exactDedup(docs, "my_id", "body").collect()
    assert(out.length === 3)
    assert(out.find(_.getAs[Long]("rep_doc_id") == 10L).get.getAs[Long]("n_copies") === 2L)
  }

  test("ngram jaccard finds the duplicated pair in a custom frame") {
    val pairs = Dedup.ngramJaccardPairs(docs, "my_id", "body").collect()
    assert(pairs.nonEmpty)
    val top = pairs.head
    assert(top.getAs[Long]("d1") === 10L && top.getAs[Long]("d2") === 20L)
    assert(top.getAs[Double]("jaccard") === 1.0)
  }

  test("minhash-lsh and simhash run on a custom frame") {
    val lsh = Dedup.minhashLshPairs(docs, "my_id", "body").collect()
    assert(lsh.exists(r => r.getAs[Long]("d1") == 10L && r.getAs[Long]("d2") == 20L))
    val sh = Dedup.simhashPairs(docs, "my_id", "body").collect()
    assert(sh.exists(r => r.getAs[Long]("d1") == 10L && r.getAs[Long]("d2") == 20L &&
      r.getAs[Int]("hamming") == 0))
  }

  test("incremental minhash index builds and probes over renamed columns") {
    val (sigs, bands) = Dedup.minhashIndex(docs.filter(col("my_id") =!= 20L), "my_id", "body")
    val batch = docs.filter(col("my_id") === 20L)
    val hits = Dedup.incrementalNearDups(sigs, bands, batch, "my_id", "body").collect()
    assert(hits.length === 1)
    assert(hits.head.getAs[Long]("new_id") === 20L)
    assert(hits.head.getAs[Long]("old_id") === 10L)
    assert(hits.head.getAs[Double]("est_jaccard") === 1.0)
  }

  test("language id over renamed columns distinguishes languages") {
    val byId = Text.langId(docs, "my_id", "body").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("lang_pred")).toMap
    assert(byId(10L) === "en" && byId(30L) === "fr")
  }

  test("ann library forms accept any embeddings/queries frames") {
    val emb = Seq(
      (1L, Array(1f, 0f, 0f)),
      (2L, Array(0.9f, 0.1f, 0f)),
      (3L, Array(0f, 1f, 0f)),
      (4L, Array(0f, 0f, 1f))).toDF("id", "vec")
    val q = emb.filter(col("id") === 1L)
    val nn = Similarity.annBruteforce(emb, q, "id", "vec", k = 1).collect()
    assert(nn.length === 1 && nn.head.getAs[Long]("n_id") === 2L)
    // LSH/IVF on tiny frames: just prove they execute and never return
    // a self-pair or an unknown id
    val lsh = Similarity.annLsh(emb, q, "id", "vec", k = 2).collect()
    lsh.foreach(r => assert(r.getAs[Long]("n_id") != 1L))
    val ivf = Similarity.annIvf(emb, q, "id", "vec", k = 2).collect()
    ivf.foreach(r => assert(Set(2L, 3L, 4L).contains(r.getAs[Long]("n_id"))))
  }

  test("asofJoin: empty right side and unmatched keys yield null matches") {
    import graft.operators.Relational
    val left = Seq((1L, 100L, "a"), (2L, 200L, "b")).toDF("k", "t", "payload")
    val right = Seq((1L, 50L, "early"), (1L, 150L, "late"), (9L, 10L, "other-key"))
      .toDF("k", "t", "tag")
    val out = Relational.asofJoin(left, right, "k", "t").collect()
      .map(r => (r.getAs[Long]("k"), r.getAs[String]("right_tag"))).toMap
    assert(out(1L) === "early") // t=100 matches t=50, not t=150
    assert(out(2L) === null)    // key 2 has no right rows at all
    val empty = right.filter(col("k") === -1L)
    val outEmpty = Relational.asofJoin(left, empty, "k", "t").collect()
    assert(outEmpty.length === 2 && outEmpty.forall(_.getAs[String]("right_tag") == null))
  }

  test("rangeJoinCount: zero matches and interval boundaries are exact") {
    import graft.operators.Relational
    val left = Seq((1L, 1000L, 10L), (2L, 1000L, 20L)).toDF("id", "t", "k")
      .select(col("id"), col("k"), col("t"))
    val right = Seq(
      (10L, 1000L),  // equal ts: counts (inclusive upper bound)
      (10L, 1L),     // t - 999: inside (t-1000, t]
      (10L, 0L),     // exactly t - interval: excluded (exclusive lower)
      (20L, 2000L))  // after left's t: excluded
      .toDF("k", "t")
    val out = Relational.rangeJoinCount(left, right, "k", "t", 1000L, "n").collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[Long]("n")).toMap
    assert(out(1L) === 2L && out(2L) === 0L)
  }

  test("rangeJoinCount and asofJoin accept column names needing backticks") {
    import graft.operators.Relational
    // dots, spaces, and a reserved keyword as column names — these
    // break any implementation that splices names into SQL strings
    val left = Seq((1L, 1000L), (2L, 5000L)).toDF("the.key", "event time")
    val right = Seq((1L, 900L, "x"), (1L, 400L, "y"), (2L, 100L, "z"))
      .toDF("the.key", "event time", "select")
    val counts = Relational.rangeJoinCount(left, right, "the.key", "event time", 1000L, "n")
      .collect().map(r => r.getAs[Long]("the.key") -> r.getAs[Long]("n")).toMap
    assert(counts === Map(1L -> 2L, 2L -> 0L))
    val asof = Relational.asofJoin(left, right, "the.key", "event time")
      .collect().map(r => (r.getAs[Long]("the.key"), r.getAs[String]("right_select"))).toMap
    assert(asof === Map(1L -> "x", 2L -> "z"))
    val sampled = Relational.stratifiedSample(
      right, "the.key", "select", Map.empty, defaultFraction = 1.0)
    assert(sampled.count() === 3L)
  }

  test("r9 text/relational additions accept column names needing backticks") {
    import graft.operators.{Relational, Text}
    val docs = Seq((1L, "a b a"), (2L, "b c"), (3L, "a"))
      .toDF("doc id", "the.text")
    // tf-idf, hashed features, temperature sampling over odd names
    assert(Text.tfIdfKeywords(docs, "doc id", "the.text", topK = 2).count() > 0)
    val hf = Text.hashedFeatures(docs, "doc id", "the.text", nBuckets = 8)
    assert(hf.agg(org.apache.spark.sql.functions.sum("n")).collect().head.getLong(0) === 6L)
    assert(Relational.temperatureSample(docs, "doc id", "the.text",
      alpha = 0.5, targetFraction = 1.0).count() === 3L)
    // fkIntegrity with a reserved word and dotted key
    val child = Seq((1L, "x"), (9L, "y")).toDF("select", "v")
    val parent = Seq(1L, 2L).toDF("p.k")
    val row = Relational.fkIntegrity("e", child, "select", parent, "p.k").collect().head
    assert(row.getLong(1) === 2L && row.getLong(4) === 1L)
  }

  test("r10 relational additions accept column names needing backticks") {
    import graft.operators.{Dedup, Relational}
    val vals = Seq(("g1", 1L, 1.0), ("g1", 1L, 2.0), ("g1", 2L, 3.0),
      ("g2", 1L, 5.0)).toDF("the group", "a.day", "select")
    // exact quantiles over odd names
    val qn = Relational.exactQuantiles(vals, "the group", "select", Seq(0.5))
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(qn === Map("g1" -> 2.0, "g2" -> 5.0))
    // agg + sketch state over odd names
    val ag = Relational.aggRollup(
      Relational.aggStates(vals, Seq("the group", "a.day"), "select"),
      Seq("the group")).collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(ag === Map("g1" -> 3L, "g2" -> 1L))
    // sketch value must be int/bigint/string/binary (hll_sketch_agg's
    // contract) — distinct DAYS per group here
    val sk = Relational.sketchRollup(
      Relational.sketchStates(vals, Seq("the group"), "a.day"),
      Seq("the group")).collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sk("g1") === 2L && sk("g2") === 1L)
    // z-order keys over odd names (long-castable cols)
    val zk = Relational.zorderKey(
      Seq((0L, 0L), (255L, 255L)).toDF("x col", "y.col"), "x col", "y.col")
    assert(zk.columns.contains("z") && zk.count() === 2L)
    // line dedup over odd names
    val ld = Dedup.lineDedup(
      Seq((1L, 0L, "dup"), (2L, 0L, "dup")).toDF("doc id", "pos.no", "the line"),
      "doc id", "pos.no", "the line")
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(ld === Map(1L -> 1L, 2L -> 0L))
  }

  test("late-r10 additions accept column names needing backticks") {
    import graft.operators.{Relational, Similarity}
    val vals = Seq(("g1", "x", 1L, 1.0), ("g1", "y", 2L, 2.0),
      ("g2", "x", 3L, 5.0)).toDF("the group", "b col", "a.day", "select")
    // grouping sets over odd names
    val gs = Relational.groupingSetsSummary(vals, "the group", "b col", "select")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(3)).toMap
    assert(gs(("(all)", "(all)")) === 3L && gs(("g1", "(all)")) === 2L)
    // gap islands over odd names
    val gi = Relational.gapIslands(vals, "the group", "a.day")
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(gi === Map("g1" -> 1L, "g2" -> 1L))
    // interval merge over odd names (start/end as castable longs)
    val im = Relational.mergeIntervals(
      Seq(("k", 1L, 0L, 10L), ("k", 2L, 5L, 20L)).toDF("the key", "id.x", "s col", "e col"),
      "the key", "s col", "e col", "id.x")
    assert(im.count() === 1L)
    // weighted sample over odd names
    val ws = Relational.weightedSample(vals, "the group", "a.day", "select", 1)
    assert(ws.count() === 2L)
    // IQR fences over odd names
    val iq = Relational.iqrOutliers(vals, "the group", "select")
    assert(iq.count() === 2L)
    // funnel over odd names
    val fu = Relational.funnel(vals, "the group", "b col", "a.day", Seq("x", "y"))
      .collect().map(r => r.getString(0) -> r.getInt(3)).toMap
    assert(fu === Map("g1" -> 2, "g2" -> 1))
    // hamming knn over odd names
    val hk = Similarity.hammingKnn(
      Seq((0L, 3L), (1L, 1L), (2L, 12L)).toDF("vec id", "the code"),
      Seq((0L, 3L)).toDF("vec id", "the code"), "vec id", "the code", k = 2)
      .collect().map(r => (r.getInt(1), r.getLong(2)))
    assert(hk.toSeq === Seq((1, 1L), (2, 2L)))
  }

  test("r10 final additions accept column names needing backticks") {
    import graft.operators.{Dedup, Relational}
    // cohort retention over odd names
    val act = Seq(("u1", 1L), ("u1", 2L), ("u2", 2L))
      .toDF("user id", "the.week")
    val cr = Relational.cohortRetention(act, "user id", "the.week")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(cr === Map((1L, 0L) -> 1L, (1L, 1L) -> 1L, (2L, 0L) -> 1L))
    // equi-depth histogram over odd names
    val vals = Seq(("g", 1.0), ("g", 2.0), ("g", 3.0), ("g", 4.0))
      .toDF("the group", "select")
    val eh = Relational.equidepthHistogram(vals, "the group", "select", 2)
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(eh === Map(0L -> 2L, 1L -> 2L))
    // compaction bins over odd names
    val fl = Seq(("p", 1L, 30.0), ("p", 2L, 30.0), ("p", 3L, 30.0))
      .toDF("the part", "file id", "size.bytes")
    val cb = Relational.compactionBins(fl, "the part", "file id", "size.bytes", 50L)
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(cb === Map(0L -> 2L, 1L -> 1L))
    // template dedup over odd names
    val td = Dedup.templateDedup(
      Seq((1L, "A 1"), (2L, "a 2")).toDF("doc id", "the text"), "doc id", "the text")
    assert(td.count() === 1L)
    // rolling stats over odd names
    val rs = Relational.rollingWindowStats(
      Seq(("g", 1L, 10.0), ("g", 2L, 20.0)).toDF("the key", "a.day", "select"),
      "the key", "a.day", "select", 7)
      .collect().map(r => r.getLong(1) -> r.getDouble(3)).toMap
    assert(rs === Map(1L -> 10.0, 2L -> 30.0))
    // attribution over odd names
    val at = Relational.lastTouchAttribution(
      Seq(("u", 1L, 1L, "touch"), ("u", 2L, 2L, "conv"))
        .toDF("user id", "ts.ns", "event id", "the kind"),
      "user id", "ts.ns", "event id", "the kind", "touch", "conv")
      .collect().map(r => (r.getLong(1), r.getLong(3)))
    assert(at.toSeq === Seq((2L, 1L)))
    // transitions over odd names
    val tr = Relational.eventTransitions(
      Seq(("u", 1L, 1L, "a"), ("u", 2L, 2L, "b"), ("u", 3L, 3L, "a"))
        .toDF("user id", "ts.ns", "event id", "the kind"),
      "user id", "ts.ns", "event id", "the kind")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(tr === Map(("a", "b") -> 1L, ("b", "a") -> 1L))
    // count-min over odd names: build, then point-query through the
    // same odd columns
    val cmDf = Seq(("g", "x"), ("g", "x"), ("g", "y")).toDF("the group", "select")
    val cmStates = Relational.countMinStates(cmDf, Seq("the group"), "select", 2, 16)
    val cmEst = Relational.countMinEstimate(cmStates, Seq("the group"),
      cmDf.distinct(), "select", 2, 16)
      .collect().map(r => r.getString(1) -> r.getLong(2)).toMap
    assert(cmEst("x") >= 2L && cmEst("y") >= 1L)
  }

  test("compactionBins: the listing-shard recipe — packing a composite key equals packing each shard alone") {
    import graft.operators.Relational
    // a 2-level lake listing (table x day), the shape the scaladoc's
    // mega-listing rule prescribes: the cumulative window is one task
    // per GROUP, so a planner over 10^8 files shards the key into
    // table/partition prefixes — which a rewrite job requires anyway
    // (it cannot merge files across lake partitions)
    val listing = for {
      table <- Seq("lineitem", "orders")
      day <- 0 until 5
      f <- 0 until 200
    } yield (table, day, table.hashCode.abs % 97 * 100000L + day * 1000L + f,
      50.0 + (f * 37 % 400))
    val df = listing.toDF("table", "day", "file_id", "size")
      .withColumn("shard", concat_ws("/", col("table"), col("day")))
    val packed = Relational.compactionBins(df, "shard", "file_id", "size", 5000L)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getDouble(3), r.getLong(4), r.getLong(5)))).toMap
    // every bin lives inside one shard by construction (the group IS
    // the shard), and the composite-key pack is bit-equal to packing
    // each shard's listing through the operator INDEPENDENTLY — the
    // equivalence that makes the recipe free of semantic cost
    for (table <- Seq("lineitem", "orders"); day <- 0 until 5) {
      val shard = s"$table/$day"
      val alone = Relational.compactionBins(
        df.filter(col("shard") === shard), "shard", "file_id", "size", 5000L)
        .collect()
        .map(r => (r.getString(0), r.getLong(1)) ->
          ((r.getLong(2), r.getDouble(3), r.getLong(4), r.getLong(5)))).toMap
      assert(alone === packed.filter(_._1._1 == shard), s"shard $shard diverged")
    }
    // the shard bound holds: no window partition saw more than one
    // shard's files (200 here), and every file is packed exactly once
    assert(packed.values.map(_._1).sum === listing.size.toLong)
    assert(packed.groupBy(_._1._1).forall(_._2.values.map(_._1).sum == 200L))
  }

  test("bpeTrain composes over a stratified sample (the train-on-sample recipe)") {
    import graft.operators.Relational
    // the scale recipe from bpeTrain's scaladoc: train the merge table
    // on a q20-style deterministic sample, encode the FULL frame
    val full = Tables.documents(spark, "/root/testdata/sf0.001")
      .select("doc_id", "text", "source")
    val sample = Relational.stratifiedSample(full, "doc_id", "source",
      Map.empty, defaultFraction = 0.5)
    val n = sample.count()
    assert(n > 0 && n < full.count())
    val merges = Text.bpeTrain(sample, nMerges = 4).collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    assert(merges.nonEmpty)
    val encoded = Text.bpeEncode(full, merges)
    assert(encoded.count() === full.count())
  }

  test("deterministicSplit is stable and fractions are sane") {
    import graft.operators.Relational
    val df = spark.range(0, 2000).toDF("doc_id")
    val a = Relational.deterministicSplit(df, "doc_id").groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // 16%/16%/68% of 2000 with hash noise
    assert(a("val") > 200 && a("val") < 450, a.toString)
    assert(a("test") > 200 && a("test") < 450, a.toString)
    assert(a("train") > 1100 && a("train") < 1550, a.toString)
    // same rows, different partitioning → identical assignment
    val b = Relational.deterministicSplit(df.repartition(7), "doc_id")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val aRows = Relational.deterministicSplit(df, "doc_id")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(aRows === b)
  }

  test("annIvf works when caller ids do not start at zero") {
    val emb = Seq(
      (1001L, Array(1f, 0f)),
      (1002L, Array(0.9f, 0.1f)),
      (1003L, Array(0f, 1f))).toDF("id", "vec")
    val out = Similarity.annIvf(emb, emb.filter(col("id") === 1001L), "id", "vec", k = 1)
      .collect()
    assert(out.length === 1 && out.head.getAs[Long]("n_id") === 1002L)
  }

  test("embedding dedup pairs over renamed columns") {
    val emb = Seq(
      (1L, Array(1f, 0f), "a"),
      (2L, Array(1f, 0f), "a"),
      (3L, Array(0f, 1f), "b")).toDF("id", "vec", "grp")
    val pairs = Dedup.embeddingDedupPairs(emb, "id", "vec", "grp", topK = 5).collect()
    assert(pairs.length === 1)
    assert(pairs.head.getAs[Long]("v1") === 1L && pairs.head.getAs[Long]("v2") === 2L)
    assert(pairs.head.getAs[Double]("cosine") === 1.0)
  }

  test("chunked triangle join emits the exact naive pair set, once each") {
    // 40 vectors over 3 labels, topK past the total pair count so the
    // FULL pair sets compare — every unordered in-label pair must appear
    // in exactly one chunk-grid cell, for a chunk count below, at, and
    // above the block size (chunks=1 IS the naive label self-join)
    val rnd = new scala.util.Random(7)
    val emb = (0L until 40L).map(i =>
      (i, Array.fill(8)(rnd.nextGaussian().toFloat), (i % 3).toString))
      .toDF("id", "vec", "grp")
    val naive = Dedup.embeddingDedupPairs(emb, "id", "vec", "grp",
      topK = 1000, chunks = 1).collect().map(r => (r.getLong(1), r.getLong(2), r.getDouble(3)))
    // blocks of 14/13/13 ids -> C(14,2) + 2*C(13,2) unordered pairs
    assert(naive.length === 14 * 13 / 2 + 2 * (13 * 12 / 2))
    for (c <- Seq(4, 8, 64)) {
      val chunked = Dedup.embeddingDedupPairs(emb, "id", "vec", "grp",
        topK = 1000, chunks = c).collect().map(r => (r.getLong(1), r.getLong(2), r.getDouble(3)))
      assert(chunked.toSet === naive.toSet, s"chunks=$c")
      assert(chunked.length === naive.length, s"chunks=$c duplicates")
    }
  }

  test("lm perplexity trains and scores over renamed columns") {
    val (uni, bg) = Text.lmTrain(docs, idCol = "my_id", textCol = "body")
    val out = Text.lmPerplexity(docs, uni, bg, idCol = "my_id", textCol = "body")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // one transition per adjacent token pair, normalized id column
    assert(out.keySet === Set(10L, 20L, 30L, 40L))
    assert(out(10L) === 6L && out(40L) === 5L)
  }

  test("semantic dedup over renamed columns collapses the identical pair") {
    val emb = Seq(
      (10L, Array(1f, 0f, 0f)),
      (11L, Array(1f, 0.001f, 0f)), // near-identical to 10
      (12L, Array(0f, 1f, 0f)))
      .toDF("vid", "vec")
    val out = Dedup.semanticDedup(emb, idCol = "vid", vecCol = "vec",
      minCosine = 0.99, numCells = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    assert(out === Set((10L, 10L, true), (11L, 10L, false), (12L, 12L, true)))
  }
}
