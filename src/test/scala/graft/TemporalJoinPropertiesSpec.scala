package graft

import graft.operators.Relational
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based verification of the generic temporal joins: on random
  * small datasets the distributed formulations must match brute-force
  * reference implementations computed on the driver.
  */
class TemporalJoinPropertiesSpec extends SparkSpec {
  import spark.implicits._

  /** Deterministic sampling loop (no scalatest-scalacheck bridge in the
    * offline cache); fewer samples than PropertiesSpec because each one
    * runs Spark jobs.
    */
  private def forAllSampled[A](gen: Gen[A], samples: Int)(check: A => Unit): Unit =
    (0 until samples).foreach { i =>
      gen.apply(Gen.Parameters.default, Seed(i.toLong)).foreach(check)
    }

  // (key, time) rows with intentional key collisions and time ties;
  // ids globally unique so tie-break rules are observable
  private val datasetGen: Gen[(List[(Long, Long)], List[(Long, Long)])] = for {
    nl <- Gen.choose(0, 25)
    nr <- Gen.choose(0, 25)
    lks <- Gen.listOfN(nl, Gen.choose(0L, 4L))
    lts <- Gen.listOfN(nl, Gen.choose(0L, 40L))
    rks <- Gen.listOfN(nr, Gen.choose(0L, 4L))
    rts <- Gen.listOfN(nr, Gen.choose(0L, 40L))
  } yield (lks.zip(lts), rks.zip(rts))

  test("asofJoin matches the brute-force model on random data") {
    forAllSampled(datasetGen, 30) { case (lRows, rRows) =>
      val left = lRows.zipWithIndex.map { case ((k, t), i) => (k, t, i.toLong) }
      val right = rRows.zipWithIndex.map { case ((k, t), i) => (k, t, 1000L + i) }
      val lDf = left.toDF("k", "t", "lid")
      val rDf = right.toDF("k", "t", "rid")
      val got = Relational.asofJoin(lDf, rDf, "k", "t").collect()
        .map(r => r.getAs[Long]("lid") ->
          Option(r.getAs[java.lang.Long]("right_rid")).map(_.toLong))
        .toMap
      // model: most recent right at-or-before; ties at equal t resolve to
      // the greatest (t, rid) payload — i.e. max rid among max t
      val expected = left.map { case (k, t, lid) =>
        val cands = right.filter(r => r._1 == k && r._2 <= t)
        lid -> (if (cands.isEmpty) None
                else Some(cands.maxBy(r => (r._2, r._3))._3))
      }.toMap
      assert(got === expected, s"left=$left right=$right")
    }
  }

  test("deterministicSplit matches a pure md5 model on random ids") {
    val idsGen = Gen.listOfN(200, Gen.choose(-1000000L, 1000000L))
    forAllSampled(idsGen, 5) { ids =>
      val got = Relational.deterministicSplit(ids.distinct.toDF("doc_id"), "doc_id")
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      val md = java.security.MessageDigest.getInstance("MD5")
      val expected = ids.distinct.map { id =>
        val hex = md.digest(id.toString.getBytes("UTF-8"))
          .map(b => f"$b%02x").mkString.substring(0, 2)
        id -> (if (hex < "29") "val" else if (hex < "52") "test" else "train")
      }.toMap
      assert(got === expected)
    }
  }

  test("saltedJoin equals the plain inner join on random skewed data") {
    // heavy key collisions: key 0 is hot by construction
    val gen = for {
      np <- Gen.choose(0, 40)
      nb <- Gen.choose(0, 15)
      pks <- Gen.listOfN(np, Gen.frequency(3 -> Gen.const(0L), 1 -> Gen.choose(1L, 4L)))
      bks <- Gen.listOfN(nb, Gen.frequency(2 -> Gen.const(0L), 1 -> Gen.choose(1L, 4L)))
    } yield (pks, bks)
    forAllSampled(gen, 10) { case (pks, bks) =>
      val probe = pks.zipWithIndex.map { case (k, i) => (k, i.toLong) }.toDF("k", "pid")
      val build = bks.zipWithIndex.map { case (k, i) => (k, 100L + i) }.toDF("k", "bid")
      val salted = Relational.saltedJoin(probe, build, "k", salt = 4)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
      val plain = probe.join(build, Seq("k"), "inner")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
      assert(salted === plain, s"probe=$pks build=$bks")
    }
  }

  test("stratifiedSample matches a pure md5 model and honors edge fractions") {
    val md = java.security.MessageDigest.getInstance("MD5")
    def hex4(id: Long): String =
      md.digest(id.toString.getBytes("UTF-8")).map(b => f"$b%02x").mkString.substring(0, 4)
    val idsGen = Gen.listOfN(300, Gen.zip(Gen.choose(-100000L, 100000L), Gen.oneOf("a", "b", "c")))
    val fractions = Map("a" -> 0.75, "b" -> 0.25)
    forAllSampled(idsGen, 5) { rows =>
      val distinct = rows.distinctBy(_._1)
      val got = Relational.stratifiedSample(
        distinct.toDF("doc_id", "src"), "doc_id", "src", fractions, defaultFraction = 0.125)
        .collect().map(r => (r.getLong(0), r.getString(1))).toSet
      val expected = distinct.filter { case (id, g) =>
        hex4(id) < (fractions.get(g) match {
          case Some(0.75) => "c000"
          case Some(0.25) => "4000"
          case _ => "2000"
        })
      }.toSet
      assert(got === expected)
      // fraction 1.0 keeps everything, 0.0 keeps nothing
      val all = Relational.stratifiedSample(
        distinct.toDF("doc_id", "src"), "doc_id", "src", Map.empty, defaultFraction = 1.0)
      assert(all.count() === distinct.size.toLong)
      val none = Relational.stratifiedSample(
        distinct.toDF("doc_id", "src"), "doc_id", "src", Map.empty, defaultFraction = 0.0)
      assert(none.count() === 0L)
    }
  }

  test("saltedJoin spreads a hot key over many shuffle partitions") {
    val conf = spark.conf
    val aqe = conf.get("spark.sql.adaptive.enabled")
    val abt = conf.get("spark.sql.autoBroadcastJoinThreshold")
    val shp = conf.get("spark.sql.shuffle.partitions")
    // pin a plain shuffled join: AQE coalescing and auto-broadcast would
    // both hide the reducer layout this test inspects; the test session's
    // 4 shuffle partitions are too coarse to observe a 16-way spread
    conf.set("spark.sql.adaptive.enabled", "false")
    conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    conf.set("spark.sql.shuffle.partitions", "256")
    try {
      val salt = 16
      val probe = (0 until 10000).map(i => ("hot", i.toLong)).toDF("k", "pid")
      val build = Seq(("hot", 0L)).toDF("k", "bid")
      def partSizes(df: org.apache.spark.sql.DataFrame): Seq[Long] =
        df.rdd.mapPartitions(it => Iterator.single(it.size.toLong)).collect().toSeq
      val plain = partSizes(probe.join(build, Seq("k"), "inner"))
      val salted = partSizes(Relational.saltedJoin(probe, build, "k", salt))
      assert(plain.sum === 10000L && salted.sum === 10000L)
      // unsalted: the single hot key melts one reducer
      assert(plain.max === 10000L, s"plain=$plain")
      // salted: the key's rows land on >= salt/2 reducers (a few of the
      // 16 salt values may still share a hash partition) and the
      // busiest reducer stays far below the unsalted pile-up
      info(s"salted partition sizes: ${salted.filter(_ > 0).sorted.reverse}")
      assert(salted.count(_ > 0) >= salt / 2, s"spread=$salted")
      assert(salted.max.toDouble / salted.sum < 3.0 / salt,
        s"max share ${salted.max.toDouble / salted.sum}")
    } finally {
      conf.set("spark.sql.adaptive.enabled", aqe)
      conf.set("spark.sql.autoBroadcastJoinThreshold", abt)
      conf.set("spark.sql.shuffle.partitions", shp)
    }
  }

  test("stratifiedSample handles fractions beyond [0,1] and tracks requested rates") {
    val df = (0L until 3000L).map(i => (i, if (i % 2 == 0) "a" else "b")).toDF("doc_id", "src")
    // > 1 takes the sentinel threshold: the whole group survives
    val over = Relational.stratifiedSample(df, "doc_id", "src", Map("a" -> 2.5))
      .collect().map(_.getString(1))
    assert(over.length === 1500 && over.forall(_ == "a"))
    // negative clamps to an all-drop threshold; other groups untouched
    val neg = Relational.stratifiedSample(df, "doc_id", "src", Map("a" -> -0.5),
      defaultFraction = 1.0).collect().map(_.getString(1))
    assert(neg.length === 1500 && neg.forall(_ == "b"))
    // observed per-group keep rates track the requested fractions
    // (16-bit md5 threshold; binomial 3-sigma on 1500 ids ~ 0.035)
    val kept = Relational.stratifiedSample(df, "doc_id", "src",
      Map("a" -> 0.75, "b" -> 0.125))
      .groupBy("src").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(math.abs(kept("a") / 1500.0 - 0.75) < 0.05, s"a rate ${kept("a") / 1500.0}")
    assert(math.abs(kept.getOrElse("b", 0L) / 1500.0 - 0.125) < 0.05,
      s"b rate ${kept.getOrElse("b", 0L) / 1500.0}")
  }

  test("tokenBudgetSample quotas budgeted groups and passes others through") {
    import org.apache.spark.sql.functions.col
    // group a: 2000 rows x 10 tokens = 20000; group b: 400 rows x 25 = 10000
    val rows = (0L until 2000L).map(i => (i, "a", 10L)) ++
      (10000L until 10400L).map(i => (i, "b", 25L))
    val df = rows.toDF("id", "g", "toks")
    val out = Relational.tokenBudgetSample(df, "id", "g", "toks", Map("a" -> 5000L))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    // unbudgeted group passes through completely
    assert(out.count(_._2 == "b") === 400)
    // budgeted group lands near its token quota (md5 uniformity over
    // 2000 ids; binomial 3-sigma ~ 0.03)
    val aTokens = out.filter(_._2 == "a").map(_._3).sum
    assert(math.abs(aTokens / 20000.0 - 0.25) < 0.04, s"a token rate ${aTokens / 20000.0}")
    // exact md5 model agreement for the kept set
    val md = java.security.MessageDigest.getInstance("MD5")
    def hv(id: Long): Int = Integer.parseInt(
      md.digest(id.toString.getBytes("UTF-8")).map(b => f"$b%02x").mkString.substring(0, 4), 16)
    val thr = math.floor(0.25 * 65536).toInt
    val expectedA = (0L until 2000L).filter(hv(_) < thr).toSet
    assert(out.filter(_._2 == "a").map(_._1).toSet === expectedA)
    // zero budget drops the group; budget >= total keeps it whole
    assert(Relational.tokenBudgetSample(df, "id", "g", "toks", Map("a" -> 0L))
      .filter(col("g") === "a").count() === 0L)
    assert(Relational.tokenBudgetSample(df, "id", "g", "toks", Map("a" -> 999999L))
      .count() === 2400L)
  }

  test("library forms accept column names needing backticks (dots, spaces)") {
    import org.apache.spark.sql.functions.col
    // temporal joins
    val left = Seq((1L, 1L, 100L), (2L, 1L, 50L)).toDF("l.id", "the key", "event.time")
    val right = Seq((1L, 95L), (1L, 40L)).toDF("the key", "event.time")
    val rj = Relational.rangeJoinCount(left, right, "the key", "event.time", 10L, "n")
      .collect().map(r => r.getAs[Long]("l.id") -> r.getAs[Long]("n")).toMap
    assert(rj === Map(1L -> 1L, 2L -> 0L))
    val aj = Relational.asofJoin(left, right, "the key", "event.time")
      .collect().map(r => r.getAs[Long]("l.id") -> r.getAs[Long]("right_event.time")).toMap
    assert(aj === Map(1L -> 95L, 2L -> 40L))
    val sj = Relational.saltedJoin(
      Seq(("k", 1L)).toDF("join.key", "p.v"), Seq(("k", 2L)).toDF("join.key", "b.v"),
      "join.key", salt = 4)
    assert(sj.count() === 1L)
    // samplers
    assert(Relational.deterministicSplit(Seq(Tuple1(7L)).toDF("doc.id"), "doc.id")
      .count() === 1L)
    assert(Relational.stratifiedSample(Seq((7L, "g")).toDF("doc.id", "the src"),
      "doc.id", "the src", Map("g" -> 1.0)).count() === 1L)
    // dedup family
    val docs = Seq((1L, "a b c"), (2L, "a b c")).toDF("doc.id", "the text")
    assert(graft.operators.Dedup.exactDedup(docs, "doc.id", "the text").count() === 1L)
    val clusters = graft.operators.Dedup.dupClusters(
      Seq((1L, 2L)).toDF("pair.a", "pair.b"), "pair.a", "pair.b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(clusters === Set((1L, 1L), (2L, 1L)))
    // text + similarity
    assert(graft.operators.Text.tokenCount(docs, "doc.id", "the text").count() === 2L)
    val emb = Seq((0L, Array(1f, 0f)), (1L, Array(1f, 0.1f)), (2L, Array(0f, 1f)))
      .toDF("vec.id", "the emb")
    val ann = graft.operators.Similarity.annBruteforce(
      emb, emb.filter(col("`vec.id`") === 0L), "vec.id", "the emb", k = 2)
    assert(ann.count() === 2L)
    val lshPairs = graft.operators.Dedup.embeddingLshPairs(emb, "vec.id", "the emb",
      minCosine = 0.99)
    assert(lshPairs.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq === Seq((0L, 1L)))
    val quota = Relational.tokenBudgetSample(
      Seq((1L, "g", 5L)).toDF("doc.id", "the src", "tok count"),
      "doc.id", "the src", "tok count", Map("g" -> 100L))
    assert(quota.count() === 1L)
    // round-7 text ops
    assert(graft.operators.Text.redactPii(docs, "doc.id", "the text").count() === 2L)
    assert(graft.operators.Text.boilerplateSpans(docs, "doc.id", "the text").count() === 2L)
    assert(graft.operators.Text.qualityBuckets(docs, "doc.id", "the text").count() === 2L)
    // PQ family
    val pqEmb = Seq((0L, Array(1f, 0f, 0f, 1f)), (1L, Array(1f, 0.1f, 0f, 1f)),
      (2L, Array(0f, 1f, 1f, 0f))).toDF("vec.id", "the emb")
    val pqCb = graft.operators.ProductQuantization.trainPqCodebook(
      pqEmb, "vec.id", "the emb", m = 2, kCodes = 2)
    val pqAnn = graft.operators.ProductQuantization.annPq(
      pqEmb, pqEmb.filter(col("`vec.id`") === 0L), pqCb, "vec.id", "the emb",
      k = 2, m = 2)
    assert(pqAnn.count() === 2L)
  }

  test("packSequences invariants hold on random token counts") {
    val docsGen = Gen.listOfN(120, Gen.choose(1, 60))
    forAllSampled(docsGen, 5) { lens =>
      val budget = 100L
      val docs = lens.zipWithIndex.map { case (n, i) =>
        (i.toLong, Seq.fill(n)("w").mkString(" "))
      }.toDF("doc_id", "text")
      val out = graft.operators.Text.packSequences(docs, budgetTokens = budget).collect()
      // complete, token counts correct
      assert(out.map(_.getLong(0)).toSet === lens.indices.map(_.toLong).toSet)
      out.foreach(r => assert(r.getLong(1) === lens(r.getLong(0).toInt).toLong))
      // budget invariant per bin
      out.groupBy(_.getLong(2)).foreach { case (bin, ds) =>
        val total = ds.map(_.getLong(1)).sum
        assert(total <= budget || ds.length === 1, s"bin $bin total $total")
      }
    }
  }

  test("rangeJoinCount matches the brute-force model on random data") {
    val interval = 7L
    forAllSampled(datasetGen, 30) { case (lRows, rRows) =>
      val left = lRows.zipWithIndex.map { case ((k, t), i) => (i.toLong, k, t) }
      val lDf = left.toDF("lid", "k", "t")
      val rDf = rRows.toDF("k", "t")
      val got = Relational.rangeJoinCount(lDf, rDf, "k", "t", interval, "n").collect()
        .map(r => r.getAs[Long]("lid") -> r.getAs[Long]("n")).toMap
      val expected = left.map { case (lid, k, t) =>
        lid -> rRows.count(r => r._1 == k && r._2 <= t && r._2 > t - interval).toLong
      }.toMap
      assert(got === expected, s"left=$left right=$rRows")
    }
  }

  /** Shared runner for the adversarial cases: execute rangeJoinCount and
    * check it against the (exclusive lower, inclusive upper] model.
    */
  private def checkRange(left: Seq[(Long, Long, Long)], right: Seq[(Long, Long)],
      interval: Long): Map[Long, Long] = {
    val got = Relational.rangeJoinCount(
      left.toDF("lid", "k", "t"), right.toDF("k", "t"), "k", "t", interval, "n")
      .collect().map(r => r.getAs[Long]("lid") -> r.getAs[Long]("n")).toMap
    val expected = left.map { case (lid, k, t) =>
      lid -> right.count(r => r._1 == k && r._2 <= t && r._2 > t - interval).toLong
    }.toMap
    assert(got === expected, s"interval=$interval left=$left right=$right")
    got
  }

  test("rangeJoinCount adversarial interval boundaries") {
    // a right row exactly at t - interval is EXCLUDED, equal ts INCLUDED
    val c1 = checkRange(Seq((1L, 1L, 1000L)), Seq((1L, 0L), (1L, 1L), (1L, 1000L)), 1000L)
    assert(c1(1L) === 2L)
    // interval = 1: only the exact instant matches
    val c2 = checkRange(Seq((1L, 1L, 5L)), Seq((1L, 4L), (1L, 5L), (1L, 6L)), 1L)
    assert(c2(1L) === 1L)
    // empty right side: every left row counts zero
    val c3 = checkRange(Seq((1L, 1L, 5L), (2L, 2L, 9L)), Seq.empty[(Long, Long)], 10L)
    assert(c3 === Map(1L -> 0L, 2L -> 0L))
    // negative times straddling zero: bucketing must floor, not
    // truncate toward zero
    checkRange(Seq((1L, 1L, 0L), (2L, 1L, -3L), (3L, 1L, 3L)),
      Seq((1L, -7L), (1L, -1L), (1L, 0L), (1L, 2L)), 5L)
    // bulk equal-ts ties on both boundaries
    checkRange(Seq((1L, 1L, 100L)),
      Seq.fill(10)((1L, 100L)) ++ Seq.fill(5)((1L, 93L)) ++ Seq.fill(4)((1L, 94L)), 7L)
  }

  test("rangeJoinCount matches the model with interval=1 and negative times") {
    val gen: Gen[(List[(Long, Long)], List[(Long, Long)])] = for {
      nl <- Gen.choose(0, 20)
      nr <- Gen.choose(0, 20)
      lks <- Gen.listOfN(nl, Gen.choose(0L, 3L))
      lts <- Gen.listOfN(nl, Gen.choose(-15L, 15L))
      rks <- Gen.listOfN(nr, Gen.choose(0L, 3L))
      rts <- Gen.listOfN(nr, Gen.choose(-15L, 15L))
    } yield (lks.zip(lts), rks.zip(rts))
    for (interval <- Seq(1L, 4L))
      forAllSampled(gen, 10) { case (lRows, rRows) =>
        val left = lRows.zipWithIndex.map { case ((k, t), i) => (i.toLong, k, t) }
        checkRange(left, rRows, interval)
      }
  }
}
