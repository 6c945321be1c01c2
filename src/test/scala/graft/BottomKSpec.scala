package graft

import org.apache.spark.sql.functions._
import graft.functions.BottomKSketch
import graft.operators.BottomKSample

/** The q72 family's contract is STRONGER than the other sketches': the
  * bottom-k of a fixed hash is a pure SET property, so the state is
  * BIT-IDENTICAL for any insertion order, partitioning, or merge tree
  * — the specs pin state equality, not just bounds — and everything
  * served (sample membership, hashes, ranks, the integer KMV estimate)
  * is engine-independent given the pinned md5-prefix hash.
  */
class BottomKSpec extends SparkSpec {

  private def keys(n: Int) = (1 to n).map(i => s"key$i")

  test("hash60 IS Spark SQL's conv(substr(md5(key),1,15),16,10) — the pinned cross-engine spelling") {
    import spark.implicits._
    val df = (keys(500) :+ "" :+ "héllo wörld" :+ "a\tb")
      .toDF("key")
      .withColumn("sql_h",
        expr("CAST(conv(substr(md5(key), 1, 15), 16, 10) AS BIGINT)"))
    df.collect().foreach { r =>
      val key = r.getString(0)
      assert(BottomKSketch.hash60(key) === r.getLong(1),
        s"hash60 disagrees with the SQL spelling for '$key'")
    }
  }

  test("exact below k: fewer than k distinct keys => estimate IS the distinct count, sample IS the full domain") {
    import spark.implicits._
    // 100 distinct keys, each repeated 7 times, k = 128
    val df = keys(100).flatMap(k => Seq.fill(7)(k))
      .toDF("key").withColumn("g", lit("a"))
    val st = BottomKSample.bottomKStates(df, Seq("g"), "key", k = 128)
    val served = BottomKSample.bottomKServe(st, Seq("g"), sampleSize = 128)
      .collect()
    assert(served.length === 100)
    assert(served.map(_.getLong(4)).toSet === Set(100L)) // distinct_est exact
    assert(served.map(_.getString(2)).toSet === keys(100).toSet) // full domain
    assert(served.map(_.getLong(5)).toSet === Set(700L)) // n_rows
  }

  test("KMV estimate: planted 10k distinct at k=256 lands within the ~1/sqrt(k-2) envelope") {
    import spark.implicits._
    val df = keys(10000).toDF("key").withColumn("g", lit("a"))
    val st = BottomKSample.bottomKStates(df, Seq("g"), "key", k = 256)
    val est = BottomKSample.bottomKServe(st, Seq("g"), sampleSize = 1)
      .collect().head.getLong(4)
    // stderr ~ 1/sqrt(254) ~ 6.3%; 4 sigma = 25%
    assert(math.abs(est / 10000.0 - 1.0) < 0.25,
      s"KMV estimate $est too far from 10000")
  }

  test("state is BIT-IDENTICAL under any partitioning and any merge tree (set-union semantics)") {
    import spark.implicits._
    val df = keys(5000).flatMap(k => Seq.fill(3)(k))
      .toDF("key").withColumn("g", lit("a"))
    def stateBytes(parts: Int, units: Int): Array[Byte] = {
      val d = df.repartition(parts)
        .withColumn("u", pmod(crc32(col("key")), lit(units)))
      val states = BottomKSample.bottomKStates(d, Seq("g", "u"), "key", k = 64)
      BottomKSample.bottomKCompact(states, Seq("g"))
        .collect().head.getAs[Array[Byte]]("sketch")
    }
    val base = stateBytes(1, 1)
    Seq((7, 3), (32, 5), (3, 11)).foreach { case (p, u) =>
      assert(java.util.Arrays.equals(base, stateBytes(p, u)),
        s"state differs at parts=$p units=$u — merge tree leaked into the state")
    }
    // idempotence: re-compacting already-merged state changes nothing
    val s1 = BottomKSketch.deserializeSummary(base)
    val s2 = BottomKSketch.deserializeSummary(base)
    assert(java.util.Arrays.equals(
      BottomKSketch.serializeSummary(s1.merge(s2)), base),
      "self-merge must be a no-op")
  }

  test("states survive a parquet round-trip and serve identically") {
    import spark.implicits._
    val df = keys(1000).toDF("key").withColumn("g",
      when(length(col("key")) > 5, lit("long")).otherwise(lit("short")))
    val st = BottomKSample.bottomKStates(df, Seq("g"), "key", k = 32)
    val dir = java.nio.file.Files.createTempDirectory("graft_bk_state").toString
    st.write.mode("overwrite").parquet(dir)
    val back = spark.read.parquet(dir)
    val a = BottomKSample.bottomKServe(st, Seq("g"), 32)
      .collect().map(_.toSeq).toSet
    val b = BottomKSample.bottomKServe(back, Seq("g"), 32)
      .collect().map(_.toSeq).toSet
    assert(a === b)
  }

  test("SQL surface end-to-end: graft_bk_agg / merge / distinct / sample") {
    import spark.implicits._
    BottomKSketch.register(spark)
    keys(300).toDF("key").createOrReplaceTempView("bk_keys")
    val row = spark.sql(
      """SELECT graft_bk_distinct(graft_bk_merge(st)) AS est,
        |       size(graft_bk_sample(graft_bk_merge(st), 10)) AS m
        |FROM (SELECT graft_bk_agg(key, 64) AS st FROM bk_keys
        |      GROUP BY length(key))""".stripMargin).collect().head
    // 300 distinct at k=64: the KMV path; generous envelope
    assert(math.abs(row.getLong(0) / 300.0 - 1.0) < 0.5)
    assert(row.getInt(1) === 10)
  }

  test("contract holes refused: mixed-k merge, k < 2, m < 1, non-foldable k") {
    import spark.implicits._
    val a = new BottomKSketch.BkSummary(8)
    val b = new BottomKSketch.BkSummary(16)
    keys(10).foreach(a.insert); keys(10).foreach(b.insert)
    val e = intercept[IllegalArgumentException](a.merge(b))
    assert(e.getMessage.contains("different k"))
    intercept[IllegalArgumentException](
      BottomKSketch.bkAgg(spark, col("key"), k = 1))
    intercept[IllegalArgumentException](
      BottomKSketch.bkSample(spark, col("st"), m = 0))
    BottomKSketch.register(spark)
    keys(5).toDF("key").createOrReplaceTempView("bk_badk")
    val sqlErr = intercept[Exception](
      spark.sql("SELECT graft_bk_agg(key, 1) FROM bk_badk").collect())
    assert(sqlErr.getMessage.contains(">= 2"))
  }

  test("null keys are skipped, not sampled") {
    import spark.implicits._
    val df = (keys(20).map(Option(_)) ++ Seq.fill(30)(Option.empty[String]))
      .toDF("key").withColumn("g", lit("a"))
    val st = BottomKSample.bottomKStates(df, Seq("g"), "key", k = 64)
    val served = BottomKSample.bottomKServe(st, Seq("g"), 64).collect()
    assert(served.length === 20)
    assert(served.map(_.getLong(4)).toSet === Set(20L))
    // n_rows counts non-null keys only
    assert(served.map(_.getLong(5)).toSet === Set(20L))
  }

  test("overlap, exact regime: both domains below k => jaccard_est IS the true Jaccard") {
    import spark.implicits._
    // A = k1..k30, B = k21..k50: |A∩B| = 10, |A∪B| = 50, J = 0.2
    val df = ((1 to 30).map(i => ("a", s"k$i")) ++
        (21 to 50).map(i => ("b", s"k$i")))
      .toDF("g", "key")
    val st = BottomKSample.bottomKStates(df, Seq("g"), "key", k = 128)
    val row = BottomKSample.bottomKOverlap(st, "g").collect().head
    assert(row.getString(0) === "a" && row.getString(1) === "b")
    assert(row.getInt(2) === 50)   // k_used = |union| (below k: exact)
    assert(row.getInt(3) === 10)   // overlap = |A∩B|
    assert(row.getDouble(4) === 0.2)
    // the containment primitives are EXACT below k too
    assert(row.getLong(5) === 30L) // distinct_a
    assert(row.getLong(6) === 30L) // distinct_b
    assert(row.getLong(7) === 50L) // union_est = |A∪B|
    // served containment ratios: |A∩B|/|A| = 10/30, exact both ways
    assert(row.getDouble(8) === 0.333333) // containment_a_in_b
    assert(row.getDouble(9) === 0.333333) // containment_b_in_a
  }

  test("overlap, estimator regime: planted 1/3 Jaccard at 5k-doc domains lands in the sampling envelope") {
    import spark.implicits._
    // A = 1..5000, B = 2501..7500: true J = 2500/7500 = 1/3
    val df = ((1 to 5000).map(i => ("a", s"k$i")) ++
        (2501 to 7500).map(i => ("b", s"k$i")))
      .toDF("g", "key")
    val st = BottomKSample.bottomKStates(df, Seq("g"), "key", k = 256)
    val row = BottomKSample.bottomKOverlap(st, "g").collect().head
    assert(row.getInt(2) === 256)
    // stderr ~ sqrt(J(1-J)/k) ~ 0.03; allow 5 sigma
    assert(math.abs(row.getDouble(4) - 1.0 / 3) < 0.15,
      s"overlap estimate ${row.getDouble(4)} too far from 1/3")
    // the cardinality primitives land in their own KMV envelopes, and
    // the SERVED containment ratio lands on the planted
    // |A∩B|/|A| = 2500/5000 = 0.5
    assert(math.abs(row.getLong(5) / 5000.0 - 1.0) < 0.25, s"distinct_a ${row.getLong(5)}")
    assert(math.abs(row.getLong(7) / 7500.0 - 1.0) < 0.25, s"union_est ${row.getLong(7)}")
    assert(math.abs(row.getDouble(8) - 0.5) < 0.2, s"containment_a_in_b ${row.getDouble(8)}")
    assert(math.abs(row.getDouble(9) - 0.5) < 0.2, s"containment_b_in_a ${row.getDouble(9)}")
  }

  test("overlap: disjoint domains serve 0, identical domains serve 1, mixed-k refused") {
    import spark.implicits._
    val disjoint = ((1 to 500).map(i => ("a", s"x$i")) ++
        (1 to 500).map(i => ("b", s"y$i"))).toDF("g", "key")
    val dSt = BottomKSample.bottomKStates(disjoint, Seq("g"), "key", k = 64)
    val d = BottomKSample.bottomKOverlap(dSt, "g").collect().head
    assert(d.getInt(3) === 0 && d.getDouble(4) === 0.0)
    val same = ((1 to 500) ++ (1 to 500)).zipWithIndex
      .map { case (i, j) => (if (j < 500) "a" else "b", s"x$i") }.toDF("g", "key")
    val sSt = BottomKSample.bottomKStates(same, Seq("g"), "key", k = 64)
    val s = BottomKSample.bottomKOverlap(sSt, "g").collect().head
    assert(s.getInt(3) === s.getInt(2) && s.getDouble(4) === 1.0)
    // mixed k refused with a clear message
    val a = new BottomKSketch.BkSummary(8); keys(10).foreach(a.insert)
    val b = new BottomKSketch.BkSummary(16); keys(10).foreach(b.insert)
    import org.apache.spark.sql.functions.lit
    BottomKSketch.register(spark)
    Seq((BottomKSketch.serializeSummary(a), BottomKSketch.serializeSummary(b)))
      .toDF("sa", "sb").createOrReplaceTempView("bk_mixed")
    val err = intercept[Exception](
      spark.sql("SELECT graft_bk_overlap(sa, sb) FROM bk_mixed").collect())
    assert(err.getMessage.contains("different k"), err.getMessage.take(300))
  }

  test("empty merged state serves 0, never crashes: graft_bk_merge over zero states / all-NULL rows") {
    import spark.implicits._
    BottomKSketch.register(spark)
    // merge over an all-NULL state column leaves the k=0 sentinel buffer
    Seq.fill(3)(Option.empty[Array[Byte]]).toDF("st")
      .createOrReplaceTempView("bk_null_states")
    val row = spark.sql(
      """SELECT graft_bk_distinct(graft_bk_merge(st)) AS est,
        |       size(graft_bk_sample(graft_bk_merge(st), 5)) AS m
        |FROM bk_null_states""".stripMargin).collect().head
    assert(row.getLong(0) === 0L)
    assert(row.getInt(1) === 0)
    // overlap of an empty state with itself: NULL jaccard, zero counts
    val ov = spark.sql(
      """SELECT graft_bk_overlap(graft_bk_merge(st), graft_bk_merge(st)) AS o
        |FROM bk_null_states""".stripMargin).collect().head.getStruct(0)
    assert(ov.getInt(0) === 0 && ov.isNullAt(2) && ov.isNullAt(6) && ov.isNullAt(7))
  }

  test("estimate overflow corner clamps to Long.MaxValue instead of wrapping negative") {
    // a synthetic full state whose k-th hash is tiny: hk = 1 (16 keys
    // colliding on hash 1, the ~2^-60 event) => (k-1)*2^60/1 >= 2^63
    val s = new BottomKSketch.BkSummary(16)
    (1 to 16).foreach { i => s.pairs += ((1L, s"k$i")) }
    assert(s.distinctEstimate === Long.MaxValue)
  }

  test("supplementary-plane keys: re-arrival dedup + round-trip hold under the UTF-8 tie order") {
    import spark.implicits._
    val exotic = Seq("𝒜", "z￿", "plain", "𝒜", "z￿")
    val df = (exotic ++ keys(10)).toDF("key").withColumn("g", lit("a"))
    val st = BottomKSample.bottomKStates(df, Seq("g"), "key", k = 64)
    val served = BottomKSample.bottomKServe(st, Seq("g"), 64).collect()
    assert(served.length === 13) // dedup held for the exotic keys
    assert(served.map(_.getString(2)).toSet === (exotic.toSet ++ keys(10)))
    val hs = served.sortBy(_.getInt(1)).map(_.getLong(3)).toSeq
    assert(hs === hs.sorted)
  }

  test("q72 one-pass grouped gate == five per-unit filtered scans folded batch-by-batch (named pin)") {
    // the r13 gate's ingest realism (five unit batches) restated as an
    // equality: the ONE-scan grouped form the gate now runs serves
    // row-identical output to sketching each pmod-unit in its own scan
    // and folding — the physical-independence claim behind switching
    // the gate to the true one-scan cost
    import org.apache.spark.sql.functions.{col, lit, pmod}
    val dir = "/root/testdata/sf0.001"
    val onePass = BottomKSample.q72BottomkSample(spark, dir)
      .collect().map(_.toSeq)
    val ev = Tables.events(spark, dir)
    val unitStates = (0 until 5).map(i =>
      BottomKSample.bottomKStates(ev.filter(pmod(col("event_id"), lit(5)) === i),
        Seq("event_type"), "user_id", k = 128))
    val folded = BottomKSample.bottomKServe(
        BottomKSample.bottomKCompact(unitStates.reduce(_ unionByName _),
          Seq("event_type")),
        Seq("event_type"), sampleSize = 16)
      .orderBy("event_type", "rank").collect().map(_.toSeq)
    assert(onePass.toSeq === folded.toSeq)
  }

  test("q73 gate: 10 unordered type pairs, ratios well-formed, overlap symmetric in its inputs") {
    val out = operators.BottomKSample
      .q73CorpusOverlap(spark, "/root/testdata/sf0.001").collect()
    assert(out.length === 10) // C(5,2) event-type pairs
    out.foreach { r =>
      assert(r.getString(0) < r.getString(1))
      assert(r.getInt(3) <= r.getInt(2))
      val j = r.getDouble(4)
      assert(j >= 0.0 && j <= 1.0)
    }
  }

  test("q72 gate: deterministic row count and the sample is the hash-bottom of the true distinct domain") {
    val out = operators.BottomKSample
      .q72BottomkSample(spark, "/root/testdata/sf0.001").collect()
    assert(out.nonEmpty)
    // exact path at sf0.001 (15 distinct user_ids < k): estimate exact
    val byType = out.groupBy(_.getString(0))
    byType.foreach { case (_, rows) =>
      assert(rows.map(_.getLong(4)).toSet.size === 1)
      val est = rows.head.getLong(4)
      if (est < 128) assert(rows.length.toLong === math.min(est, 16L))
    }
    // ranks are 1..m dense per type, hashes ascend
    byType.foreach { case (t, rows) =>
      val sorted = rows.sortBy(_.getInt(1))
      assert(sorted.map(_.getInt(1)).toSeq === (1 to rows.length))
      val hs = sorted.map(_.getLong(3)).toSeq
      assert(hs === hs.sorted, s"$t: sample hashes not ascending")
    }
  }
}
