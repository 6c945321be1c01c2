package graft

import org.apache.spark.sql.functions._
import graft.functions.WeightedReservoir
import graft.operators.ReservoirSample

/** The q74 family inherits the q72 contract: top-k by a fixed
  * deterministic key is a pure SET property, so the state is
  * BIT-IDENTICAL for any insertion order, partitioning, or merge tree,
  * and everything served (ids, weights, rank order, round-2 keys) is
  * engine-independent given the pinned md5-derived u.
  */
class WeightedReservoirSpec extends SparkSpec {

  private def rows(n: Int) = (1 to n).map(i => (s"id$i", (i % 97 + 3).toDouble))

  test("wkey IS Spark SQL's q37 key spelling — the pinned cross-engine arithmetic") {
    import spark.implicits._
    val df = (rows(300) :+ (("", 5.0)) :+ (("héllo", 0.2)) :+ (("a\tb", 1e9)))
      .toDF("id", "w")
      .withColumn("sql_u48",
        expr("CAST(conv(substr(md5(id), 1, 12), 16, 10) AS BIGINT)"))
      .withColumn("sql_wkey",
        expr("greatest(w, 1.0D) / -ln((CAST(conv(substr(md5(id), 1, 12), 16, 10) AS BIGINT) + 0.5D) / 281474976710656.0D)"))
    df.collect().foreach { r =>
      val (id, w) = (r.getString(0), r.getDouble(1))
      assert(WeightedReservoir.hash48(id) === r.getLong(2),
        s"hash48 disagrees with the SQL spelling for '$id'")
      assert(WeightedReservoir.wkey(id, w) === r.getDouble(3),
        s"wkey disagrees with the SQL spelling for ('$id', $w)")
    }
  }

  test("wkey == the SQL spelling with codegen OFF too (interpreted-eval path pinned, r14 ADVICE)") {
    // Spark's interpreted eval of `ln` may route through Math.log where
    // codegen calls StrictMath.log — a 1-ulp difference on some JDKs.
    // Pin BOTH paths on the platform the gates run on: disable
    // whole-stage codegen AND force the expression factory to the
    // interpreted evaluator, then require bit-equality with wkey.
    import spark.implicits._
    val ws = "spark.sql.codegen.wholeStage"
    val fm = "spark.sql.codegen.factoryMode"
    val (ws0, fm0) = (spark.conf.get(ws), spark.conf.get(fm, "FALLBACK"))
    try {
      spark.conf.set(ws, "false")
      spark.conf.set(fm, "NO_CODEGEN")
      val df = (rows(300) :+ (("", 5.0)) :+ (("héllo", 0.2)) :+ (("a\tb", 1e9)))
        .toDF("id", "w")
        .withColumn("sql_wkey",
          expr("greatest(w, 1.0D) / -ln((CAST(conv(substr(md5(id), 1, 12), 16, 10) AS BIGINT) + 0.5D) / 281474976710656.0D)"))
      df.collect().foreach { r =>
        val (id, w) = (r.getString(0), r.getDouble(1))
        assert(WeightedReservoir.wkey(id, w) === r.getDouble(2),
          s"wkey disagrees with the INTERPRETED SQL spelling for ('$id', $w)")
      }
    } finally {
      spark.conf.set(ws, ws0)
      spark.conf.set(fm, fm0)
    }
  }

  test("exact below k: fewer than k rows => the sample IS the full set, weight-rank ordered") {
    import spark.implicits._
    val df = rows(20).toDF("id", "w").withColumn("g", lit("a"))
    val st = ReservoirSample.reservoirStates(df, Seq("g"), "id", "w", k = 64)
    val served = ReservoirSample.reservoirServe(st, Seq("g"), sampleSize = 64)
      .collect()
    assert(served.length === 20)
    assert(served.map(_.getString(2)).toSet === rows(20).map(_._1).toSet)
    assert(served.map(_.getLong(5)).toSet === Set(20L)) // n_rows
    // rank order is wkey descending (full-precision inside the state)
    val byRank = served.sortBy(_.getInt(1))
    val keys = byRank.map(r => WeightedReservoir.wkey(r.getString(2), r.getDouble(3)))
    assert(keys.zip(keys.tail).forall { case (a, b) => a >= b },
      "sample not in descending key order")
  }

  test("state is BIT-IDENTICAL under any partitioning and any merge tree (top-k set-union)") {
    import spark.implicits._
    val df = rows(5000).flatMap(r => Seq.fill(3)(r))
      .toDF("id", "w").withColumn("g", lit("a"))
    def stateBytes(parts: Int, units: Int): Array[Byte] = {
      val d = df.repartition(parts)
        .withColumn("u", pmod(crc32(col("id")), lit(units)))
      val states = ReservoirSample.reservoirStates(d, Seq("g", "u"), "id", "w", k = 48)
      ReservoirSample.reservoirCompact(states, Seq("g"))
        .collect().head.getAs[Array[Byte]]("sketch")
    }
    val base = stateBytes(1, 1)
    Seq((7, 3), (32, 5), (3, 11)).foreach { case (p, u) =>
      assert(java.util.Arrays.equals(base, stateBytes(p, u)),
        s"state differs at parts=$p units=$u — merge tree leaked into the state")
    }
    // idempotence: self-merge is a no-op
    val s1 = WeightedReservoir.deserializeSummary(base)
    val s2 = WeightedReservoir.deserializeSummary(base)
    assert(java.util.Arrays.equals(
      WeightedReservoir.serializeSummary(s1.merge(s2)), base),
      "self-merge must be a no-op")
  }

  test("weight-proportionality: a 50x-weighted minority wins most of the sample") {
    import spark.implicits._
    // 200 heavy rows (w=5000) among 2000 light rows (w=100): heavies
    // carry ~1/3 of total mass but E[key] scales with w, so the top-32
    // should be dominated by heavy rows — the deterministic analog of
    // the A-ES inclusion property (exact count fixed by the md5 hash)
    val df = ((1 to 200).map(i => (s"heavy$i", 5000.0)) ++
        (1 to 2000).map(i => (s"light$i", 100.0)))
      .toDF("id", "w").withColumn("g", lit("a"))
    val st = ReservoirSample.reservoirStates(df, Seq("g"), "id", "w", k = 32)
    val served = ReservoirSample.reservoirServe(st, Seq("g"), 32).collect()
    val heavies = served.count(_.getString(2).startsWith("heavy"))
    assert(heavies >= 24, s"only $heavies/32 heavy rows sampled")
  }

  test("states survive a parquet round-trip and serve identically") {
    import spark.implicits._
    val df = rows(1000).toDF("id", "w").withColumn("g",
      when(length(col("id")) > 4, lit("long")).otherwise(lit("short")))
    val st = ReservoirSample.reservoirStates(df, Seq("g"), "id", "w", k = 24)
    val dir = java.nio.file.Files.createTempDirectory("graft_wr_state").toString
    st.write.mode("overwrite").parquet(dir)
    val back = spark.read.parquet(dir)
    val a = ReservoirSample.reservoirServe(st, Seq("g"), 24)
      .collect().map(_.toSeq).toSet
    val b = ReservoirSample.reservoirServe(back, Seq("g"), 24)
      .collect().map(_.toSeq).toSet
    assert(a === b)
  }

  test("SQL surface end-to-end: graft_wr_agg / merge / sample") {
    import spark.implicits._
    WeightedReservoir.register(spark)
    rows(300).toDF("id", "w").createOrReplaceTempView("wr_rows")
    val row = spark.sql(
      """SELECT size(graft_wr_sample(graft_wr_merge(st), 10)) AS m,
        |       graft_wr_sample(graft_wr_merge(st), 1)[0].id AS top_id
        |FROM (SELECT graft_wr_agg(id, w, 32) AS st FROM wr_rows
        |      GROUP BY length(id))""".stripMargin).collect().head
    assert(row.getInt(0) === 10)
    assert(row.getString(1).nonEmpty)
  }

  test("contract holes refused: mixed-k merge, k < 1, m < 1; null id/weight skipped; sub-1 weights clamp") {
    import spark.implicits._
    val a = new WeightedReservoir.WrSummary(8)
    val b = new WeightedReservoir.WrSummary(16)
    rows(10).foreach { case (id, w) => a.insert(id, w); b.insert(id, w) }
    val e = intercept[IllegalArgumentException](a.merge(b))
    assert(e.getMessage.contains("different k"))
    intercept[IllegalArgumentException](
      WeightedReservoir.wrAgg(spark, col("id"), col("w"), k = 0))
    intercept[IllegalArgumentException](
      WeightedReservoir.wrSample(spark, col("st"), m = 0))
    // null id or null weight = skipped (no identity / no mass)
    val df = Seq((Option("x"), Option(5.0)), (Option.empty[String], Option(5.0)),
        (Option("y"), Option.empty[Double]))
      .toDF("id", "w").withColumn("g", lit("a"))
    val served = ReservoirSample.reservoirServe(
      ReservoirSample.reservoirStates(df, Seq("g"), "id", "w", k = 8),
      Seq("g"), 8).collect()
    assert(served.length === 1 && served.head.getString(2) === "x")
    assert(served.head.getLong(5) === 1L)
    // weights below 1 clamp to 1: both keys equal the unweighted key
    assert(WeightedReservoir.wkey("z", 0.001) === WeightedReservoir.wkey("z", 1.0))
  }

  test("empty merged state serves an empty sample, never crashes") {
    import spark.implicits._
    WeightedReservoir.register(spark)
    Seq.fill(3)(Option.empty[Array[Byte]]).toDF("st")
      .createOrReplaceTempView("wr_null_states")
    val row = spark.sql(
      """SELECT size(graft_wr_sample(graft_wr_merge(st), 5)) AS m
        |FROM wr_null_states""".stripMargin).collect().head
    assert(row.getInt(0) === 0)
  }

  test("q74 one-pass grouped gate == four per-unit filtered scans folded batch-by-batch (named pin)") {
    import org.apache.spark.sql.functions.{col, lit, pmod}
    val dir = "/root/testdata/sf0.001"
    val onePass = ReservoirSample.q74ReservoirSample(spark, dir)
      .collect().map(_.toSeq)
    val docs = Tables.documents(spark, dir)
    val unitStates = (0 until 4).map(i =>
      ReservoirSample.reservoirStates(
        docs.filter(pmod(col("doc_id"), lit(4)) === i),
        Seq("source"), "doc_id", "n_chars", k = 64))
    val folded = ReservoirSample.reservoirServe(
        ReservoirSample.reservoirCompact(unitStates.reduce(_ unionByName _),
          Seq("source")),
        Seq("source"), sampleSize = 16)
      .withColumnRenamed("id", "doc_id")
      .orderBy("source", "smp_rank").collect().map(_.toSeq)
    assert(onePass.toSeq === folded.toSeq)
  }

  test("q74 gate serves the SAME ranking q37's direct weighted sample computes (state == direct)") {
    // the factoring claim: the state path (per-unit top-64 folded,
    // top-16 served) must equal the direct q37-style window ranking —
    // ids AND rank order, per source
    val dir = "/root/testdata/sf0.001"
    val fromState = ReservoirSample.q74ReservoirSample(spark, dir)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getString(2)))
    val direct = graft.operators.Relational.weightedSample(
        Tables.documents(spark, dir)
          .select(col("doc_id"), col("source"), col("n_chars")),
        "source", "doc_id", "n_chars", 16)
      .select(col("source"), col("smp_rank"), col("doc_id").cast("string"))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getString(2)))
    // q37 tie-breaks by numeric doc_id, the state by its string form —
    // ties between different ids cannot occur in a continuous key, so
    // the rankings must agree exactly
    assert(fromState.sortBy(t => (t._1, t._2)).toSeq ===
      direct.sortBy(t => (t._1, t._2)).toSeq)
  }
}
