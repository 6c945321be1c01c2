package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.GkQuantile
import graft.operators.QuantileSketch

/** The q70 family's contract is a DETERMINISTIC rank bound, so every
  * assertion here is a hard worst-case check, not a tolerance picked
  * to pass: for ε-approximate GK state, any served quantile φ must be
  * an input value whose exact rank r satisfies
  * `⌈φ·n⌉ − ε·n ≤ r ≤ ⌈φ·n⌉ + ε·n` (rank = #values ≤ v, both rank
  * endpoints of a tied run admitted).
  */
class QuantileSketchSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"
  private val Probs = Seq(0.25, 0.5, 0.75, 0.95)
  private val Eps = 0.01

  /** rank interval of value v in sorted: [#strictly-below + 1, #<=]. */
  private def rankBounds(sorted: Array[Double], v: Double): (Long, Long) = {
    val below = sorted.count(_ < v).toLong
    val atMost = sorted.count(_ <= v).toLong
    (below + 1, atMost)
  }

  private def assertWithinRankBound(sorted: Array[Double], phi: Double,
      served: Double, eps: Double, ctx: String): Unit = {
    val n = sorted.length.toLong
    val target = math.ceil(phi * n).toLong.max(1L)
    val (lo, hi) = rankBounds(sorted, served)
    val slack = math.ceil(eps * n).toLong
    assert(lo <= target + slack && hi >= target - slack,
      s"$ctx: served $served has rank [$lo,$hi], target $target ± $slack over n=$n")
    // a GK summary only ever serves values it has SEEN
    assert(sorted.contains(served), s"$ctx: served $served is not an input value")
  }

  private def servedMap(df: DataFrame): Map[(String, Double), Double] =
    df.collect().map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(2)).toMap

  test("gk state serves every quantile within the deterministic rank bound") {
    val ev = Tables.events(spark, sf)
      .select(col("event_type"), col("value").cast("decimal(12,2)").cast("double").as("v"))
      .filter(col("v").isNotNull)
    val exact = ev.collect().map(r => r.getString(0) -> r.getDouble(1))
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).sorted }
    val out = QuantileSketch.quantileSketchRollup(
      QuantileSketch.quantileSketchStates(ev, Seq("event_type"), "v"),
      Seq("event_type"), Probs)
    servedMap(out).foreach { case ((g, phi), v) =>
      assertWithinRankBound(exact(g), phi, v, Eps, s"group $g phi $phi")
    }
    // n_rows is exact
    val counts = out.select(col("event_type"), col("n_rows")).distinct()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (g, vs) => assert(counts(g) === vs.length.toLong) }
  }

  test("append+compact state equals the guarantee of a fresh build; rollup never touches raw data") {
    val ev = Tables.events(spark, sf)
      .select(col("event_type"), col("value").cast("decimal(12,2)").cast("double").as("v"))
      .filter(col("v").isNotNull)
    val exact = ev.collect().map(r => r.getString(0) -> r.getDouble(1))
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).sorted }
    // five "daily" appends, compacted twice (LSM depth 2) — the ε
    // guarantee must survive any re-compaction depth
    val units = (0 until 5).map(i =>
      QuantileSketch.quantileSketchStates(
        ev.filter(pmod(xxhash64(col("v")), lit(5)) === i),
        Seq("event_type"), "v"))
    val firstTwo = QuantileSketch.quantileSketchCompact(
      units.take(2).reduce(_ unionByName _), Seq("event_type"))
    val state = QuantileSketch.quantileSketchCompact(
      (firstTwo +: units.drop(2)).reduce(_ unionByName _), Seq("event_type"))
    // one row per key after compaction
    val keys = state.groupBy("event_type").count().collect()
    assert(keys.forall(_.getLong(1) === 1L), keys.mkString(","))
    val out = QuantileSketch.quantileSketchRollup(state, Seq("event_type"), Probs)
    servedMap(out).foreach { case ((g, phi), v) =>
      assertWithinRankBound(exact(g), phi, v, Eps, s"compacted $g phi $phi")
    }
    // n_states records the maintenance history; n_rows stays exact
    out.select("event_type", "n_rows", "n_states").distinct().collect()
      .foreach { r =>
        assert(r.getLong(2) === 1L)
        assert(r.getLong(1) === exact(r.getString(0)).length.toLong)
      }
  }

  test("partition independence: the bound holds under any repartitioning (merge-order-proof)") {
    val ev = Tables.events(spark, sf)
      .select(col("event_type"), col("value").cast("decimal(12,2)").cast("double").as("v"))
      .filter(col("v").isNotNull)
    val exact = ev.collect().map(r => r.getString(0) -> r.getDouble(1))
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).sorted }
    Seq(1, 7, 32).foreach { p =>
      val out = QuantileSketch.quantileSketchRollup(
        QuantileSketch.quantileSketchStates(ev.repartition(p),
          Seq("event_type"), "v"),
        Seq("event_type"), Probs)
      servedMap(out).foreach { case ((g, phi), v) =>
        assertWithinRankBound(exact(g), phi, v, Eps, s"p=$p $g phi $phi")
      }
    }
  }

  test("state size is sublinear: 100k values compress to KBs and 10x data grows state by far less than 10x") {
    import spark.implicits._
    // adversarial for a histogram: ALL DISTINCT values (the exact
    // q30/q65 family would hold 100k rows of state here)
    val small = (1 to 10000).map(_.toDouble).toDF("v").withColumn("g", lit("a"))
    val big = (1 to 100000).map(_.toDouble).toDF("v").withColumn("g", lit("a"))
    def stateBytes(df: DataFrame): Int =
      QuantileSketch.quantileSketchStates(df, Seq("g"), "v")
        .select(length(col("sketch"))).head.getInt(0)
    val sSmall = stateBytes(small)
    val sBig = stateBytes(big)
    // GK at ε=0.01 holds O((1/ε)·log(εn)) tuples ≈ low thousands of
    // 24-byte samples — assert a hard ceiling with headroom
    assert(sBig < 200 * 1024, s"state grew to $sBig bytes for 100k distinct values")
    assert(sBig < 4 * sSmall, s"10x data grew state $sSmall -> $sBig (not sublinear)")
    // and the bound still holds on the all-distinct stress input
    val out = QuantileSketch.quantileSketchRollup(
      QuantileSketch.quantileSketchStates(big, Seq("g"), "v"), Seq("g"), Probs)
    val sorted = (1 to 100000).map(_.toDouble).toArray
    servedMap(out.select(col("g"), col("quantile"), col("value"), col("n_rows"), col("n_states")))
      .foreach { case ((_, phi), v) =>
        assertWithinRankBound(sorted, phi, v, Eps, s"stress phi $phi")
      }
  }

  test("empty and all-null groups serve null; values-present groups are unaffected") {
    import spark.implicits._
    val df = Seq[(String, java.lang.Double)](
      ("a", 1.0), ("a", 2.0), ("a", 3.0), ("b", null), ("b", null))
      .toDF("g", "v")
    val out = QuantileSketch.quantileSketchRollup(
      QuantileSketch.quantileSketchStates(df, Seq("g"), "v"), Seq("g"),
      Seq(0.5))
      .collect().map(r => r.getString(0) ->
        (if (r.isNullAt(2)) None else Some(r.getDouble(2)), r.getLong(3))).toMap
    assert(out("a") === ((Some(2.0), 3L)))
    assert(out("b")._1 === None)
    assert(out("b")._2 === 0L)
  }

  test("persisted state round-trips through parquet and serves identically (stable format)") {
    import spark.implicits._
    val df = (1 to 5000).map(i => ("g" + (i % 3), i.toDouble)).toDF("g", "v")
    val state = QuantileSketch.quantileSketchStates(df, Seq("g"), "v")
    val dir = java.nio.file.Files.createTempDirectory("gk_state").toString
    state.write.mode("overwrite").parquet(dir)
    val reloaded = spark.read.parquet(dir)
    val a = servedMap(QuantileSketch.quantileSketchRollup(state, Seq("g"), Probs))
    val b = servedMap(QuantileSketch.quantileSketchRollup(reloaded, Seq("g"), Probs))
    assert(a === b, "state must serve the same quantiles after a parquet round-trip")
  }

  test("q70 gate runs and stays inside the bound vs the exact oracle ranks") {
    val out = operators.QuantileSketch.q70QuantileSketch(spark, sf)
    val ev = Tables.events(spark, sf)
      .select(col("event_type"), col("value").cast("decimal(12,2)").cast("double").as("v"))
      .filter(col("v").isNotNull)
    val exact = ev.collect().map(r => r.getString(0) -> r.getDouble(1))
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).sorted }
    assert(out.count() === exact.size.toLong * Probs.size)
    servedMap(out).foreach { case ((g, phi), v) =>
      assertWithinRankBound(exact(g), phi, v, Eps, s"q70 $g phi $phi")
    }
  }

  test("sketchEdges drives the PSI drift monitor: same verdicts as exact edges, bins off by at most eps*n") {
    import spark.implicits._
    import graft.operators.Relational
    // reference: g and h both uniform on 1..2000 (all-distinct — the
    // exact histogram would hold 2000 state rows per group; the sketch
    // holds KBs); current: g shifted up by 50% (drift), h resampled
    val ref = (1 to 2000).flatMap(i =>
      Seq(("g", i.toDouble), ("h", i.toDouble))).toDF("grp", "v")
    val cur = ((1 to 1000).map(i => ("g", 1000.0 + i * 1.5)) ++
      (1 to 1000).map(i => ("h", i * 2.0))).toDF("grp", "v")
    val exactEdges = Relational.referenceEdges(ref, "grp", "v")
    val gkEdges = QuantileSketch.sketchEdges(
      QuantileSketch.quantileSketchStates(ref, Seq("grp"), "v"), "grp")
    // every sketch edge is within the deterministic rank bound of the
    // exact decile edge: at n=2000, eps=0.01 -> <= 20 ranks = 20 units
    val ex = exactEdges.collect().map(r => r.getString(0) ->
      (1 to 9).map(i => r.getDouble(i))).toMap
    val gk = gkEdges.collect().map(r => r.getString(0) ->
      (1 to 9).map(i => r.getDouble(i))).toMap
    ex.keys.foreach { g =>
      ex(g).zip(gk(g)).zipWithIndex.foreach { case ((e, s), i) =>
        assert(math.abs(e - s) <= 21.0,
          s"group $g edge $i: exact $e vs sketch $s — outside the rank bound")
      }
    }
    // the composed monitor: same binCounts/psiFromCounts machinery,
    // just different edge provenance — verdicts must agree
    def psi(edges: org.apache.spark.sql.DataFrame): Map[String, Double] =
      Relational.psiFromCounts(
        Relational.binCounts(ref, "grp", "v", edges),
        Relational.binCounts(cur, "grp", "v", edges), "grp")
        .collect().map(r => r.getString(0) -> r.getDouble(7)).toMap
    val pe = psi(exactEdges); val pg = psi(gkEdges)
    assert(pe("g") > pe("h"), s"exact path must flag the planted drift: $pe")
    assert(pg("g") > pg("h"), s"sketch path must flag the planted drift: $pg")
    // edge perturbation <= eps*n ranks keeps PSI close on 10% bins
    pe.keys.foreach { g =>
      assert(math.abs(pe(g) - pg(g)) < 0.05,
        s"group $g: exact PSI ${pe(g)} vs sketch PSI ${pg(g)}")
    }
  }

  test("merging GK states built at different eps hard-fails; empty states merge freely") {
    import spark.implicits._
    val df = (1 to 1000).map(i => ("a", i.toDouble)).toDF("g", "v")
    val s1 = QuantileSketch.quantileSketchStates(df, Seq("g"), "v", relativeError = 0.01)
    val s5 = QuantileSketch.quantileSketchStates(df, Seq("g"), "v", relativeError = 0.05)
    // mixed-eps compaction must fail loudly — the merged state would
    // report one side's eps while honoring neither bound
    val ex = intercept[Exception] {
      QuantileSketch.quantileSketchCompact(s1.unionByName(s5), Seq("g")).collect()
    }
    val msgs = Iterator.iterate(ex: Throwable)(_.getCause)
      .takeWhile(_ != null).take(10).map(_.toString).mkString("\n")
    assert(msgs.contains("relativeError"),
      s"expected the eps-mismatch contract message, got:\n$msgs")
    // an all-null unit contributes the EMPTY state, which merges into
    // any eps without tripping the contract (its eps is immaterial)
    val empty = QuantileSketch.quantileSketchStates(
      Seq(("a", null: java.lang.Double)).toDF("g", "v"), Seq("g"), "v",
      relativeError = 0.05)
    val merged = QuantileSketch.quantileSketchCompact(
      s1.unionByName(empty), Seq("g"))
    assert(merged.count() === 1L)
    val out = QuantileSketch.quantileSketchRollup(merged, Seq("g"), Seq(0.5))
      .select("value").head.getDouble(0)
    assert(out >= 480.0 && out <= 520.0, s"median drifted to $out")
  }

  test("generic states sketch at full double resolution; quantization is opt-in") {
    import spark.implicits._
    // small-magnitude loss values: decimal(12,2) quantization would
    // collapse them all to 0.00/0.01 — the default must preserve them
    val losses = (1 to 1000).map(i => ("m", i / 100000.0)).toDF("g", "v")
    val served = QuantileSketch.quantileSketchRollup(
      QuantileSketch.quantileSketchStates(losses, Seq("g"), "v"), Seq("g"), Seq(0.5))
      .select("value").head.getDouble(0)
    assert(served > 0.004 && served < 0.006, s"median of 1e-5..1e-2 served as $served")
    // and the explicit opt-in reproduces the quantized behavior
    val q = QuantileSketch.quantileSketchRollup(
      QuantileSketch.quantileSketchStates(losses, Seq("g"), "v",
        quantizeTo = Some("decimal(12,2)")), Seq("g"), Seq(0.5))
      .select("value").head.getDouble(0)
    assert(q === 0.0 || q === 0.01, s"quantized median should hit the cent grid, got $q")
  }

  test("plan shape: the state build is ONE mergeable aggregation — partials fold map-side, no raw-value shuffle") {
    val ev = Tables.events(spark, sf)
    val st = QuantileSketch.quantileSketchStates(ev, Seq("event_type"), "value")
    st.collect()
    val plan = st.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    // ObjectHashAggregate partial + final pair around one exchange
    assert("ObjectHashAggregate".r.findAllIn(plan).size >= 2,
      s"expected partial+final ObjectHashAggregate:\n${plan.take(2000)}")
    assert("Exchange".r.findAllIn(plan).size === 1,
      s"one exchange expected:\n${plan.take(2000)}")
  }
}
