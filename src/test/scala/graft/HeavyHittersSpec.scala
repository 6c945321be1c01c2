package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.HeavyHitters

/** The q71 family's contract is the Misra–Gries DETERMINISTIC
  * guarantee — every assertion is the worst-case bound, not a
  * tolerance: for any item x, `count_lo(x) ≤ true(x) ≤ count_lo(x) +
  * ⌊n/(k+1)⌋`, and every item with `true(x) > n/(k+1)` appears in the
  * summary, for ANY insertion order / partitioning / merge tree.
  */
class HeavyHittersSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  /** A skewed corpus: "hot" 500 times, "warm" 120, tail of 400
    * singletons — n = 1020, so with k = 16 the error bound is
    * ⌊1020/17⌋ = 60 and both hot (500 > 60) and warm (120 > 60) are
    * GUARANTEED present.
    */
  private def skewed = {
    import spark.implicits._
    (Seq.fill(500)("hot") ++ Seq.fill(120)("warm") ++
      (1 to 400).map(i => s"tail$i"))
      .zipWithIndex.map { case (item, i) => (i.toLong, item) }
      .toDF("id", "item").withColumn("g", lit("a"))
  }

  test("guaranteed-frequent items are present with containing bounds, under any partitioning") {
    val truth = Map("hot" -> 500L, "warm" -> 120L)
    Seq(1, 7, 32).foreach { p =>
      val st = HeavyHitters.heavyHitterStates(
        skewed.repartition(p), Seq("g"), "item", k = 16)
      val top = HeavyHitters.heavyHitterTopK(st, Seq("g"), topK = 16)
      val served = top.collect().map(r =>
        r.getString(2) -> ((r.getLong(3), r.getLong(4)))).toMap
      truth.foreach { case (item, n) =>
        assert(served.contains(item),
          s"p=$p: guaranteed-frequent '$item' missing from ${served.keys}")
        val (lo, hi) = served(item)
        assert(lo <= n && n <= hi,
          s"p=$p: '$item' true $n outside served [$lo, $hi]")
        assert(hi - lo <= 60L, s"p=$p: bound width ${hi - lo} exceeds n/(k+1)")
      }
      // the hot item must rank first — its floor (500-60) clears any
      // other item's ceiling (120+60)
      assert(top.orderBy("rank").collect().head.getString(2) === "hot")
      // state never exceeds k counters
      val entries = top.count()
      assert(entries <= 16L, s"p=$p: $entries counters served from a k=16 state")
    }
  }

  test("distinct items <= k degrades to EXACT counts (no evictions ever)") {
    import spark.implicits._
    val small = Seq("a", "a", "a", "b", "b", "c").zipWithIndex
      .map { case (x, i) => (i.toLong, x) }.toDF("id", "item")
      .withColumn("g", lit("z"))
    val top = HeavyHitters.heavyHitterTopK(
      HeavyHitters.heavyHitterStates(small.repartition(5), Seq("g"), "item", k = 16),
      Seq("g"), topK = 16)
    val served = top.collect().map(r =>
      (r.getString(2), r.getLong(3), r.getLong(4))).toSeq
    // with zero evictions the stored counts are exact... but the BOUND
    // still reports n/(k+1) = 6/17 = 0 slack: lo == hi == truth
    assert(served === Seq(("a", 3L, 3L), ("b", 2L, 2L), ("c", 1L, 1L)))
  }

  test("append+compact keeps the guarantee at LSM depth 2; n_rows stays exact") {
    val parts = (0 until 5).map(i =>
      HeavyHitters.heavyHitterStates(
        skewed.filter(pmod(col("id"), lit(5)) === i), Seq("g"), "item", k = 16))
    val firstTwo = HeavyHitters.heavyHitterCompact(
      parts.take(2).reduce(_ unionByName _), Seq("g"))
    val state = HeavyHitters.heavyHitterCompact(
      (firstTwo +: parts.drop(2)).reduce(_ unionByName _), Seq("g"))
    assert(state.count() === 1L)
    val top = HeavyHitters.heavyHitterTopK(state, Seq("g"), topK = 16)
    val rows = top.collect()
    assert(rows.head.getLong(5) === 1020L, "n_rows must stay exact through compaction")
    val served = rows.map(r => r.getString(2) -> ((r.getLong(3), r.getLong(4)))).toMap
    Seq("hot" -> 500L, "warm" -> 120L).foreach { case (item, n) =>
      assert(served.contains(item), s"'$item' lost in compaction")
      val (lo, hi) = served(item)
      assert(lo <= n && n <= hi, s"'$item' true $n outside [$lo, $hi] after compaction")
    }
  }

  test("state is bounded and parquet round-trips; empty and all-null groups serve empty") {
    import spark.implicits._
    // 100k rows over 50k distinct items: the exact groupBy would hold
    // 50k rows; the MG state holds <= k entries and bounded bytes
    val big = (1 to 100000).map(i => (i.toLong, s"item${i % 50000}"))
      .toDF("id", "item").withColumn("g", lit("a"))
    val st = HeavyHitters.heavyHitterStates(big, Seq("g"), "item", k = 64)
    val bytes = st.select(length(col("sketch"))).head.getInt(0)
    assert(bytes < 8 * 1024, s"state grew to $bytes bytes for 50k distinct items")
    val dir = java.nio.file.Files.createTempDirectory("mg_state").toString
    st.write.mode("overwrite").parquet(dir)
    val a = HeavyHitters.heavyHitterTopK(st, Seq("g"), 10).collect().map(_.toSeq)
    val b = HeavyHitters.heavyHitterTopK(
      spark.read.parquet(dir), Seq("g"), 10).collect().map(_.toSeq)
    assert(a.toSeq === b.toSeq, "state must serve identically after a parquet round-trip")
    // null items skipped; an all-null group serves the empty summary
    val nulls = Seq[(java.lang.Long, String)]((1L, null), (2L, null))
      .toDF("id", "item").withColumn("g", lit("n"))
    val topn = HeavyHitters.heavyHitterTopK(
      HeavyHitters.heavyHitterStates(nulls, Seq("g"), "item", k = 4),
      Seq("g"), 10).collect()
    assert(topn.length === 1 && topn.head.isNullAt(2) && topn.head.getLong(5) === 0L)
  }

  test("q71 gate: the served top-5 per type is exactly the five planted hots, bounds contain truth") {
    val out = HeavyHitters.q71HeavyHitters(spark, sf)
    val rows = out.collect()
    val types = rows.map(_.getString(0)).distinct
    assert(types.nonEmpty)
    // exact truth for the planted column, for the bound check
    val ev = Tables.events(spark, sf)
      .withColumn("__hh",
        when(pmod(col("event_id"), lit(10)) < 5,
          concat(lit("hot"), pmod(col("event_id"), lit(10))))
          .otherwise(concat(lit("cold"), pmod(col("event_id"), lit(997)))))
    val truth = ev.groupBy("event_type", "__hh").count().collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val hots = Set("hot0", "hot1", "hot2", "hot3", "hot4")
    types.foreach { t =>
      val served = rows.filter(_.getString(0) == t)
      assert(served.map(_.getString(2)).toSet === hots,
        s"type $t: top-5 must be exactly the planted hots, got ${served.map(_.getString(2)).toSeq}")
      served.foreach { r =>
        val n = truth((t, r.getString(2)))
        assert(r.getLong(3) <= n && n <= r.getLong(4),
          s"type $t ${r.getString(2)}: true $n outside [${r.getLong(3)}, ${r.getLong(4)}]")
      }
    }
    // deterministic served shape: 5 rows per type
    assert(rows.length === types.length * 5)
  }

  test("plan shape: the state build is ONE mergeable aggregation") {
    val ev = Tables.events(spark, sf).withColumn("__hh", col("user_id").cast("string"))
    val st = HeavyHitters.heavyHitterStates(ev, Seq("event_type"), "__hh", k = 32)
    st.collect()
    val plan = st.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert("ObjectHashAggregate".r.findAllIn(plan).size >= 2, plan.take(2000))
    assert("Exchange".r.findAllIn(plan).size === 1, plan.take(2000))
  }
}
