package graft.functions

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets

import scala.collection.mutable

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, IntegerType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Mergeable heavy-hitters sketch STATE (Misra–Gries 1982, merge rule
  * from Agarwal et al. 2013 "Mergeable Summaries") — the fourth and
  * last classic mergeable summary next to q32's HLL (distinct), q50's
  * count-min (point frequency), and q70's GK (quantiles): at most `k`
  * (item, counter) pairs whose DETERMINISTIC guarantee is
  *
  *   `stored(x) ≤ true(x) ≤ stored(x) + ⌊n/(k+1)⌋`  for every item x,
  *   and every item with `true(x) > n/(k+1)` is PRESENT in the summary
  *
  * — for ANY insertion order, ANY partitioning, ANY merge tree (the
  * Agarwal et al. merge — add counts, then subtract the (k+1)-th
  * largest and drop non-positives — preserves the bound additively).
  * Which counters the summary carries for NON-frequent items does
  * depend on order; the guarantee above is what is deterministic, and
  * it is what the specs pin.
  *
  * Where count-min answers "how often does THIS item occur" (point
  * query, needs the item in hand), this answers "WHICH items are
  * frequent" without knowing them in advance — the top-domain /
  * hot-key / dominant-template question a corpus pipeline asks first.
  *
  * Three expressions, registered like the GK family:
  *  - `graft_mg_agg(item, k)`      — items → one binary state
  *  - `graft_mg_merge(state)`      — binary states → merged state
  *  - `graft_mg_topk(state, topK)` — state → array<struct<item,
  *    count_lo, count_hi>> sorted (count_lo desc, item asc)
  */
object MisraGries {

  private val FormatVersion: Byte = 1

  /** Mutable aggregation buffer: classic MG with the amortized-O(1)
    * decrement (each decrement step removes total mass ≥ k+1, so
    * decrements happen at most n/(k+1) times).
    */
  final class MgSummary(val k: Int) {
    var n: Long = 0L
    val counts: mutable.HashMap[String, Long] = mutable.HashMap.empty

    def insert(item: String): Unit = {
      n += 1
      counts.get(item) match {
        case Some(c) => counts.update(item, c + 1)
        case None =>
          if (counts.size < k) counts.update(item, 1L)
          else {
            // decrement all, drop zeros (the arriving item's implicit
            // +1 cancels against the global −1)
            val dead = mutable.ArrayBuffer.empty[String]
            counts.mapValuesInPlace((_, c) => c - 1)
            counts.foreach { case (key, c) => if (c <= 0) dead += key }
            dead.foreach(counts.remove)
          }
      }
    }

    /** Agarwal et al. merge: add counts, then if over capacity subtract
      * the (k+1)-th largest counter from all and drop non-positives.
      */
    def merge(other: MgSummary): MgSummary = {
      require(other.k == k,
        s"cannot merge Misra-Gries states of different k: $k vs ${other.k}")
      n += other.n
      other.counts.foreach { case (item, c) =>
        counts.update(item, counts.getOrElse(item, 0L) + c)
      }
      if (counts.size > k) {
        val sorted = counts.values.toArray.sorted(Ordering[Long].reverse)
        val cut = sorted(k) // (k+1)-th largest
        val dead = mutable.ArrayBuffer.empty[String]
        counts.mapValuesInPlace((_, c) => c - cut)
        counts.foreach { case (key, c) => if (c <= 0) dead += key }
        dead.foreach(counts.remove)
      }
      this
    }
  }

  private[graft] def serializeSummary(s: MgSummary): Array[Byte] = {
    val entries = s.counts.toArray.map { case (item, c) =>
      (item.getBytes(StandardCharsets.UTF_8), c)
    }
    val size = 1 + 4 + 8 + 4 + entries.map(e => 4 + e._1.length + 8).sum
    val buf = ByteBuffer.allocate(size).order(ByteOrder.LITTLE_ENDIAN)
    buf.put(FormatVersion)
    buf.putInt(s.k)
    buf.putLong(s.n)
    buf.putInt(entries.length)
    entries.foreach { case (bytes, c) =>
      buf.putInt(bytes.length); buf.put(bytes); buf.putLong(c)
    }
    buf.array()
  }

  private[graft] def deserializeSummary(bytes: Array[Byte]): MgSummary = {
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val version = buf.get()
    require(version == FormatVersion, s"unknown MG state version $version")
    val s = new MgSummary(buf.getInt())
    s.n = buf.getLong()
    val m = buf.getInt()
    (0 until m).foreach { _ =>
      val len = buf.getInt()
      val b = new Array[Byte](len); buf.get(b)
      s.counts.update(new String(b, StandardCharsets.UTF_8), buf.getLong())
    }
    s
  }

  /** `graft_mg_agg(item string, k)` → binary MG state. Null items are
    * skipped (they are not a frequency class).
    */
  case class MgAgg(
      child: Expression,
      k: Int,
      mutableAggBufferOffset: Int = 0,
      inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[MgSummary]
    with ImplicitCastInputTypes with UnaryLike[Expression] {

    require(k >= 1, s"k must be >= 1: $k")

    override def inputTypes = Seq(StringType)
    override def dataType: DataType = BinaryType
    override def nullable: Boolean = false
    override def prettyName: String = "graft_mg_agg"

    override def createAggregationBuffer(): MgSummary = new MgSummary(k)

    override def update(buffer: MgSummary, input: InternalRow): MgSummary = {
      val v = child.eval(input)
      if (v != null) buffer.insert(v.asInstanceOf[UTF8String].toString)
      buffer
    }

    override def merge(buffer: MgSummary, input: MgSummary): MgSummary =
      buffer.merge(input)

    override def eval(buffer: MgSummary): Any = serializeSummary(buffer)
    override def serialize(buffer: MgSummary): Array[Byte] = serializeSummary(buffer)
    override def deserialize(bytes: Array[Byte]): MgSummary = deserializeSummary(bytes)

    override def withNewMutableAggBufferOffset(nOff: Int): MgAgg =
      copy(mutableAggBufferOffset = nOff)
    override def withNewInputAggBufferOffset(nOff: Int): MgAgg =
      copy(inputAggBufferOffset = nOff)
    override protected def withNewChildInternal(newChild: Expression): MgAgg =
      copy(child = newChild)
  }

  /** `graft_mg_merge(state binary)` → merged binary MG state — the
    * compaction aggregate; the Agarwal et al. rule keeps the error
    * bound at ⌊n_total/(k+1)⌋ at any re-compaction depth.
    */
  case class MgMergeAgg(
      child: Expression,
      mutableAggBufferOffset: Int = 0,
      inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[MgSummary]
    with ImplicitCastInputTypes with UnaryLike[Expression] {

    override def inputTypes = Seq(BinaryType)
    override def dataType: DataType = BinaryType
    override def nullable: Boolean = false
    override def prettyName: String = "graft_mg_merge"

    // k adopts from the first merged state (capacity 0 sentinel)
    override def createAggregationBuffer(): MgSummary = new MgSummary(0)

    private def mergeInto(buffer: MgSummary, s: MgSummary): MgSummary =
      if (buffer.k == 0 && buffer.n == 0L) s
      else if (s.k == 0 && s.n == 0L) buffer
      else buffer.merge(s)

    override def update(buffer: MgSummary, input: InternalRow): MgSummary = {
      val v = child.eval(input)
      if (v == null) buffer
      else mergeInto(buffer, deserializeSummary(v.asInstanceOf[Array[Byte]]))
    }

    override def merge(buffer: MgSummary, input: MgSummary): MgSummary =
      mergeInto(buffer, input)

    override def eval(buffer: MgSummary): Any = serializeSummary(buffer)
    override def serialize(buffer: MgSummary): Array[Byte] = serializeSummary(buffer)
    override def deserialize(bytes: Array[Byte]): MgSummary = deserializeSummary(bytes)

    override def withNewMutableAggBufferOffset(nOff: Int): MgMergeAgg =
      copy(mutableAggBufferOffset = nOff)
    override def withNewInputAggBufferOffset(nOff: Int): MgMergeAgg =
      copy(inputAggBufferOffset = nOff)
    override protected def withNewChildInternal(newChild: Expression): MgMergeAgg =
      copy(child = newChild)
  }

  private val TopKStruct = StructType(Seq(
    StructField("item", StringType, nullable = false),
    StructField("count_lo", LongType, nullable = false),
    StructField("count_hi", LongType, nullable = false)))

  /** `graft_mg_topk(state, topK)` → the summary's top entries with
    * their deterministic bounds: `count_lo` the stored counter (never
    * above the truth), `count_hi = count_lo + ⌊n/(k+1)⌋` (never below
    * it). Sorted (count_lo desc, item asc), truncated to topK. Runs
    * once per group row post-agg.
    */
  case class MgTopK(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes with CodegenFallback {

    override def inputTypes = Seq(BinaryType, IntegerType)
    override def dataType: DataType = ArrayType(TopKStruct)
    override def nullable: Boolean = true
    override def prettyName: String = "graft_mg_topk"

    override def nullSafeEval(state: Any, topK: Any): Any = {
      val s = deserializeSummary(state.asInstanceOf[Array[Byte]])
      val kk = topK.asInstanceOf[Int]
      if (s.counts.isEmpty) return new GenericArrayData(Array.empty[Any])
      val err = if (s.k > 0) s.n / (s.k + 1) else 0L
      val rows = s.counts.toArray
        .sortBy { case (item, c) => (-c, item) }
        .take(kk)
        .map { case (item, c) =>
          InternalRow(UTF8String.fromString(item), c, c + err)
        }
      new GenericArrayData(rows.asInstanceOf[Array[Any]])
    }

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): MgTopK =
      copy(left = newLeft, right = newRight)
  }

  private[graft] val aggBuilder: Seq[Expression] => Expression = { children =>
    require(children.size == 2,
      s"graft_mg_agg expects (item, k): got ${children.size}")
    require(children(1).foldable, "graft_mg_agg k must be a foldable integer literal")
    val k = children(1).eval() match {
      case i: Int => i
      case l: Long => l.toInt
      case other => throw new IllegalArgumentException(
        s"graft_mg_agg k must be a foldable integer literal, got $other")
    }
    MgAgg(children(0), k).toAggregateExpression()
  }

  private[graft] val mergeBuilder: Seq[Expression] => Expression = { children =>
    require(children.size == 1,
      s"graft_mg_merge expects (state): got ${children.size}")
    MgMergeAgg(children(0)).toAggregateExpression()
  }

  private[graft] val topkBuilder: Seq[Expression] => Expression = { children =>
    require(children.size == 2,
      s"graft_mg_topk expects (state, topK): got ${children.size}")
    // SQL callers bypass mgTopK's require — enforce the same contract
    // here when the literal is foldable (the only supported form)
    if (children(1).foldable) {
      val k = children(1).eval() match {
        case i: Int => i
        case l: Long => l.toInt
        case other => throw new IllegalArgumentException(
          s"graft_mg_topk topK must be an integer literal, got $other")
      }
      require(k >= 1, s"graft_mg_topk topK must be >= 1: $k")
    }
    MgTopK(children(0), children(1))
  }

  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("graft_mg_agg"),
      new ExpressionInfo(classOf[MgAgg].getName, "graft_mg_agg"),
      aggBuilder)
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("graft_mg_merge"),
      new ExpressionInfo(classOf[MgMergeAgg].getName, "graft_mg_merge"),
      mergeBuilder)
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("graft_mg_topk"),
      new ExpressionInfo(classOf[MgTopK].getName, "graft_mg_topk"),
      topkBuilder)
  }

  import org.apache.spark.sql.functions.{call_function, lit}

  /** Aggregate a string item column into one MG state of at most `k`
    * counters. Mergeable: the shuffle carries ≤ k entries per group
    * whatever the item cardinality.
    */
  def mgAgg(spark: SparkSession, item: Column, k: Int): Column = {
    require(k >= 1, s"k must be >= 1: $k")
    register(spark)
    call_function("graft_mg_agg", item, lit(k))
  }

  /** Merge serialized MG states (compaction / rollup aggregate). */
  def mgMerge(spark: SparkSession, state: Column): Column = {
    register(spark)
    call_function("graft_mg_merge", state)
  }

  /** Serve the top entries with deterministic [count_lo, count_hi]
    * bounds from a state column.
    */
  def mgTopK(spark: SparkSession, state: Column, topK: Int): Column = {
    require(topK >= 1, s"topK must be >= 1: $topK")
    register(spark)
    call_function("graft_mg_topk", state, lit(topK))
  }
}
