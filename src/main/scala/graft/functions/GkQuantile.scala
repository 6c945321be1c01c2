package graft.functions

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.{BinaryLike, UnaryLike}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData, QuantileSummaries}
import org.apache.spark.sql.functions.{array, call_function, lit}
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, DoubleType}

/** Mergeable approximate-quantile sketch STATE, the continuous-value
  * twin of the q32 HLL state family: a Greenwald–Khanna ε-approximate
  * summary (Spark's own `QuantileSummaries`, the engine behind
  * `approx_percentile`/`df.stat.approxQuantile`) exposed as a
  * first-class BINARY aggregate state so it can be PERSISTED per
  * (group, ingest-unit), appended, re-merged, and served later without
  * re-touching the raw data — the piece the exact histogram family
  * (q30/q65) cannot provide once a group's distinct-value cardinality
  * is unbounded (genuinely continuous values at 100 TB).
  *
  * Why GK and not a KLL/t-digest: GK's rank guarantee is DETERMINISTIC
  * (worst-case `|rank(served) − ⌈φ·n⌉| ≤ ε·n`, no failure
  * probability and no RNG anywhere in insert/compress/merge), so every
  * test pin and every serving contract is a hard bound, not a
  * confidence interval; the state is still O((1/ε)·log(ε·n)) tuples —
  * a few KB per group at any corpus size.
  *
  * Three expressions, registered like the BloomSketch family:
  *  - `graft_gk_agg(value, relErr)`  — raw doubles → one binary state
  *  - `graft_gk_merge(state)`        — binary states → merged state
  *  - `graft_gk_quantiles(state, probs)` — state → array<double>
  *
  * The serialized form is a versioned little-endian layout owned by
  * this file (version, relErr, compressThreshold, count, m,
  * m×(value, g, delta)) so persisted state outlives Spark's internal
  * (non-stable) aggregate-buffer encoding.
  */
object GkQuantile {

  private val FormatVersion: Byte = 1

  private[graft] def serializeSummary(qs: QuantileSummaries): Array[Byte] = {
    val s = qs.compress()
    val m = s.sampled.length
    val buf = ByteBuffer.allocate(1 + 8 + 4 + 8 + 4 + m * 24)
      .order(ByteOrder.LITTLE_ENDIAN)
    buf.put(FormatVersion)
    buf.putDouble(s.relativeError)
    buf.putInt(s.compressThreshold)
    buf.putLong(s.count)
    buf.putInt(m)
    s.sampled.foreach { st =>
      buf.putDouble(st.value); buf.putLong(st.g); buf.putLong(st.delta)
    }
    buf.array()
  }

  private[graft] def deserializeSummary(bytes: Array[Byte]): QuantileSummaries = {
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val version = buf.get()
    require(version == FormatVersion, s"unknown GK state version $version")
    val relErr = buf.getDouble()
    val threshold = buf.getInt()
    val count = buf.getLong()
    val m = buf.getInt()
    val sampled = Array.tabulate(m) { _ =>
      new QuantileSummaries.Stats(buf.getDouble(), buf.getLong(), buf.getLong())
    }
    new QuantileSummaries(threshold, relErr, sampled, count, true)
  }

  /** Merge that tolerates the empty summary on either side —
    * `QuantileSummaries.merge` requires compressed operands, and an
    * all-null partition legitimately contributes a zero-count state.
    *
    * Two NON-empty states must agree on relativeError: merging an
    * ε₁-summary into an ε₂-summary yields a state that reports ε₁
    * while honoring neither bound, so mismatches hard-fail (the same
    * contract as MisraGries.merge's equal-k require). An empty state
    * carries no samples, so its ε is immaterial and it merges freely
    * — that is what lets an all-null partition's buffer vanish.
    */
  private[graft] def mergeSummaries(a: QuantileSummaries,
      b: QuantileSummaries): QuantileSummaries = {
    val ac = a.compress(); val bc = b.compress()
    if (bc.count == 0) ac
    else if (ac.count == 0) bc
    else {
      require(ac.relativeError == bc.relativeError,
        s"cannot merge GK states with different relativeError: " +
          s"${ac.relativeError} vs ${bc.relativeError} — rebuild one side " +
          "at the other's eps (the merged guarantee would be neither)")
      ac.merge(bc)
    }
  }

  /** `graft_gk_agg(value double, relErr)` → binary GK state. Null
    * values are skipped (a group of all nulls yields the empty state,
    * count 0 — its quantiles serve as null).
    */
  case class GkQuantileAgg(
      child: Expression,
      relativeError: Double,
      mutableAggBufferOffset: Int = 0,
      inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[QuantileSummaries]
    with ImplicitCastInputTypes with UnaryLike[Expression] {

    require(relativeError > 0 && relativeError < 1,
      s"relativeError must be in (0, 1): $relativeError")

    override def inputTypes = Seq(DoubleType)
    override def dataType: DataType = BinaryType
    override def nullable: Boolean = false
    override def prettyName: String = "graft_gk_agg"

    override def createAggregationBuffer(): QuantileSummaries =
      new QuantileSummaries(QuantileSummaries.defaultCompressThreshold,
        relativeError)

    override def update(buffer: QuantileSummaries,
        input: InternalRow): QuantileSummaries = {
      val v = child.eval(input)
      if (v == null) buffer
      else buffer.insert(v.asInstanceOf[Double])
    }

    override def merge(buffer: QuantileSummaries,
        input: QuantileSummaries): QuantileSummaries =
      mergeSummaries(buffer, input)

    override def eval(buffer: QuantileSummaries): Any =
      serializeSummary(buffer)

    override def serialize(buffer: QuantileSummaries): Array[Byte] =
      serializeSummary(buffer)

    override def deserialize(bytes: Array[Byte]): QuantileSummaries =
      deserializeSummary(bytes)

    override def withNewMutableAggBufferOffset(n: Int): GkQuantileAgg =
      copy(mutableAggBufferOffset = n)
    override def withNewInputAggBufferOffset(n: Int): GkQuantileAgg =
      copy(inputAggBufferOffset = n)
    override protected def withNewChildInternal(newChild: Expression): GkQuantileAgg =
      copy(child = newChild)
  }

  /** `graft_gk_merge(state binary)` → merged binary GK state — the
    * compaction aggregate: same-key states from any number of appends
    * re-merge to ONE state whose rank guarantee still holds (GK merge
    * is error-preserving: merging ε-summaries yields an ε-summary).
    */
  case class GkMergeAgg(
      child: Expression,
      mutableAggBufferOffset: Int = 0,
      inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[QuantileSummaries]
    with ImplicitCastInputTypes with UnaryLike[Expression] {

    override def inputTypes = Seq(BinaryType)
    override def dataType: DataType = BinaryType
    override def nullable: Boolean = false
    override def prettyName: String = "graft_gk_merge"

    override def createAggregationBuffer(): QuantileSummaries =
      new QuantileSummaries(QuantileSummaries.defaultCompressThreshold,
        QuantileSummaries.defaultRelativeError)

    override def update(buffer: QuantileSummaries,
        input: InternalRow): QuantileSummaries = {
      val v = child.eval(input)
      if (v == null) buffer
      else mergeSummaries(buffer, deserializeSummary(v.asInstanceOf[Array[Byte]]))
    }

    override def merge(buffer: QuantileSummaries,
        input: QuantileSummaries): QuantileSummaries =
      mergeSummaries(buffer, input)

    override def eval(buffer: QuantileSummaries): Any =
      serializeSummary(buffer)

    override def serialize(buffer: QuantileSummaries): Array[Byte] =
      serializeSummary(buffer)

    override def deserialize(bytes: Array[Byte]): QuantileSummaries =
      deserializeSummary(bytes)

    override def withNewMutableAggBufferOffset(n: Int): GkMergeAgg =
      copy(mutableAggBufferOffset = n)
    override def withNewInputAggBufferOffset(n: Int): GkMergeAgg =
      copy(inputAggBufferOffset = n)
    override protected def withNewChildInternal(newChild: Expression): GkMergeAgg =
      copy(child = newChild)
  }

  /** `graft_gk_quantiles(state, array<double> probs)` → array<double>
    * of ε-approximate quantiles. Runs once per GROUP row post-agg
    * (never per input row), so CodegenFallback costs nothing
    * measurable. The empty state (count 0) serves null.
    */
  case class GkQuantilesExpr(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes with CodegenFallback {

    override def inputTypes =
      Seq(BinaryType, ArrayType(DoubleType))
    override def dataType: DataType = ArrayType(DoubleType)
    override def nullable: Boolean = true
    override def prettyName: String = "graft_gk_quantiles"

    override def nullSafeEval(state: Any, probs: Any): Any = {
      val qs = deserializeSummary(state.asInstanceOf[Array[Byte]])
      // SQL callers bypass gkQuantiles' require — enforce it here too
      val psCheck = probs.asInstanceOf[ArrayData].toDoubleArray()
      require(psCheck.nonEmpty && psCheck.forall(p => p >= 0.0 && p <= 1.0),
        s"graft_gk_quantiles probabilities must be in [0,1], got " +
          psCheck.mkString("[", ", ", "]"))
      if (qs.count == 0) null
      else {
        val ps = psCheck
        qs.query(ps.toIndexedSeq) match {
          case Some(vals) => new GenericArrayData(vals.toArray)
          case None => null
        }
      }
    }

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): GkQuantilesExpr =
      copy(left = newLeft, right = newRight)
  }

  private[graft] val aggBuilder: Seq[Expression] => Expression = { children =>
    require(children.size == 2,
      s"graft_gk_agg expects (value, relativeError): got ${children.size}")
    require(children(1).foldable,
      "graft_gk_agg relativeError must be a foldable numeric literal")
    // SQL numeric literals arrive as DECIMAL (0.01 -> Decimal(3,2)),
    // the Column API passes a Double — accept any numeric
    val relErr = children(1).eval() match {
      case d: Double => d
      case f: Float => f.toDouble
      case d: org.apache.spark.sql.types.Decimal => d.toDouble
      case n: Number => n.doubleValue()
      case other => throw new IllegalArgumentException(
        s"graft_gk_agg relativeError must be a foldable numeric literal, got $other")
    }
    GkQuantileAgg(children(0), relErr).toAggregateExpression()
  }

  private[graft] val mergeBuilder: Seq[Expression] => Expression = { children =>
    require(children.size == 1,
      s"graft_gk_merge expects (state): got ${children.size}")
    GkMergeAgg(children(0)).toAggregateExpression()
  }

  private[graft] val quantilesBuilder: Seq[Expression] => Expression = { children =>
    require(children.size == 2,
      s"graft_gk_quantiles expects (state, probs): got ${children.size}")
    GkQuantilesExpr(children(0), children(1))
  }

  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("graft_gk_agg"),
      new ExpressionInfo(classOf[GkQuantileAgg].getName, "graft_gk_agg"),
      aggBuilder)
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("graft_gk_merge"),
      new ExpressionInfo(classOf[GkMergeAgg].getName, "graft_gk_merge"),
      mergeBuilder)
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("graft_gk_quantiles"),
      new ExpressionInfo(classOf[GkQuantilesExpr].getName, "graft_gk_quantiles"),
      quantilesBuilder)
  }

  /** Aggregate a double column into one serialized ε-approximate GK
    * state. Mergeable: partitions fold locally and the shuffle carries
    * O((1/ε)·log(ε·n)) tuples per group, never values.
    */
  def gkAgg(spark: SparkSession, value: Column, relativeError: Double = 0.01): Column = {
    register(spark)
    call_function("graft_gk_agg", value, lit(relativeError))
  }

  /** Merge serialized GK states (compaction / rollup aggregate). */
  def gkMerge(spark: SparkSession, state: Column): Column = {
    register(spark)
    call_function("graft_gk_merge", state)
  }

  /** Serve ε-approximate quantiles from a state column. */
  def gkQuantiles(spark: SparkSession, state: Column, probs: Seq[Double]): Column = {
    require(probs.nonEmpty && probs.forall(p => p >= 0.0 && p <= 1.0),
      s"probabilities must be in [0,1], got $probs")
    register(spark)
    call_function("graft_gk_quantiles", state, array(probs.map(lit): _*))
  }
}
