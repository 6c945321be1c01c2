package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, IntegerType}

/** Native Catalyst expression computing ALL random-hyperplane LSH bucket
  * ids for an `Array[Float]` embedding in one pass:
  * `graft_hyperplane_buckets(embedding)` → `Array[Int]` of length
  * [[HyperplaneBuckets.NumTables]], element t = the 4-sign-bit bucket of
  * hash table t.
  *
  * Replaces the 32 `aggregate(zip_with(...))` higher-order expressions
  * s02 originally used for the plane dot products. HOF lambdas run
  * interpreted (one lambda frame per element per plane — 32x64 frames
  * per vector) and drop the stage out of whole-stage codegen; this
  * expression is a single static call inside the generated code, one
  * fused loop over the 64 floats accumulating all 32 dots. Accumulation
  * order per plane is identical to the `aggregate(zip_with(...))` fold
  * (index 0..dim-1, (double)x * plane(i) summed left to right), so
  * bucket ids are bit-identical to the HOF formulation.
  *
  * The plane constants are deterministic splitmix64 draws (seeded — the
  * same stream every engine/session; see [[HyperplaneBuckets.planes]]),
  * baked into the expression object, NOT serialized per row or per task.
  * At 100 TB the bucketing pass is map-only inside the parquet scan.
  */
case class HyperplaneBuckets(child: Expression)
    extends UnaryExpression with Serializable {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def prettyName: String = "graft_hyperplane_buckets"

  override lazy val resolved: Boolean =
    child.resolved && (child.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    })

  override protected def nullSafeEval(input: Any): Any =
    HyperplaneBuckets.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => s"graft.functions.HyperplaneBuckets.compute($s)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object HyperplaneBuckets {

  val Dim = 64
  val NumTables = 8
  val PlanesPerTable = 4

  /** Deterministic pseudo-random hyperplanes: planes(t)(p) is a 64-dim
    * array of ±1-ish doubles from a seeded splitmix64 stream — what a
    * seeded RNG would give, but reproducible across engines and sessions.
    * 8 tables x 4 planes: for the ~65-75 degree angles separating top-k
    * neighbors in this embedding space, P(bucket match per table)
    * = (1 - theta/pi)^4 ≈ 0.13-0.16, so 8 tables give ~0.67-0.75
    * candidate recall (SimilaritySpec measures it against s01).
    */
  val planes: Array[Array[Array[Double]]] = {
    var z = 0x243F6A8885A308D3L
    def next(): Long = {
      z += 0x9E3779B97F4A7C15L
      var x = z
      x = (x ^ (x >>> 30)) * 0xBF58476D1CE4E5B9L
      x = (x ^ (x >>> 27)) * 0x94D049BB133111EBL
      x ^ (x >>> 31)
    }
    Array.fill(NumTables, PlanesPerTable, Dim)(next().toDouble / Long.MaxValue.toDouble)
  }

  // flat [table][plane][dim] layout for the hot loop
  private val planesFlat: Array[Double] = planes.flatten.flatten

  /** All-table bucket ids for one embedding (static: codegen calls this).
    * Vectors shorter than [[Dim]] dot only their defined prefix — same as
    * `zip_with` would with a null-padded tail under `acc + null` skipping
    * (callers pass fixed 64-dim embeddings).
    */
  def compute(arr: ArrayData): ArrayData = {
    val n = math.min(arr.numElements(), Dim)
    val out = new Array[Int](NumTables)
    var t = 0
    while (t < NumTables) {
      var bucket = 0
      var p = 0
      while (p < PlanesPerTable) {
        val off = (t * PlanesPerTable + p) * Dim
        var dot = 0.0
        var i = 0
        while (i < n) {
          dot += arr.getFloat(i).toDouble * planesFlat(off + i)
          i += 1
        }
        if (dot >= 0) bucket |= (1 << p)
        p += 1
      }
      out(t) = bucket
      t += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(out)
  }

  import org.apache.spark.sql.{Column, SparkSession}

  /** Column-API entry point through the FunctionRegistry. */
  def buckets(spark: SparkSession, embedding: Column): Column = {
    register(spark)
    org.apache.spark.sql.functions.call_function("graft_hyperplane_buckets", embedding)
  }

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      org.apache.spark.sql.catalyst.FunctionIdentifier("graft_hyperplane_buckets"),
      new ExpressionInfo(classOf[HyperplaneBuckets].getName, "graft_hyperplane_buckets"),
      (children: Seq[Expression]) => HyperplaneBuckets(children.head))
}
