package graft

import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** d11 (semantic dedup) scale rung with SIGNAL (CHECK_sf100_ann.txt):
  * the kept-set computed over the first `nLimit` vectors of a
  * replicated embeddings corpus against a caller-supplied (trained)
  * codebook parquet — the deployment shape where the quantizer is a
  * shared artifact (here: the codebook the AnnScale trained-IVF ladder
  * built over the full corpus).
  *
  * Why a slice and not the full 5M: SemDeDup's pair stage is quadratic
  * INSIDE cells; at the gate's 32-cell codebook every 5M-corpus cell
  * crosses the size cap and the cap contract (correctly) serves zero
  * pairs — that extreme runs separately via the unmodified d11 gate.
  * The signal rung sizes cells to carry pairs: nLimit=1M over 2048
  * trained cells → ~977 expected members per cell (2 assign replicas),
  * `maxCellSize` at 4x that for variance headroom, in-cell pair volume
  * ~1G — the bounded quadratic the operator is designed around.
  *
  * Args: sfDir codebookDir outDir [nLimit=1000000] [minCosine=0.99]
  *       [maxCellSize=auto]
  *
  * When no explicit cell cap is passed, the rung sizes it with
  * [[graft.operators.Similarity.suggestedPairCap]] — the worst-case
  * in-cell pair-volume bound from the r16 productized occupancy law —
  * over the codebook's actual cell count and the scratch disk actually
  * available (the r15 run hand-picked 4000 as 4x expected occupancy;
  * the law's guarantee-grade answer on this box is ~1000, which still
  * clears the ~977 expected members/cell of the recorded signal rung).
  */
object SemDedupScale {
  /** Effective post-compression bytes per in-cell candidate row (id
    * pair + score; the embeddings join back by id AFTER the threshold)
    * — implied by the recorded 1M-signal run in CHECK_sf100_ann.txt.
    */
  private val BytesPerCandidate = 64L

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val codebookDir = args(1)
    val outDir = args(2)
    val nLimit = args.lift(3).map(_.toLong).getOrElse(1000000L)
    val minCosine = args.lift(4).map(_.toDouble).getOrElse(0.99)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.create(cpus, Some(sfDir))
    val e = Tables.embeddings(spark, sfDir).filter(col("vec_id") < nLimit)
    val cb = spark.read.parquet(codebookDir)
    val spill = graft.operators.Similarity.spillBudget(
      spark.conf.getOption("spark.local.dir"))
    val suggested = graft.operators.Similarity.suggestedPairCap(
      nLimit, buckets = cb.count(), BytesPerCandidate, spill)
    val maxCellSize = args.lift(5).map(_.toInt).getOrElse(suggested)
    println(s"[semdedup] spill_budget=$spill suggested_cap=$suggested " +
      s"maxCellSize=$maxCellSize" +
      (if (maxCellSize == suggested) " (auto)" else " (explicit)"))
    val t0 = System.nanoTime()
    Dedup.semanticDedupWithCodebook(e, cb, minCosine = minCosine,
        assignReplicas = 2, maxCellSize = maxCellSize)
      .write.mode("overwrite").parquet(outDir)
    println(f"[semdedup] n=$nLimit minCosine=$minCosine maxCellSize=$maxCellSize wall=${(System.nanoTime() - t0) / 1e9}%.1fs cpus=$cpus")
    spark.stop()
  }
}
