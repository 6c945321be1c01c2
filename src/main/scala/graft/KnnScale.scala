package graft

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Similarity}

/** s08/s14/d08 scale rung (CHECK_sf100_ann.txt): the LSH knn graph,
  * 3-round score propagation, and the fine-LSH near-dup pair pass over
  * the first `nLimit` vectors of a replicated embeddings corpus — the
  * three heaviest ANN composites (corpus-wide LSH self-joins).
  *
  * Why a parameterized rung and not the 5M gate: candidate-pair volume
  * for these self-joins is n x occupancy x tables / 2 where occupancy
  * = maxBucketSize/8 (knnPlanes) — at the gates' cap of 1000 that is
  * ~1-1.5G pairs from 2M vectors up (occupancy ~76-125), and the
  * per-node top-k shuffle over that volume needs more spill disk than
  * this container offers (~70 GB free; 5M and 2M attempts at cap 1000
  * died at no-space-left — the artifact records them). Occupancy is
  * the caller's knob: this rung runs cap=200 (occupancy ~15-25 —
  * ~120M pairs at 2M vectors), which preserves collisions for the
  * near-dup kin the corpus plants (cosine ~0.999 survives any plane
  * count) while fitting the box. The cluster analog: size occupancy to
  * aggregate spill, not to a constant.
  *
  * Args: sfDir outDir [nLimit=2000000] [k=10] [maxBucketSize=auto]
  *
  * When no explicit cap is passed, the rung sizes it with
  * [[graft.operators.Similarity.suggestedLshCap]] from the scratch
  * disk actually available — the r16 productization of the occupancy
  * law this runner's r15 deaths established (cap=1000 at 5M needed
  * ~274 GB of candidate spill on a ~70 GB box; the law, inverted,
  * returns ~155 there — the recorded cap=200 regime).
  */
object KnnScale {
  /** Effective post-compression bytes per rescore candidate row (two
    * ids + one carried embedding through lz4 shuffle) — implied by the
    * recorded 5M runs in CHECK_sf100_ann.txt.
    */
  private val BytesPerCandidate = 180L

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val nLimit = args.lift(2).map(_.toLong).getOrElse(2000000L)
    val k = args.lift(3).map(_.toInt).getOrElse(10)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.create(cpus, Some(sfDir))
    // usable scratch on the disk Spark actually spills to, halved
    // (session first, so a spark.local.dir conf is visible here)
    val spill = Similarity.spillBudget(spark.conf.getOption("spark.local.dir"))
    val suggested = Similarity.suggestedLshCap(
      nLimit, graft.functions.HyperplaneBuckets.NumTables, BytesPerCandidate, spill)
    val cap = args.lift(4).map(_.toInt).getOrElse(suggested)
    println(s"[knn] spill_budget=$spill suggested_cap=$suggested cap=$cap" +
      (if (cap == suggested) " (auto)" else " (explicit)"))
    val e = Tables.embeddings(spark, sfDir).filter(col("vec_id") < nLimit)

    var t0 = System.nanoTime()
    Similarity.knnJoinLsh(e, k = k, maxBucketSize = cap, corpusSize = nLimit)
      .write.mode("overwrite").parquet(s"$outDir/knn_graph")
    println(f"[knn] phase=knn_graph n=$nLimit k=$k cap=$cap wall=${(System.nanoTime() - t0) / 1e9}%.1fs")

    val graph = spark.read.parquet(s"$outDir/knn_graph")
    val nodes = e.select(col("vec_id"), col("label").cast("double").as("score"))
    t0 = System.nanoTime()
    Similarity.scorePropagation(nodes, graph, rounds = 3)
      .write.mode("overwrite").parquet(s"$outDir/propagated")
    println(f"[knn] phase=propagation rounds=3 wall=${(System.nanoTime() - t0) / 1e9}%.1fs")

    // graph shape evidence: per-node degree never exceeds k, and the
    // propagated frame conserves the node set
    val deg = graph.groupBy("q_id").count()
      .agg(max(col("count")).as("max_deg"), count(lit(1)).as("nodes")).collect().head
    val prop = spark.read.parquet(s"$outDir/propagated").count()
    println(s"[knn] max_degree=${deg.getLong(0)} graph_nodes=${deg.getLong(1)} propagated_rows=$prop")

    // d08's library form at the same rung: fine-LSH near-dup pairs,
    // threshold high enough that only jittered family kin survive
    t0 = System.nanoTime()
    Dedup.embeddingLshPairs(e, minCosine = 0.99, maxBucketSize = cap, corpusSize = nLimit)
      .write.mode("overwrite").parquet(s"$outDir/lsh_pairs")
    val pairs = spark.read.parquet(s"$outDir/lsh_pairs").count()
    println(f"[knn] phase=lsh_pairs n=$nLimit pairs=$pairs wall=${(System.nanoTime() - t0) / 1e9}%.1fs")
    spark.stop()
  }
}
