package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** 1000x ANN-family scale runner (the r15 decade-up artifact's Spark
  * side — CHECK_sf100_ann.txt): exact brute-force baseline over a
  * sampled query set, then the scale-proportioned IVF ladder (codebook
  * ~ sqrt(n) cells, build-once/probe-many via ivfIndex/ivfSearch) with
  * measured recall vs the exact sample at several probe settings.
  *
  * Phases, each wall-timed and written under outDir:
  *   exact_sample       annBruteforce over every (vec_id % qEvery == 0)
  *                      query — the recall denominator
  *   codebook_sampled   hash-sampled seeds (the s03 quantizer, scaled)
  *   index_sampled      map-only cell assignment at assignReplicas=3
  *   search_sampled_pN  ivfSearch at numProbes=N + recallAtK vs exact
  *   codebook_trained   2 Lloyd rounds (the s04 quantizer, scaled)
  *   index_trained / search_trained_pN   same over the trained codebook
  *
  * The index is WRITTEN to parquet and read back before probing, so
  * probe walls measure the deployment shape (index on storage, not a
  * fused build+probe plan) and the build wall is the real
  * materialization cost.
  *
  * Args: sfDir outDir [numCells=2048] [queryEvery=5000] [probes=16,64]
  *       [ladders=sampled,trained]
  * Prints one `[ann] phase=… wall=… rows=…` line per phase and a
  * `[ann] recall …` line per search — the artifact quotes these.
  * (`ladders=sampled` skips the Lloyd training — the exact-replica
  * regime's geometry is the source corpus's, so training it again
  * buys no new evidence for twice the wall.)
  */
object AnnScale {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val numCells = args.lift(2).map(_.toInt).getOrElse(2048)
    val queryEvery = args.lift(3).map(_.toInt).getOrElse(5000)
    val probesList = args.lift(4).map(_.split(",").map(_.trim.toInt).toSeq)
      .getOrElse(Seq(16, 64))
    val ladders = args.lift(5).map(_.split(",").map(_.trim).toSet)
      .getOrElse(Set("sampled", "trained"))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.create(cpus, Some(sfDir))
    new java.io.File(outDir).mkdirs()

    def timed[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[ann] phase=$name wall=${(System.nanoTime() - t0) / 1e9}%.1fs")
      r
    }
    // parallel parquet write (no coalesce: these are multi-GB builds)
    def dump(name: String, df: DataFrame): Unit =
      timed(name) { df.write.mode("overwrite").parquet(s"$outDir/$name") }
    def read(name: String): DataFrame = spark.read.parquet(s"$outDir/$name")

    val e = Tables.embeddings(spark, sfDir)
    val n = timed("count")(e.count())
    println(s"[ann] corpus=$sfDir n=$n numCells=$numCells queryEvery=$queryEvery")
    val queries = e.filter(pmod(col("vec_id"), lit(queryEvery)) === 0)

    dump("exact_sample", Similarity.annBruteforce(e, queries))
    val exact = read("exact_sample")

    def meanRecall(name: String): Double = {
      val r = Similarity.recallAtK(read(name), exact)
        .agg(avg(col("recall")).as("r"), count(lit(1)).as("q"))
        .collect().head
      println(f"[ann] recall variant=$name queries=${r.getLong(1)} mean_recall@10=${r.getDouble(0)}%.4f")
      r.getDouble(0)
    }

    def ladder(tag: String, codebook: DataFrame): Unit = {
      dump(s"codebook_$tag", codebook)
      val cb = read(s"codebook_$tag")
      dump(s"index_$tag", Similarity.ivfIndex(e, cb))
      val idx = read(s"index_$tag")
      probesList.foreach { p =>
        dump(s"search_${tag}_p$p", Similarity.ivfSearch(idx, queries, cb, numProbes = p))
        meanRecall(s"search_${tag}_p$p")
      }
    }

    if (ladders("sampled"))
      ladder("sampled", Similarity.sampledCodebook(e, numCells))
    if (ladders("trained"))
      ladder("trained",
        timed("train_codebook")(Similarity.trainIvfCodebook(e, numCells = numCells)))

    spark.stop()
  }
}
