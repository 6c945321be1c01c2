package graft.operators

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame

/** Tracked eager `localCheckpoint` for iterative DataFrame loops
  * (dupClusters' label propagation, trainIvfCodebook's Lloyd rounds).
  *
  * Why tracking is needed at all: `Dataset.unpersist()` only talks to
  * the SQL cache manager, so on a localCheckpointed frame it is a
  * silent no-op — the checkpoint's storage lives at the RDD level.
  * Without a handle to that RDD, every superseded generation of an
  * iterative loop stays persisted until driver GC + ContextCleaner get
  * around to it: a slow storage leak on a long-running cluster job.
  * Capturing the RDDs each checkpoint call persists (diff of
  * `getPersistentRDDs` around it — exact here because the loops run
  * sequentially on the driver) makes release explicit and immediate.
  */
private[graft] object IterativeCheckpoint {

  /** A checkpointed generation: the truncated-lineage frame plus the
    * persisted RDD handles backing it, releasable for real once the
    * next generation has materialized.
    */
  final case class Generation(df: DataFrame, rdds: Seq[RDD[_]]) {
    def release(): Unit = rdds.foreach(_.unpersist(blocking = false))
  }

  /** Eagerly localCheckpoint `df`, capturing exactly the RDDs the call
    * newly persisted. The capture section is locked: two driver threads
    * running iterative loops concurrently must not attribute each
    * other's fresh checkpoints to themselves — releasing a live
    * checkpoint is fatal (its lineage is truncated, so the data cannot
    * be recomputed). The lock serializes only the checkpoint
    * materialization calls; the jobs inside still use every executor.
    */
  def apply(df: DataFrame): Generation = synchronized {
    val sc = df.sparkSession.sparkContext
    val before = sc.getPersistentRDDs.keySet
    val out = df.localCheckpoint()
    val added = sc.getPersistentRDDs.collect {
      case (id, r) if !before.contains(id) => r
    }.toSeq
    Generation(out, added)
  }
}
