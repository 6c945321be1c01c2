package graft.sinks

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Training-shard export — the last hop of the corpus pipeline, where
  * the deduped/filtered/mixed documents leave Spark for a trainer's
  * data loader. Shard assignment is a DETERMINISTIC pure function of
  * the document id (the house 48-bit md5-prefix, the q19/q37
  * discipline), so re-exports after an incremental ingest land every
  * unchanged document in the same shard (loaders resume cleanly,
  * diffs stay small), the split is reproducible across reruns,
  * partitionings, and engines, and assignment never depends on row
  * order or executor count.
  *
  * Scale shape: the shard column is computed in-scan, one hash
  * repartition co-locates each shard into one task (one parquet file
  * per shard directory — loaders stream a shard sequentially), and
  * the manifest is recomputed FROM THE WRITTEN DATA (what the trainer
  * will read is what gets manifested) as one mergeable aggregation.
  * At 100 TB, shards is sized so a shard fits a loader worker
  * (thousands of shards — the write is one job regardless).
  */
object CorpusShards {

  /** Deterministic shard id for any id column: 48 md5-prefix bits of
    * the id's string form, mod `shards` — uniform for any id
    * distribution (hash, not range: a time-ordered id would range-pack
    * new documents into the last shard).
    */
  def shardId(id: Column, shards: Int): Column =
    pmod(conv(substring(md5(id.cast("string").cast("binary")), 1, 12), 16, 10)
      .cast("long"), lit(shards.toLong))

  /** Write `df` as `shards` deterministic parquet shards under `path`
    * (directory layout `shard=N/`), plus a manifest parquet at
    * `path + "_manifest"`; returns the manifest (shard, n_docs,
    * id_lo, id_hi) recomputed from the written files.
    */
  def writeShards(df: DataFrame, path: String, idCol: String = "doc_id",
      shards: Int = 8): DataFrame = {
    require(shards > 0, s"shards must be positive, got $shards")
    df.withColumn("shard", shardId(col(idCol), shards))
      .repartition(shards, col("shard"))
      .write.mode("overwrite").partitionBy("shard").parquet(path)
    val back = df.sparkSession.read.parquet(path)
    val manifest = back.groupBy(col("shard").cast("int").as("shard"))
      .agg(count(lit(1)).cast("long").as("n_docs"),
        min(col(idCol)).as("id_lo"), max(col(idCol)).as("id_hi"))
    manifest.write.mode("overwrite").parquet(path + "_manifest")
    df.sparkSession.read.parquet(path + "_manifest")
  }
}
