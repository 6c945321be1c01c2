package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** m01: multimodal-column plumbing (SURVEY.md §2.4).
  *
  * Media (image/audio/video) is carried as an opaque `binary` column with
  * typed metadata alongside — the layout a 100 TB training-data lake uses
  * (payload stays columnar, metadata predicate-pushes). The decode /
  * feature-extract step is partition-wise: a typed
  * `Dataset[MediaRecord].mapPartitions` (the JVM analog of `mapInPandas`
  * batch iteration — one decoder instantiation per partition, streaming
  * over rows, never materializing the partition).
  *
  * No media codecs exist in this container, so `FakeDecoder.decode` is a
  * STUB: a deterministic function of the bytes standing in for a real
  * JPEG/PNG decode. Everything around it — binary column, metadata
  * struct, partition-wise batch shape, output schema — is the real
  * plumbing and is what MultimodalSpec tests.
  */
object Multimodal {

  /** Opaque payload + typed metadata, as it would land from ingestion. */
  case class MediaRecord(doc_id: Long, media_type: String, payload: Array[Byte])

  /** Decoded features; `width`/`height`/`features` would come from the
    * codec in a real deployment.
    */
  case class DecodedMedia(
      doc_id: Long,
      media_type: String,
      n_bytes: Long,
      width: Int,
      height: Int,
      checksum: Long,
      features: Array[Float])

  /** STUB decoder — deterministic stand-in for an image/audio codec.
    * A real implementation would replace ONLY this object (the Spark
    * plumbing around it is codec-agnostic).
    */
  private object FakeDecoder {
    def decode(r: MediaRecord): DecodedMedia = {
      val bytes = r.payload
      var h = 1125899906842597L // FNV-ish rolling checksum of the payload
      var i = 0
      while (i < bytes.length) { h = 31 * h + bytes(i); i += 1 }
      // "dimensions" derived from content the way a header parse would
      val width = 64 + math.floorMod(h, 192).toInt
      val height = 64 + math.floorMod(h >>> 17, 192).toInt
      val features = Array.tabulate(4) { j =>
        math.floorMod(h >>> (j * 8), 1024).toFloat / 1024.0f
      }
      DecodedMedia(r.doc_id, r.media_type, bytes.length.toLong, width, height, h, features)
    }
  }

  /** Synthesize the media table from `documents` (payload = UTF-8 bytes
    * standing in for an encoded frame; media_type from source round-robin)
    * then run the partition-wise decode. Output is rows-only checked;
    * MultimodalSpec asserts determinism, schema, and batch behavior.
    */
  def m01MultimodalStub(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val media = Tables.documents(s, dir)
      .select(
        col("doc_id"),
        element_at(
          array(lit("image/jpeg"), lit("audio/wav"), lit("video/mp4")),
          (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("media_type"),
        col("text").cast("binary").as("payload"))
      .as[MediaRecord]
    media
      .mapPartitions(records => records.map(FakeDecoder.decode))
      .toDF()
      .select(
        col("doc_id"), col("media_type"), col("n_bytes"),
        col("width"), col("height"), col("checksum"),
        round(element_at(col("features"), 1).cast("double"), 6).as("f0"),
        round(element_at(col("features"), 2).cast("double"), 6).as("f1"))
      .orderBy("doc_id")
  }
}
