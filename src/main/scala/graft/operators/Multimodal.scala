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
    * plumbing around it is codec-agnostic). Since r16 every derived
    * field is arithmetic on the house cross-engine payload hash
    * (md5-prefix, [[graft.functions.BottomKSketch.hash60]]) instead
    * of a JVM-local rolling checksum, so the m01 gate — the LAST
    * rows-only multimodal entry — oracles value-for-value: DuckDB
    * re-derives width/height/features from md5 of the same bytes.
    */
  private object FakeDecoder {
    def decode(r: MediaRecord): DecodedMedia = {
      val bytes = r.payload
      // raw-byte digest: md5 of the payload AS GIVEN, so payload_sig
      // honors the documented md5-of-bytes contract for any binary
      // payload, not just ones that survive a UTF-8 round-trip
      val h = graft.functions.BottomKSketch.hash60(bytes)
      // "dimensions" derived from content the way a header parse would
      val width = 64 + (h % 192L).toInt
      val height = 64 + ((h >>> 17) % 192L).toInt
      // exact in float: 10-bit numerators over a power-of-two base
      val features = Array.tabulate(4) { j =>
        ((h >>> (j * 8)) % 1024L).toFloat / 1024.0f
      }
      DecodedMedia(r.doc_id, r.media_type, bytes.length.toLong, width, height, h, features)
    }
  }

  /** The media table synthesized from `documents` (payload = UTF-8 bytes
    * standing in for an encoded frame; media_type from source round-robin).
    */
  private[operators] def mediaTable(s: SparkSession, dir: String) = {
    import s.implicits._
    Tables.documents(s, dir)
      .select(
        col("doc_id"),
        element_at(
          array(lit("image/jpeg"), lit("audio/wav"), lit("video/mp4")),
          (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("media_type"),
        col("text").cast("binary").as("payload"))
      .as[MediaRecord]
  }

  /** Library form: partition-wise decode + feature extraction over any
    * media Dataset — one decoder per partition, streaming over rows,
    * never materializing the partition (the JVM analog of `mapInPandas`
    * batch iteration).
    */
  def decode(media: org.apache.spark.sql.Dataset[MediaRecord]): org.apache.spark.sql.Dataset[DecodedMedia] =
    media.mapPartitions(records => records.map(FakeDecoder.decode))(
      org.apache.spark.sql.Encoders.product[DecodedMedia])

  /** Synthesize the media table then run the partition-wise decode.
    * Fully SQL-oracled since r16 (the decoder derives from the house
    * payload hash — see [[FakeDecoder]]): the gate serves the two
    * feature probes as their exact 10-bit integer numerators
    * (f·1024), so no float formatting crosses the engine boundary.
    */
  def m01MultimodalStub(s: SparkSession, dir: String): DataFrame = {
    decode(mediaTable(s, dir))
      .toDF()
      .select(
        col("doc_id"), col("media_type"), col("n_bytes"),
        col("width"), col("height"), col("checksum").as("payload_sig"),
        (element_at(col("features"), 1) * 1024f).cast("int").as("f0_q"),
        (element_at(col("features"), 2) * 1024f).cast("int").as("f1_q"))
      .orderBy("doc_id")
  }

  /** One sampled, resized frame of a video payload. `frame_count` is
    * the source video's TOTAL frame count (the stts sample-table sum —
    * real header truth, constant across a video's rows); with the mvhd
    * duration it gives the real frame rate.
    */
  case class SampledFrame(
      doc_id: Long,
      frame_index: Int,
      frame_ts_ms: Long,
      width: Int,
      height: Int,
      frame_sig: Long,
      frame_count: Long)

  /** Frames sampled uniformly per video, each resized to this edge. */
  private val TargetEdge = 224
  private val MaxFramesPerVideo = 4

  /** m02: video frame sampling. Video rows FAN OUT — one input row
    * becomes up to [[MaxFramesPerVideo]] frame rows — via an iterator
    * `flatMap` inside `mapPartitions`: frames stream out as the
    * partition iterates, so a long video never materializes all its
    * frames at once (the property that matters when a partition holds
    * hours of footage). Since r16 the duration is REAL (ISO-BMFF mvhd
    * walk), and since r17 so is the FRAME COUNT: the stts sample-table
    * sum from the moov→trak→mdia→minf→stbl walk
    * ([[graft.functions.AvHeader.frameCount]]) — which with the
    * duration IS the real frame rate, codec-free; the r16 house-hash
    * fps stand-in is retired. The one stand-in left is `frame_sig`
    * (the CONTENT a codec would decode), spelled with the house
    * cross-engine hash so the ENTIRE gate stays DuckDB-oracle-able.
    * A real codec replaces only that call; the fan-out/schema/
    * partition shape is the product. Rows whose header does not parse
    * (non-MP4, truncated/corrupt moov, zero duration, no stts) emit
    * no frames — the m06/m07 pre-decode filter contract.
    */
  def m02FrameSample(s: SparkSession, dir: String): DataFrame =
    frameSample(avHeaderTable(s, dir)).toDF().orderBy("doc_id", "frame_index")

  /** One fixed-length analysis window of an audio payload. */
  case class AudioWindow(
      doc_id: Long,
      window_index: Int,
      start_ms: Long,
      end_ms: Long,
      sample_rate: Int,
      channels: Int,
      n_samples: Long,
      energy_ppm: Long)

  private val WindowMs = 1000L
  private val HopMs = 500L

  /** m03: audio windowing (framing) — the segmentation step every
    * speech/audio feature pipeline runs before anything expensive
    * (fbank/MFCC, ASR chunking). Audio rows FAN OUT into fixed-length
    * overlapping windows ([[WindowMs]] long, [[HopMs]] hop) through the
    * same streaming iterator shape as m02: windows emit as the
    * partition iterates, a long recording never materializes all its
    * windows at once. Since r16 the sample rate, channel count, and
    * duration are REAL: parsed from the payload's RIFF/WAVE header by
    * the m07 codec-free parse ([[graft.functions.AvHeader]]) — the r15
    * stubbed-constant header is retired. Per-window sample counts are
    * real arithmetic on the parsed rate; `energy_ppm` is the one
    * remaining stand-in for the frame feature a codec-backed
    * implementation would compute — the house cross-engine hash
    * (md5-prefix, exact integer ppm), so the ENTIRE gate is
    * DuckDB-oracle-able value-for-value. A clip shorter than one window
    * emits a single partial window; otherwise every window is
    * full-length and any sub-hop tail is dropped (standard framing).
    * Rows whose header does not parse (non-WAV, truncated/corrupt fmt,
    * zero-length audio) emit no windows — the pre-decode filter
    * semantics shared with m06/m07.
    */
  def m03AudioWindows(s: SparkSession, dir: String): DataFrame =
    audioWindows(avHeaderTable(s, dir)).toDF()
      .orderBy("doc_id", "window_index")

  /** Library form of the audio windower over any (id, binary payload)
    * frame: parses the WAV header per row (bounded prefix reads — see
    * [[graft.functions.AvHeader]]), then fans out windows through a
    * streaming iterator. Non-WAV and unparseable rows emit nothing.
    */
  def audioWindows(media: DataFrame, idCol: String = "doc_id",
      payloadCol: String = "payload"): org.apache.spark.sql.Dataset[AudioWindow] = {
    import graft.functions.{AvHeader, BottomKSketch}
    media
      .select(Cols.q(idCol).cast("long").as("doc_id"), Cols.q(payloadCol).as("payload"))
      .as[(Long, Array[Byte])](org.apache.spark.sql.Encoders.tuple(
        org.apache.spark.sql.Encoders.scalaLong, org.apache.spark.sql.Encoders.BINARY))
      .mapPartitions(_.flatMap { case (id, payload) =>
        val f = AvHeader.format(payload)
        val sr = AvHeader.sampleRate(payload)
        val ch = AvHeader.channels(payload)
        val dur = AvHeader.durationMs(payload)
        if (f == null || f.toString != "wav" || sr <= 0 || ch <= 0 || dur <= 0L)
          Iterator.empty
        else {
          val n =
            if (dur < WindowMs) 1
            else ((dur - WindowMs) / HopMs + 1L).toInt
          Iterator.tabulate(n) { i =>
            val start = i * HopMs
            val end = math.min(start + WindowMs, dur)
            val nSamples = (end - start) * sr / 1000L
            // house cross-engine hash -> exact integer parts-per-million
            val energyPpm = (BigInt(BottomKSketch.hash60(s"aw:$id:$i")) *
              1000000 / BigInt(BottomKSketch.HashDomain)).toLong
            AudioWindow(id, i, start, end, sr, ch, nSamples, energyPpm)
          }
        }
      })(org.apache.spark.sql.Encoders.product[AudioWindow])
  }

  /** Library form of the frame sampler over any (id, binary payload)
    * frame: parses the MP4 mvhd duration per row (bounded prefix
    * reads — see [[graft.functions.AvHeader]]), then fans frames out
    * through a streaming iterator. Non-MP4 and unparseable rows emit
    * nothing.
    */
  def frameSample(media: DataFrame, idCol: String = "doc_id",
      payloadCol: String = "payload"): org.apache.spark.sql.Dataset[SampledFrame] = {
    import graft.functions.{AvHeader, BottomKSketch}
    media
      .select(Cols.q(idCol).cast("long").as("doc_id"), Cols.q(payloadCol).as("payload"))
      .as[(Long, Array[Byte])](org.apache.spark.sql.Encoders.tuple(
        org.apache.spark.sql.Encoders.scalaLong, org.apache.spark.sql.Encoders.BINARY))
      .mapPartitions(_.flatMap { case (id, payload) =>
        val f = AvHeader.format(payload)
        val dur = AvHeader.durationMs(payload)
        // REAL frame count since r17: the stts sample-table sum
        // ([[graft.functions.AvHeader.frameCount]]) — the r16
        // house-hash fps stand-in is retired; you cannot sample more
        // frames than the track declares, so the fan-out width is
        // min(MaxFramesPerVideo, frame_count)
        val fc = AvHeader.frameCount(payload)
        if (f == null || f.toString != "mp4" || dur <= 0L || fc <= 0L)
          Iterator.empty
        else {
          val nFrames = math.min(MaxFramesPerVideo.toLong, fc).toInt
          Iterator.tabulate(nFrames) { i =>
            val tsMs = i * dur / nFrames // uniform sampling, exact
            SampledFrame(id, i, tsMs, TargetEdge, TargetEdge,
              BottomKSketch.hash60(s"fr:$id:$i"), // decoded-content stand-in
              fc)
          }
        }
      })(org.apache.spark.sql.Encoders.product[SampledFrame])
  }

  /** Exact payload dedup over any media frame — the checksum-level
    * pass a multimodal pipeline runs BEFORE decode (decoding the same
    * bytes twice is pure waste, and media corpora are full of
    * byte-identical re-uploads): group by (media_type, md5(payload)),
    * keep the lowest id as the canonical copy. Codec-free — it reads
    * ONLY bytes, so unlike m01–m03's decode plumbing it is fully
    * oracle-able (the gate's synthesized payloads are UTF-8 text,
    * which DuckDB md5's to the same digest). One mergeable
    * aggregation; the payload column itself never shuffles (the hash
    * and byte length compute in-scan and only those travel).
    */
  def mediaDedup(media: org.apache.spark.sql.Dataset[MediaRecord]): DataFrame =
    media.toDF()
      .select(col("doc_id"), col("media_type"),
        md5(col("payload")).as("payload_md5"),
        length(col("payload")).cast("long").as("n_bytes"))
      .groupBy(col("media_type"), col("payload_md5"), col("n_bytes"))
      .agg(min(col("doc_id")).as("keep_doc_id"),
        count(lit(1)).as("n_copies"))

  /** m04: gate binding of [[mediaDedup]] on the synthesized media
    * table. Fully SQL-oracled — the one multimodal entry where
    * nothing is stubbed (no codec in the path, bytes only).
    */
  def m04MediaDedup(s: SparkSession, dir: String): DataFrame =
    mediaDedup(mediaTable(s, dir))
      .orderBy("media_type", "payload_md5")

  /** Media table with REAL container headers (m06 fixture): payloads
    * synthesized from `documents` carrying byte-exact PNG / JPEG / GIF
    * header structure (signature, IHDR chunk, marker-segment chain with
    * a VARIABLE-length COM segment before the SOF0, logical screen
    * descriptor) around the doc text as body — built as a hex string
    * through codegen'd built-ins then `unhex`, so the DuckDB oracle can
    * construct the IDENTICAL blob and parse it back with independent
    * byte reads. Dimensions derive from doc_id (w = 160 + 7·id mod
    * 1280, h = 120 + 13·id mod 720); format round-robins on id mod 3.
    * Malformed rows are part of the fixture: id % 17 == 0 truncates the
    * payload to its first 5 bytes (a JPEG keeps its detectable SOI —
    * format without dims; PNG/GIF magics need 8/6 bytes — no format at
    * all), else id % 13 == 0 zeroes the first byte (no magic matches).
    */
  private[operators] def mediaHeaderTable(s: SparkSession, dir: String): DataFrame = {
    def hex4(c: org.apache.spark.sql.Column) = lpad(hex(c), 4, "0")
    def hex8(c: org.apache.spark.sql.Column) = lpad(hex(c), 8, "0")
    def le4(c: org.apache.spark.sql.Column) = // u16 little-endian hex
      concat(substring(hex4(c), 3, 2), substring(hex4(c), 1, 2))
    val w = (lit(160) + pmod(col("doc_id") * 7, lit(1280))).cast("int")
    val h = (lit(120) + pmod(col("doc_id") * 13, lit(720))).cast("int")
    val comLen = (pmod(col("doc_id"), lit(23)) + 1).cast("int") // 1..23
    val body = hex(substring(col("text"), 1, 32))
    val pngHex = concat(
      lit("89504E470D0A1A0A"), // signature
      lit("0000000D"), lit("49484452"), // IHDR length 13 + type
      hex8(w), hex8(h),
      lit("0806000000"), // bit depth 8, RGBA, deflate, adaptive, no interlace
      lit("DEADBEEF"), // CRC filler (parsers read dims, not the CRC)
      body)
    val jpegHex = concat(
      lit("FFD8"), // SOI
      lit("FFE0"), lit("0010"), lit("4A46494600"), lit("0101"), lit("00"),
      lit("0001"), lit("0001"), lit("00"), lit("00"), // APP0/JFIF, 16 bytes
      lit("FFFE"), hex4(comLen + 2), repeat(lit("41"), comLen), // COM, variable
      lit("FFC0"), lit("0011"), lit("08"), hex4(h), hex4(w), // SOF0: P, Y, X
      lit("03"), lit("012200"), lit("021101"), lit("031101"), // 3 components
      body)
    val gifHex = concat(
      lit("474946383961"), // GIF89a
      le4(w), le4(h), // logical screen descriptor, u16 LITTLE-endian
      lit("F70000"), // packed fields, bg color, aspect
      body)
    val full = when(pmod(col("doc_id"), lit(3)) === 0, pngHex)
      .when(pmod(col("doc_id"), lit(3)) === 1, jpegHex)
      .otherwise(gifHex)
    val hx = when(pmod(col("doc_id"), lit(17)) === 0, substring(full, 1, 10))
      .when(pmod(col("doc_id"), lit(13)) === 0,
        concat(lit("00"), substring(full, 3, Int.MaxValue)))
      // r17: FF00 byte-stuffing pair spliced right after the APP0
      // segment (byte offset 20 = hex char 40) on a JPEG subset —
      // stuffing is legal only inside entropy data, so the marker walk
      // must STOP and serve null dims (format stays jpeg, SOI intact).
      // This makes the parser/oracle stuffing semantics load-bearing
      // in the gate instead of latent (ADVICE r16 #1).
      .when(pmod(col("doc_id"), lit(19)) === 0 && pmod(col("doc_id"), lit(3)) === 1,
        concat(substring(full, 1, 40), lit("FF00"),
          substring(full, 41, Int.MaxValue)))
      .otherwise(full)
    Tables.documents(s, dir).select(col("doc_id"), unhex(hx).as("payload"))
  }

  /** Header-parse pass over any binary media frame — format, pixel
    * dimensions, and the aspect-ratio bucket, all from header bytes via
    * the codegen'd [[graft.functions.MediaHeader]] expressions; the
    * payload never leaves the scan, only the few parsed fields travel.
    * The bucket rule is exact integer arithmetic (no float ratio):
    * wide if 3w > 4h, tall if 3h > 4w, square otherwise; null dims →
    * null bucket. This is the pre-decode resolution/aspect filter a
    * training pipeline runs over 100 TB of media BEFORE any codec.
    */
  def mediaHeaders(media: DataFrame, idCol: String = "doc_id",
      payloadCol: String = "payload"): DataFrame = {
    val s = media.sparkSession
    val p = Cols.q(payloadCol)
    val w = col("width")
    val h = col("height")
    media.select(Cols.q(idCol).as("doc_id"),
        graft.functions.MediaHeader.mediaFormat(s, p).as("format"),
        graft.functions.MediaHeader.mediaWidth(s, p).as("width"),
        graft.functions.MediaHeader.mediaHeight(s, p).as("height"),
        length(p).cast("long").as("n_bytes"))
      .withColumn("aspect_bucket",
        when(w.isNull || h.isNull, lit(null).cast("string"))
          .when(w * 3 > h * 4, lit("wide"))
          .when(h * 3 > w * 4, lit("tall"))
          .otherwise(lit("square")))
  }

  /** m06: gate binding of [[mediaHeaders]] over the real-header fixture
    * table. Fully SQL-oracled — DuckDB rebuilds the identical payload
    * hex and re-parses it with independent substr/cast byte reads (the
    * JPEG marker walk as a recursive CTE), so format, width, height,
    * bucket AND the malformed-row null contract are all cross-engine
    * checked value-for-value.
    */
  def m06MediaHeader(s: SparkSession, dir: String): DataFrame =
    mediaHeaders(mediaHeaderTable(s, dir))
      .select(col("doc_id"), col("format"), col("width"), col("height"),
        col("aspect_bucket"), col("n_bytes"))
      .orderBy("doc_id")

  /** Media table with REAL audio/video container headers (m07 fixture,
    * the WAV/MP4 sibling of [[mediaHeaderTable]]): payloads synthesized
    * from `documents` carrying byte-exact RIFF/WAVE and ISO-BMFF
    * structure around the doc text — built as a hex string through
    * codegen'd built-ins then `unhex`, so the DuckDB oracle constructs
    * the IDENTICAL blob and re-parses it with independent byte reads.
    *
    * WAV rows (id % 3 == 1): `RIFF` + riff-size + `WAVE`, then a
    * VARIABLE-length JUNK chunk (1..19 bytes, odd sizes exercise the
    * word-alignment pad byte) before `fmt ` (PCM, channels 1..2, rate
    * from {8000,16000,24000,44100}, bits 8/16) and `data` — whose
    * DECLARED size encodes 500..4000 ms of audio while the carried
    * bytes are just the doc-text prefix: the truncated-object-prefix
    * regime a 100 TB pre-filter actually scans (headers declare, the
    * parse never needs the payload). MP4 rows (id % 3 == 2): `ftyp` +
    * a variable-length `free` box + `moov`/`mvhd` with timescale from
    * {1000,90000,600,48000} and version 0 OR 1 (u32 vs u64 field
    * widths) selected by (id div 3) % 4 == 0, plus (r17) a real
    * trak > mdia > (mdhd + minf > stbl > stts) subtree carrying the
    * per-track timescale and the frame count. id % 3 == 0 rows carry
    * the raw text bytes (no magic → the all-null contract row).
    * Malformed overlays: id % 17 == 0 truncates to 5 bytes (neither
    * magic survives — WAV needs 12, MP4 needs 8); id % 13 == 0 zeroes
    * the first EIGHT bytes (RIFF lives at 0-3, ftyp at 4-7 — no magic
    * survives); id % 11 == 0 truncates to 20 bytes
    * (BOTH magics survive — format set, every parsed field null).
    */
  private[operators] def avHeaderTable(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.Column
    def hex4(c: Column) = lpad(hex(c), 4, "0")
    def hex8(c: Column) = lpad(hex(c), 8, "0")
    def le4(c: Column) = // u16 little-endian hex
      concat(substring(hex4(c), 3, 2), substring(hex4(c), 1, 2))
    def le8(c: Column) = // u32 little-endian hex
      concat(substring(hex8(c), 7, 2), substring(hex8(c), 5, 2),
        substring(hex8(c), 3, 2), substring(hex8(c), 1, 2))
    val d = col("doc_id")
    val sr = element_at(
      array(lit(8000L), lit(16000L), lit(24000L), lit(44100L)),
      (pmod(d, lit(4)) + 1).cast("int"))
    val ch = pmod(d, lit(2)) + 1 // 1..2
    val bits = lit(8) + pmod(expr("doc_id div 2"), lit(2)) * 8 // 8 or 16
    val ba = ch * (bits / lit(8)).cast("long") // block align: bytes/frame
    // declared duration 500..3999 ms -> sample count at the row's rate
    // (spelled as one integer-div expr so Spark and the oracle share
    // the exact arithmetic)
    val nSamp = expr("(500 + (doc_id * 37) % 3500) * " +
      "(CASE doc_id % 4 WHEN 0 THEN 8000 WHEN 1 THEN 16000 WHEN 2 THEN 24000 ELSE 44100 END) div 1000")
    val dataSize = nSamp * ba
    val junk = pmod(d, lit(19)) + 1 // 1..19; odd -> pad byte
    val pad = pmod(junk, lit(2))
    val body = hex(substring(col("text"), 1, 32))
    val riffSize = lit(4L) + lit(8L) + junk + pad + lit(24L) + lit(8L) + dataSize
    val wavHex = concat(
      lit("52494646"), le8(riffSize), lit("57415645"), // RIFF size WAVE
      lit("4A554E4B"), le8(junk), repeat(lit("41"), junk.cast("int")), // JUNK
      when(pad === 1, lit("00")).otherwise(lit("")), // word-align pad byte
      lit("666D7420"), le8(lit(16L)), // fmt , size 16
      le4(lit(1L)), le4(ch), le8(sr), le8(sr * ba), le4(ba), le4(bits),
      lit("64617461"), le8(dataSize), // data + DECLARED size
      body)
    val ver1 = pmod(expr("doc_id div 3"), lit(4)) === 0
    val ts = element_at(
      array(lit(1000L), lit(90000L), lit(600L), lit(48000L)),
      (pmod(d, lit(4)) + 1).cast("int"))
    val durUnits = expr("(500 + (doc_id * 37) % 3500) * " +
      "(CASE doc_id % 4 WHEN 0 THEN 1000 WHEN 1 THEN 90000 WHEN 2 THEN 600 ELSE 48000 END) div 1000")
    val mvhdHex = when(ver1,
        concat(lit("00000078"), lit("6D766864"), lit("01000000"), // v1, size 120
          repeat(lit("00"), 16), // ctime/mtime u64s
          hex8(ts), lit("00000000"), hex8(durUnits))) // duration u64be
      .otherwise(
        concat(lit("0000006C"), lit("6D766864"), lit("00000000"), // v0, size 108
          lit("00000000"), lit("00000000"), // ctime/mtime u32s
          hex8(ts), hex8(durUnits)))
    // r17: a REAL track subtree — trak > mdia > (mdhd + minf > stbl >
    // stts) — so frame count (stts sample table) and per-track
    // timescale (mdhd) are genuine header reads, retiring m02's
    // house-hash fps stand-in. Per-doc truth: media timescale from
    // {600,1000,12288,90000} by (id div 5) % 4; frame count =
    // durationMs · fps_nominal div 1000 with fps_nominal = 4 +
    // (id·7) % 27 (4..30 fps → 2..119 frames); stts holds ONE entry
    // (frame_count, mediaDurUnits div frame_count). All spelled as
    // integer-div exprs the oracle restates exactly.
    val mts = element_at(
      array(lit(600L), lit(1000L), lit(12288L), lit(90000L)),
      (pmod(expr("doc_id div 5"), lit(4)) + 1).cast("int"))
    val mDurUnits = expr("(500 + (doc_id * 37) % 3500) * " +
      "(CASE (doc_id div 5) % 4 WHEN 0 THEN 600 WHEN 1 THEN 1000 WHEN 2 THEN 12288 ELSE 90000 END) div 1000")
    val nFrames = expr("((500 + (doc_id * 37) % 3500) * (4 + (doc_id * 7) % 27)) div 1000")
    val sttsDelta = expr(
      "((500 + (doc_id * 37) % 3500) * " +
        "(CASE (doc_id div 5) % 4 WHEN 0 THEN 600 WHEN 1 THEN 1000 WHEN 2 THEN 12288 ELSE 90000 END) div 1000)" +
        " div (((500 + (doc_id * 37) % 3500) * (4 + (doc_id * 7) % 27)) div 1000)")
    val mdhdHex = concat( // v0, size 32: ts + duration in media units
      lit("00000020"), lit("6D646864"), lit("00000000"),
      lit("00000000"), lit("00000000"), hex8(mts), hex8(mDurUnits),
      lit("55C40000")) // language 'und' + pre_defined
    val sttsHex = concat( // size 24: one (sample_count, delta) entry
      lit("00000018"), lit("73747473"), lit("00000000"),
      lit("00000001"), hex8(nFrames), hex8(sttsDelta))
    val stblHex = concat(lit("00000020"), lit("7374626C"), sttsHex) // size 32
    val minfHex = concat(lit("00000028"), lit("6D696E66"), stblHex) // size 40
    val mdiaHex = concat(lit("00000050"), lit("6D646961"), mdhdHex, minfHex) // size 80
    val trakHex = concat(lit("00000058"), lit("7472616B"), mdiaHex) // size 88
    val mp4Hex = concat(
      lit("00000010"), lit("66747970"), lit("69736F6D"), lit("00000200"), // ftyp isom
      hex8(junk + 8), lit("66726565"), repeat(lit("41"), junk.cast("int")), // free box
      // moov = mvhd (120/108 incl. 80-byte matrix filler) + trak (88)
      when(ver1, lit("000000D8")).otherwise(lit("000000CC")), lit("6D6F6F76"),
      mvhdHex, repeat(lit("00"), 80), // rate/volume/matrix/... filler (in mvhd)
      trakHex,
      body)
    // r17: the synthesis is STAGED into separate column expressions. As
    // one nested when/concat tree the generated projection method blew
    // Janino's 64 KB method limit ("Code grows beyond 64 KB") and Spark
    // silently fell back to INTERPRETED evaluation — the fixture build
    // alone cost ~1.3 s of m02/m03/m07's wall at sf0.1 (~260 µs/row).
    // Top-level column expressions get their own generated methods
    // (splitExpressions has boundaries to cut at), so the whole stage
    // compiles again; per-branch laziness is kept by guarding each
    // container's hex with its own id-class WHEN and coalescing. Same
    // expressions, same rows → byte-identical payloads (oracle-pinned).
    val staged = Tables.documents(s, dir).select(
      col("doc_id"),
      when(pmod(d, lit(3)) === 1, wavHex).as("__wav"),
      when(pmod(d, lit(3)) === 2, mp4Hex).as("__mp4"),
      body.as("__body"))
    val full = coalesce(col("__wav"), col("__mp4"), col("__body"))
    val hx = when(pmod(d, lit(17)) === 0, substring(full, 1, 10))
      // zero the first EIGHT bytes: kills BOTH magics (RIFF lives at
      // 0-3, ftyp at 4-7 — an m06-style single-byte zero would be a
      // no-op for MP4, whose size field already starts 0x00)
      .when(pmod(d, lit(13)) === 0,
        concat(lit("0000000000000000"), substring(full, 17, Int.MaxValue)))
      .when(pmod(d, lit(11)) === 0, substring(full, 1, 40))
      .otherwise(full)
    staged.select(col("doc_id"), unhex(hx).as("payload"))
  }

  /** Header-parse pass over any binary audio/video frame — container
    * format, sample rate, channels, bit depth, and declared duration,
    * all from header bytes via the codegen'd
    * [[graft.functions.AvHeader]] expressions; the payload never leaves
    * the scan, only the parsed fields travel. The m07 sibling of
    * [[mediaHeaders]]: the pre-decode sample-rate/duration filter a
    * training pipeline runs over 100 TB of audio/video BEFORE any
    * codec.
    */
  def avHeaders(media: DataFrame, idCol: String = "doc_id",
      payloadCol: String = "payload"): DataFrame = {
    val s = media.sparkSession
    val p = Cols.q(payloadCol)
    media.select(Cols.q(idCol).as("doc_id"),
      graft.functions.AvHeader.avFormat(s, p).as("av_format"),
      graft.functions.AvHeader.avSampleRate(s, p).as("sample_rate"),
      graft.functions.AvHeader.avChannels(s, p).as("channels"),
      graft.functions.AvHeader.avBits(s, p).as("bits_per_sample"),
      graft.functions.AvHeader.avDurationMs(s, p).as("duration_ms"),
      graft.functions.AvHeader.avFrameCount(s, p).as("frame_count"),
      length(p).cast("long").as("n_bytes"))
  }

  /** m07: gate binding of [[avHeaders]] over the real-header fixture
    * table. Fully SQL-oracled — DuckDB rebuilds the identical payload
    * hex and re-parses it with independent substr/cast byte reads (the
    * RIFF chunk walk and the ISO-BMFF box walk as recursive CTEs), so
    * format, fmt fields, duration AND the malformed-row null contract
    * are all cross-engine checked value-for-value.
    */
  def m07AvHeader(s: SparkSession, dir: String): DataFrame =
    avHeaders(avHeaderTable(s, dir))
      .orderBy("doc_id")

  /** 64-bit perceptual fingerprint per media item: the REAL DCT pHash
    * ([[graft.functions.DctPhash]] — box-resample to 32x32, 2-D DCT-II,
    * top-left 8x8 median split), computed natively INSIDE the scan so
    * the payload bytes never leave it; only the 8-byte code travels.
    * The only stubbed step is the bytes→pixels decode, embedded in the
    * expression as an identity raster codec (payload bytes ARE the
    * grayscale pixels — what decoding an uncompressed PGM/BMP body
    * does; no media libs in this container). Because the raster is the
    * payload, a few-byte payload delta is a few-pixel delta, and the
    * hash's LOCALITY — near-identical content landing within a few
    * bits, distinct content near 32 — is real and measured in the spec,
    * not asserted. A real deployment swaps only the raster step for a
    * JPEG/PNG decode.
    */
  def mediaPhash(media: org.apache.spark.sql.Dataset[MediaRecord]): DataFrame =
    media.toDF()
      .select(col("doc_id"), col("media_type"),
        graft.functions.DctPhash.phash(media.sparkSession, col("payload"))
          .as("phash"))

  /** Hamming near-dup pairs over any 64-bit fingerprint frame, blocked
    * by a partition column (cross-modal pairs are meaningless):
    * the d04 pigeonhole — each code splits into four 16-bit chunks, a
    * pair at Hamming distance <= 3 must agree on at least one chunk
    * (guaranteed recall at the [[Dedup.simhashPairs]] threshold), so
    * candidates come from per-(block, chunk, key) buckets with the
    * standard size cap enforced BEFORE list aggregation (a degenerate
    * corpus — millions of identical fingerprints — caps out instead of
    * going quadratic). Verification is a map-side XOR popcount on the
    * candidate row; dedup runs AFTER the distance filter (the d04/d08
    * lesson: deduping first shuffles the full candidate volume to save
    * nothing).
    */
  def phashNearDups(codes: DataFrame, idCol: String = "doc_id",
      codeCol: String = "phash", blockCol: String = "media_type",
      maxDistance: Int = 3, maxBucketSize: Int = 1000): DataFrame = {
    require(maxDistance >= 0 && maxDistance <= 3,
      s"4x16-bit pigeonhole guarantees recall only to distance 3: $maxDistance")
    val sig = codes.select(Cols.q(idCol).as("doc_id"), Cols.q(blockCol).as("block"),
      Cols.q(codeCol).cast("long").as("code"))
    val chunked = sig.select(
        struct(col("doc_id"), col("code"), col("block")).as("dc"),
        explode(array((0 until 4).map(c =>
          struct(lit(c).as("chunk"),
            shiftright(col("code"), c * 16).bitwiseAND(0xFFFFL).as("key"))): _*)).as("cb"))
      .select(col("dc"), col("dc.block").as("block"),
        col("cb.chunk").as("chunk"), col("cb.key").as("key"))
    Dedup.bucketPairs(Dedup.cappedIdBuckets(chunked, Seq("block", "chunk", "key"), "dc",
        maxBucketSize.toLong, minSize = 2L))
      .select(col("d1.block").as(blockCol),
        col("d1.doc_id").as("id1"), col("d2.doc_id").as("id2"),
        bit_count(col("d1.code").bitwiseXOR(col("d2.code"))).as("hamming"))
      .filter(col("hamming") <= maxDistance)
      .dropDuplicates(blockCol, "id1", "id2")
  }

  /** m05: gate binding of [[phashNearDups]] — DCT pHash fingerprints of
    * the real media table plus DETERMINISTIC planted twins: the first
    * 25 items with two hash-chosen PAYLOAD bytes perturbed (letters
    * case-flip, spaces bump to '@'), ids offset by 100000 — the d12
    * discipline of synthesizing the dup-bearing input from the corpus
    * itself. The perturbation is a few-pixel delta through the
    * identity-raster decode, so the twins exercise the REAL locality
    * claim end to end (payload edit → pixel delta → low-frequency DCT
    * shift → small Hamming distance → pigeonhole band → pair): a twin
    * surfaces iff the pHash genuinely lands it within the distance-3
    * band — measured 19/25 at sf0.001 and 21/25 at sf0.01, with zero
    * natural corpus pairs inside the band (nearest natural pair: 4
    * bits). rows-only oracle (the raster decode is the container
    * stub); TextSpec pins the planted recall floor, the
    * only-planted-pairs property, and determinism.
    */
  def m05PhashNearDups(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.Column
    val media = mediaTable(s, dir).toDF()
    // flip one 1-based position of an ASCII string: letters case-flip
    // (xor 0x20), a space becomes '@' (never NUL/empty, so length —
    // and therefore the raster side — is preserved)
    def flipAt(t: Column, p: Column): Column = {
      val code = ascii(t.substr(p, lit(1)))
      val flipped = when(code === 32, lit(64))
        .otherwise(code.bitwiseXOR(lit(32)))
      concat(t.substr(lit(1), p - lit(1)), chr(flipped.cast("long")),
        t.substr(p + lit(1), lit(Int.MaxValue)))
    }
    val text = col("payload").cast("string")
    val len = length(text).cast("long")
    val p1 = pmod(xxhash64(col("doc_id")), len).cast("int") + lit(1)
    val p2 = pmod(xxhash64(col("doc_id") * 31), len).cast("int") + lit(1)
    val twins = media.filter(col("doc_id") < 25)
      .select((col("doc_id") + 100000L).as("doc_id"), col("media_type"),
        flipAt(flipAt(text, p1), p2).cast("binary").as("payload"))
    val all = media.unionByName(twins)
      .as[MediaRecord](org.apache.spark.sql.Encoders.product[MediaRecord])
    phashNearDups(mediaPhash(all))
      .orderBy("media_type", "id1", "id2")
  }
}
