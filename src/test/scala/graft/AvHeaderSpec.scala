package graft

import org.apache.spark.sql.functions._
import graft.functions.AvHeader
import graft.operators.Multimodal

/** m07 codec-free WAV/MP4 header parsing: known-vector pins over
  * hand-built byte-exact headers (largesize boxes, to-EOF boxes, v1
  * mvhd, all-ones unknown durations — corners the fixture-driven
  * DuckDB oracle never constructs), the malformed-header null
  * contract, codegen/interpreted agreement, and the m03 consumer.
  */
class AvHeaderSpec extends SparkSpec {

  private def hexBytes(hex: String): Array[Byte] =
    hex.replaceAll("\\s", "").grouped(2).map(Integer.parseInt(_, 16).toByte).toArray

  // canonical 16 kHz stereo 16-bit WAV: JUNK(3 bytes, odd -> pad),
  // fmt(16), data declares 64000 bytes = 16000 frames = 1000 ms
  private val wavHex =
    "52494646" + "64FA0000" + "57415645" + // RIFF + size + WAVE
      "4A554E4B" + "03000000" + "414141" + "00" + // JUNK len 3 + pad
      "666D7420" + "10000000" + // fmt , 16
      "0100" + "0200" + "803E0000" + "00FA0000" + "0400" + "1000" + // PCM, 2ch, 16000, 64000, 4, 16
      "64617461" + "00FA0000" + // data, 64000 declared
      "AABB" // carried bytes (truncated object prefix)

  // mp4: ftyp + free(9) + moov[mvhd v0 ts=90000 dur=225000 -> 2500 ms]
  private val mp4Hex =
    "00000010" + "66747970" + "69736F6D" + "00000200" +
      "00000009" + "66726565" + "41" +
      "00000074" + "6D6F6F76" +
      "0000006C" + "6D766864" + "00000000" + "00000000" + "00000000" +
      "00015F90" + "00036EE8" + ("00" * 80)

  test("known vectors: WAV fmt/data chunk walk with pad byte, MP4 mvhd v0 behind a free box") {
    val w = hexBytes(wavHex)
    assert(AvHeader.format(w).toString === "wav")
    assert(AvHeader.sampleRate(w) === 16000)
    assert(AvHeader.channels(w) === 2)
    assert(AvHeader.bits(w) === 16)
    assert(AvHeader.durationMs(w) === 1000L) // 64000/4 frames at 16 kHz
    val m = hexBytes(mp4Hex)
    assert(AvHeader.format(m).toString === "mp4")
    assert(AvHeader.sampleRate(m) === -1) // fmt fields are RIFF-only
    assert(AvHeader.durationMs(m) === 2500L) // 225000 / 90000 * 1000
    assert(AvHeader.frameCount(m) === -1L) // no trak: count unknown
  }

  // minimal trak subtree: mdhd(ts=1000, dur=2500) + stts entries
  private def trakHex(sttsPayload: String, sttsSize: Int): String = {
    val stts = f"$sttsSize%08X" + "73747473" + sttsPayload
    val stbl = f"${8 + sttsSize}%08X" + "7374626C" + stts
    val minf = f"${16 + sttsSize}%08X" + "6D696E66" + stbl
    val mdhd = "00000020" + "6D646864" + "00000000" + "00000000" +
      "00000000" + "000003E8" + "000009C4" + "55C40000"
    val mdia = f"${56 + sttsSize}%08X" + "6D646961" + mdhd + minf
    f"${64 + sttsSize}%08X" + "7472616B" + mdia
  }
  private def mp4WithTrak(sttsPayload: String, sttsSize: Int): Array[Byte] = {
    val trak = trakHex(sttsPayload, sttsSize)
    val moovSize = 8 + 108 + trak.length / 2
    hexBytes(
      "00000010" + "66747970" + "69736F6D" + "00000200" +
        f"$moovSize%08X" + "6D6F6F76" +
        "0000006C" + "6D766864" + "00000000" + "00000000" + "00000000" +
        "00015F90" + "00036EE8" + ("00" * 80) + trak)
  }

  test("frame count: stts walk — multi-entry sum, empty table, version/cap/truncation nulls") {
    // two entries: 100 frames + 20 frames = 120
    val two = mp4WithTrak("00000000" + "00000002" +
      "00000064" + "000003E8" + "00000014" + "000007D0", 32)
    assert(AvHeader.frameCount(two) === 120L)
    // one entry (the fixture shape)
    assert(AvHeader.frameCount(
      mp4WithTrak("00000000" + "00000001" + "0000004B" + "00000021", 24)) === 75L)
    // empty sample table: a real 0, not unknown
    assert(AvHeader.frameCount(
      mp4WithTrak("00000000" + "00000000", 16)) === 0L)
    // stts version != 0 -> unknown
    assert(AvHeader.frameCount(
      mp4WithTrak("01000000" + "00000001" + "0000004B" + "00000021", 24)) === -1L)
    // entry_count beyond MaxSttsEntries -> unknown, never a partial sum
    assert(AvHeader.frameCount(
      mp4WithTrak("00000000" + "00001001" + "0000004B" + "00000021", 24)) === -1L)
    // declared entries overrun the stts box -> unknown
    assert(AvHeader.frameCount(
      mp4WithTrak("00000000" + "00000002" + "0000004B" + "00000021", 24)) === -1L)
    // non-MP4 / no moov
    assert(AvHeader.frameCount(hexBytes(wavHex)) === -1L)
    assert(AvHeader.frameCount(null) === -1L)
  }

  test("mvhd v1 (u64 fields), largesize moov, and to-EOF moov all serve the duration") {
    // mvhd v1: ts=1000 at +28, duration u64 at +32 = 3999 -> 3999 ms
    val mvhdV1 = "00000078" + "6D766864" + "01000000" + ("00" * 16) +
      "000003E8" + "0000000000000F9F" + ("00" * 80)
    val v1 = hexBytes(
      "00000010" + "66747970" + "69736F6D" + "00000200" +
        "00000080" + "6D6F6F76" + mvhdV1)
    assert(AvHeader.durationMs(v1) === 3999L)
    // size==1: u64 largesize follows the type (header is 16 bytes)
    val large = hexBytes(
      "00000010" + "66747970" + "69736F6D" + "00000200" +
        "00000001" + "6D6F6F76" + "0000000000000088" + mvhdV1)
    assert(AvHeader.durationMs(large) === 3999L)
    // size==0: the box extends to EOF
    val toEof = hexBytes(
      "00000010" + "66747970" + "69736F6D" + "00000200" +
        "00000000" + "6D6F6F76" + mvhdV1)
    assert(AvHeader.durationMs(toEof) === 3999L)
  }

  test("null contract: truncation, unknown durations, zero fields, bad versions, walk caps") {
    // truncated to 5 bytes: neither magic survives (WAV needs 12, MP4 8)
    assert(AvHeader.format(hexBytes("5249464664FA")) === null)
    assert(AvHeader.format(hexBytes("0000001066")) === null)
    // 20 bytes: both magics survive, no parseable fields
    assert(AvHeader.format(hexBytes(wavHex).take(20)) != null)
    assert(AvHeader.sampleRate(hexBytes(wavHex).take(20)) === -1)
    assert(AvHeader.format(hexBytes(mp4Hex).take(20)).toString === "mp4")
    assert(AvHeader.durationMs(hexBytes(mp4Hex).take(20)) === -1L)
    // all-ones mvhd duration is "unknown" per ISO-BMFF 8.2.2 -> null
    val unknownV0 = hexBytes(
      "00000010" + "66747970" + "69736F6D" + "00000200" +
        "00000074" + "6D6F6F76" +
        "0000006C" + "6D766864" + "00000000" + "00000000" + "00000000" +
        "000003E8" + "FFFFFFFF" + ("00" * 80))
    assert(AvHeader.durationMs(unknownV0) === -1L)
    // zero timescale cannot divide -> null
    val zeroTs = hexBytes(
      "00000010" + "66747970" + "69736F6D" + "00000200" +
        "00000074" + "6D6F6F76" +
        "0000006C" + "6D766864" + "00000000" + "00000000" + "00000000" +
        "00000000" + "00000100" + ("00" * 80))
    assert(AvHeader.durationMs(zeroTs) === -1L)
    // unknown mvhd version -> null
    val badVer = hexBytes(
      "00000010" + "66747970" + "69736F6D" + "00000200" +
        "00000074" + "6D6F6F76" +
        "0000006C" + "6D766864" + "02000000" + "00000000" + "00000000" +
        "000003E8" + "00000100" + ("00" * 80))
    assert(AvHeader.durationMs(badVer) === -1L)
    // zero channels / zero sample rate are malformed -> ALL fmt fields null
    val zeroCh = wavHex.replace("0100" + "0200" + "803E0000", "0100" + "0000" + "803E0000")
    assert(AvHeader.sampleRate(hexBytes(zeroCh)) === -1)
    assert(AvHeader.bits(hexBytes(zeroCh)) === -1)
    // fmt declared shorter than the 16 canonical bytes -> null
    val shortFmt = wavHex.replace("666D7420" + "10000000", "666D7420" + "0F000000")
    assert(AvHeader.sampleRate(hexBytes(shortFmt)) === -1)
    // data chunk missing -> duration null while fmt fields parse
    val noData = wavHex.replace("64617461", "6C697374")
    assert(AvHeader.sampleRate(hexBytes(noData)) === 16000)
    assert(AvHeader.durationMs(hexBytes(noData)) === -1L)
    // walk cap: 100 minimal chunks before fmt stops at MaxChunks
    val manyChunks = "52494646" + "64FA0000" + "57415645" +
      ("4A554E4B" + "00000000") * 100 +
      "666D7420" + "10000000" + "0100" + "0200" + "803E0000" + "00FA0000" + "0400" + "1000"
    assert(AvHeader.sampleRate(hexBytes(manyChunks)) === -1)
    // empty / unknown payloads
    assert(AvHeader.format(Array.emptyByteArray) === null)
    assert(AvHeader.format("plain text / no container".getBytes("UTF-8")) === null)
    assert(AvHeader.durationMs(null) === -1L)
  }

  test("expression path == static path, codegen AND interpreted (the m07 scan stays fused)") {
    import spark.implicits._
    val payloads = Seq(wavHex, mp4Hex, "5249464664FA", "00")
    val df = payloads.zipWithIndex.map { case (hx, i) => (i.toLong, hexBytes(hx)) }
      .toDF("id", "payload")
    def collectAll() = Multimodal.avHeaders(df, "id", "payload")
      .orderBy("doc_id").collect().map(_.toSeq)
    val expected = payloads.zipWithIndex.map { case (hx, i) =>
      val b = hexBytes(hx)
      val f = Option(AvHeader.format(b)).map(_.toString).orNull
      def n(v: Int) = if (v < 0) null else v
      val d = AvHeader.durationMs(b)
      val fc = AvHeader.frameCount(b)
      Seq[Any](i.toLong, f, n(AvHeader.sampleRate(b)), n(AvHeader.channels(b)),
        n(AvHeader.bits(b)), if (d < 0L) null else d,
        if (fc < 0L) null else fc, b.length.toLong)
    }
    assert(collectAll().toSeq === expected)
    val ws = "spark.sql.codegen.wholeStage"
    val fm = "spark.sql.codegen.factoryMode"
    val (ws0, fm0) = (spark.conf.get(ws), spark.conf.get(fm, "FALLBACK"))
    try {
      spark.conf.set(ws, "false"); spark.conf.set(fm, "NO_CODEGEN")
      assert(collectAll().toSeq === expected)
    } finally { spark.conf.set(ws, ws0); spark.conf.set(fm, fm0) }
  }

  test("m07 gate: deterministic, malformed rows keep the documented contract") {
    val out = Multimodal.m07AvHeader(spark, "/root/testdata/sf0.001").collect()
    assert(out.length === 500)
    out.foreach { r =>
      val id = r.getLong(0)
      if (id % 17 == 0) {
        // 5-byte truncation: neither magic survives
        (1 to 6).foreach(i => assert(r.isNullAt(i), s"id $id col $i"))
        assert(r.getLong(7) === 5L)
      } else if (id % 13 == 0) {
        (1 to 6).foreach(i => assert(r.isNullAt(i), s"id $id col $i"))
      } else if (id % 11 == 0 && id % 3 != 0) {
        // 20-byte truncation: format survives, every field null
        assert(r.getString(1) === (if (id % 3 == 1) "wav" else "mp4"))
        (2 to 6).foreach(i => assert(r.isNullAt(i), s"id $id col $i"))
      } else if (id % 3 == 1) {
        assert(r.getString(1) === "wav")
        val sr = Seq(8000, 16000, 24000, 44100)((id % 4).toInt)
        assert(r.getInt(2) === sr)
        assert(r.getInt(3) === 1 + (id % 2).toInt)
        assert(r.getInt(4) === 8 + 8 * ((id / 2) % 2).toInt)
        val durDeclared = 500 + (id * 37) % 3500
        // exact: declared ms -> sample count (floor) -> parsed ms (floor)
        assert(r.getLong(5) === durDeclared * sr / 1000 * 1000 / sr, s"id $id")
        assert(r.isNullAt(6)) // frame count is ISO-BMFF-only
      } else if (id % 3 == 2) {
        assert(r.getString(1) === "mp4")
        assert(r.isNullAt(2) && r.isNullAt(3) && r.isNullAt(4)) // RIFF-only fields
        val durDeclared = 500 + (id * 37) % 3500
        val ts = Seq(1000, 90000, 600, 48000)((id % 4).toInt)
        // exact: declared ms -> timescale units (floor) -> parsed ms (floor)
        assert(r.getLong(5) === durDeclared * ts / 1000 * 1000 / ts, s"id $id")
        // r17: frame count = the stts sample-table sum, by construction
        // durationMs * fps_nominal div 1000 with fps_nominal 4..30
        assert(r.getLong(6) === durDeclared * (4 + (id * 7) % 27) / 1000, s"id $id fc")
      } else {
        // raw-text rows: no magic
        (1 to 6).foreach(i => assert(r.isNullAt(i), s"id $id col $i"))
      }
    }
    val again = Multimodal.m07AvHeader(spark, "/root/testdata/sf0.001").collect()
    assert(out.map(_.toSeq).toSeq === again.map(_.toSeq).toSeq)
  }
}
