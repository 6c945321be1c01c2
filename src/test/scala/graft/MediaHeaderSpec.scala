package graft

import org.apache.spark.sql.functions._
import graft.functions.MediaHeader
import graft.operators.Multimodal

/** m06 codec-free header parsing: known-vector pins over hand-built
  * byte-exact headers (the kind of corner the DuckDB oracle's
  * fixture-driven walk never constructs), the malformed-header null
  * contract, and codegen/interpreted agreement.
  */
class MediaHeaderSpec extends SparkSpec {

  private def hexBytes(hex: String): Array[Byte] =
    hex.replaceAll("\\s", "").grouped(2).map(Integer.parseInt(_, 16).toByte).toArray

  private val pngHex =
    "89504E470D0A1A0A" + "0000000D" + "49484452" +
      "00000280" + "000001E0" + // 640 x 480
      "0806000000" + "AABBCCDD"
  private val gifHex =
    "474946383961" + "8002" + "E001" + "F70000" // 0x0280=640, 0x01E0=480 LE
  private val jpegHex =
    "FFD8" +
      "FFE000104A46494600010100000100010000" + // APP0
      "FFFE0004DEAD" + // COM, 2 data bytes
      "FFC0001108" + "01E0" + "0280" + "03012200021101031101" // SOF0 480x640

  test("known vectors: PNG IHDR, GIF87a/89a LE screen descriptor, JPEG SOF0 behind a segment chain") {
    assert(MediaHeader.format(hexBytes(pngHex)).toString === "png")
    assert(MediaHeader.width(hexBytes(pngHex)) === 640)
    assert(MediaHeader.height(hexBytes(pngHex)) === 480)
    assert(MediaHeader.format(hexBytes(gifHex)).toString === "gif")
    assert(MediaHeader.width(hexBytes(gifHex)) === 640)
    assert(MediaHeader.height(hexBytes(gifHex)) === 480)
    val gif87 = hexBytes("474946383761" + "1000" + "2000" + "F70000")
    assert(MediaHeader.format(gif87).toString === "gif")
    assert(MediaHeader.width(gif87) === 16 && MediaHeader.height(gif87) === 32)
    assert(MediaHeader.format(hexBytes(jpegHex)).toString === "jpeg")
    assert(MediaHeader.width(hexBytes(jpegHex)) === 640)
    assert(MediaHeader.height(hexBytes(jpegHex)) === 480)
  }

  test("JPEG scan: fill-byte padding, RST/TEM standalone markers, progressive SOF2; DHT C4 is NOT a frame header") {
    // fill bytes (FF FF FF) before a marker are padding per T.81 B.1.1.2
    val padded = "FFD8" + "FFFFFF" + "FFC0001108" + "0010" + "0020" + "03012200021101031101"
    assert(MediaHeader.width(hexBytes(padded)) === 32)
    assert(MediaHeader.height(hexBytes(padded)) === 16)
    // standalone markers (TEM 01, RST D0-D7) carry no length — skip 2
    val standalone = "FFD8" + "FF01" + "FFD3" + "FFC2001108" + "0040" + "0030" + "03012200021101031101"
    assert(MediaHeader.width(hexBytes(standalone)) === 48) // SOF2 (progressive) counts
    assert(MediaHeader.height(hexBytes(standalone)) === 64)
    // C4 (DHT) has a length but is not a SOF: its u16be payload here
    // would misparse as dims if the C4 exclusion were wrong
    val dht = "FFD8" + "FFC40008080100020003" + "FFC0001108" + "0008" + "0009" + "03012200021101031101"
    assert(MediaHeader.width(hexBytes(dht)) === 9)
    assert(MediaHeader.height(hexBytes(dht)) === 8)
  }

  test("null contract: truncation, corrupt length chains, SOS/EOI before SOF, zero and overflow dims") {
    // truncated to 5 bytes: JPEG keeps its magic (format, no dims);
    // PNG/GIF magics need 8/6 bytes (no format at all)
    assert(MediaHeader.format(hexBytes("FFD8FFE000")).toString === "jpeg")
    assert(MediaHeader.width(hexBytes("FFD8FFE000")) === -1)
    assert(MediaHeader.format(hexBytes("89504E470D")) === null)
    assert(MediaHeader.format(hexBytes("4749463839")) === null)
    // a segment length < 2 cannot be walked (would loop): stop, no dims
    assert(MediaHeader.width(hexBytes("FFD8" + "FFE00001" + "FFC0001108001000200301")) === -1)
    // SOS / EOI before any SOF: entropy data follows, stop
    assert(MediaHeader.width(hexBytes("FFD8" + "FFDA0008" + "FFC0001108001000200301")) === -1)
    assert(MediaHeader.width(hexBytes("FFD8" + "FFD9" + "FFC0001108001000200301")) === -1)
    // lost marker sync (byte != FF where a marker must start): stop
    assert(MediaHeader.width(hexBytes("FFD8" + "00C0001108001000200301")) === -1)
    // zero dims are malformed in all three specs
    assert(MediaHeader.width(hexBytes(
      "FFD8" + "FFC0001108" + "0000" + "0020" + "03012200021101031101")) === -1)
    assert(MediaHeader.width(hexBytes(
      "474946383961" + "0000" + "E001" + "F70000")) === -1)
    // PNG dims above 2^31-1 are invalid per spec: reject, don't wrap
    assert(MediaHeader.width(hexBytes(
      "89504E470D0A1A0A" + "0000000D" + "49484452" + "80000000" + "000001E0" +
        "0806000000" + "AABBCCDD")) === -1)
    // PNG signature with a non-IHDR first chunk: format yes, dims no
    assert(MediaHeader.format(hexBytes(
      "89504E470D0A1A0A" + "0000000D" + "58585858" + "00000280" + "000001E0" +
        "0806000000" + "AABBCCDD")).toString === "png")
    assert(MediaHeader.width(hexBytes(
      "89504E470D0A1A0A" + "0000000D" + "58585858" + "00000280" + "000001E0" +
        "0806000000" + "AABBCCDD")) === -1)
    // empty / unknown payloads
    assert(MediaHeader.format(Array.emptyByteArray) === null)
    assert(MediaHeader.format("plain text".getBytes("UTF-8")) === null)
    // a length chain pointing past the buffer: bounded, no dims
    assert(MediaHeader.width(hexBytes("FFD8" + "FFE0FFFF" + "4141")) === -1)
    // FF 00 is byte STUFFING (escaped data 0xFF, not a marker — T.81
    // B.1.1.2), legal only inside entropy data the header walk never
    // enters: treat as corrupt and stop. The payload after it here is
    // crafted so the OLD behavior (consume 2 bytes as a length) would
    // resync onto a pseudo-SOF and serve wrong dims — pin null instead.
    assert(MediaHeader.width(hexBytes(
      "FFD8" + "FF00" + "0002" + "FFC0001108" + "0010" + "0020" +
        "03012200021101031101")) === -1)
    assert(MediaHeader.format(hexBytes("FFD8" + "FF00" + "00040000")).toString === "jpeg")
  }

  test("segment-walk cap: a self-referencing length chain terminates at MaxSegments") {
    // 300 zero-progress-free segments of minimal length (2): the walk
    // must stop at the cap, not scan forever on adversarial chains
    val segs = "FFE30002" * 300
    val b = hexBytes("FFD8" + segs + "FFC0001108" + "0010" + "0020" + "03012200021101031101")
    // more segments than the cap: dims stay null (bounded work contract)
    assert(MediaHeader.width(b) === -1)
    val few = hexBytes("FFD8" + ("FFE30002" * 10) + "FFC0001108" + "0010" + "0020" + "03012200021101031101")
    assert(MediaHeader.width(few) === 32)
  }

  test("expression path == static path, codegen AND interpreted (the m06 scan stays fused)") {
    import spark.implicits._
    val payloads = Seq(pngHex, gifHex, jpegHex, "FFD8FFE000", "89504E470D", "00")
    val df = payloads.zipWithIndex.map { case (hx, i) => (i.toLong, hexBytes(hx)) }
      .toDF("id", "payload")
    def collectAll() = Multimodal.mediaHeaders(df, "id", "payload")
      .orderBy("doc_id").collect().map(_.toSeq)
    val expected = payloads.zipWithIndex.map { case (hx, i) =>
      val b = hexBytes(hx)
      val f = Option(MediaHeader.format(b)).map(_.toString).orNull
      val (w, h) = (MediaHeader.width(b), MediaHeader.height(b))
      Seq[Any](i.toLong, f, if (w < 0) null else w, if (h < 0) null else h,
        b.length.toLong,
        if (w < 0 || h < 0) null
        else if (w * 3 > h * 4) "wide" else if (h * 3 > w * 4) "tall" else "square")
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

  test("m06 gate: deterministic, malformed rows keep the documented contract") {
    val out = Multimodal.m06MediaHeader(spark, "/root/testdata/sf0.001").collect()
    assert(out.length === 500)
    out.foreach { r =>
      val id = r.getLong(0)
      if (id % 17 == 0) {
        // 5-byte truncation: jpeg rows keep format only, others nothing
        assert(r.isNullAt(2) && r.isNullAt(3) && r.isNullAt(4))
        if (id % 3 == 1) assert(r.getString(1) === "jpeg") else assert(r.isNullAt(1))
        assert(r.getLong(5) === 5L)
      } else if (id % 13 == 0) {
        assert(r.isNullAt(1) && r.isNullAt(2) && r.isNullAt(3) && r.isNullAt(4))
      } else if (id % 19 == 0 && id % 3 == 1) {
        // r17 FF00 stuffing splice after APP0: SOI intact so format
        // survives, but the walk stops at the stuffed pair — null dims
        assert(r.getString(1) === "jpeg")
        assert(r.isNullAt(2) && r.isNullAt(3) && r.isNullAt(4))
      } else {
        val fmt = Seq("png", "jpeg", "gif")((id % 3).toInt)
        assert(r.getString(1) === fmt)
        assert(r.getInt(2) === 160 + (id * 7 % 1280).toInt)
        assert(r.getInt(3) === 120 + (id * 13 % 720).toInt)
        assert(!r.isNullAt(4))
      }
    }
  }
}
