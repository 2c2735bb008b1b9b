package graft

import graft.plans.VideoHeaders

/** The MP4 header parser against hand-assembled ISO BMFF bytes: box
  * walking (unknown boxes, largesize, to-end sizes), mvhd version 0/1
  * layouts, tkhd 16.16 dimensions, and NULL (never an exception) on
  * garbage/truncation. */
class VideoHeaderSpec extends SparkSpecBase {

  private def hex(s: String): Array[Byte] =
    s.replaceAll("\\s", "").grouped(2)
      .map(Integer.parseInt(_, 16).toByte).toArray

  private def meta(b: Array[Byte])
      : Option[(String, String, Int, Long, Int, Int, Int)] =
    Option(VideoHeaders.parse(b)).map(r =>
      (r.getUTF8String(0).toString, r.getUTF8String(1).toString,
        r.getInt(2), r.getLong(3), r.getInt(4), r.getInt(5), r.getInt(6)))

  private val ftyp = "00000014 66747970 69736f6d 00000200 69736f6d"
  private val matrix = "00010000" + "00000000" * 3 + "00010000" +
    "00000000" * 3 + "40000000"
  private val mvhdTail = "00010000" + "0100" + "00" * 10 + matrix +
    "00" * 24 + "00000003"
  // v0: timescale 600, duration 3000
  private val mvhdV0 = "0000006c 6d766864 00000000 00000000 00000000" +
    " 00000258 00000bb8 " + mvhdTail
  // tkhd v0: 640 x 480 in 16.16 fixed point
  private val tkhd = "0000005c 746b6864 00000007 00000000 00000000" +
    " 00000001 00000000 00000000 " + "00" * 8 + "0000 0000 0000 0000 " +
    matrix + " 02800000 01e00000"
  private val trak = "00000064 7472616b " + tkhd

  test("ftyp brand + mvhd v0 + one trak parse exactly") {
    val moov = "000000d8 6d6f6f76 " + mvhdV0 + trak // 8+108+100 = 0xd8
    assert(meta(hex(ftyp + moov))
      .contains(("mp4", "isom", 600, 3000L, 1, 640, 480)))
  }

  test("mvhd v1 carries a 64-bit duration; unknown boxes are skipped") {
    // free box between ftyp and moov; duration 2^33 needs v1
    val free = "00000010 66726565 deadbeef cafebabe"
    val mvhdV1 = "00000078 6d766864 01000000 " + "00" * 16 +
      " 00000258 00000002 00000000 " + mvhdTail // duration = 2^33
    val moov = "000000e4 6d6f6f76 " + mvhdV1 + trak // 8+120+100 = 0xe4
    assert(meta(hex(ftyp + free + moov))
      .contains(("mp4", "isom", 600, 8589934592L, 1, 640, 480)))
  }

  test("trak count and first-track dimensions with multiple tracks") {
    val moov = "0000013c 6d6f6f76 " + mvhdV0 + trak + trak // 8+108+200 = 0x13c
    assert(meta(hex(ftyp + moov))
      .contains(("mp4", "isom", 600, 3000L, 2, 640, 480)))
  }

  test("garbage, truncation, and non-video bytes yield null, not errors") {
    assert(VideoHeaders.parse(null) == null)
    assert(VideoHeaders.parse(Array.emptyByteArray) == null)
    assert(VideoHeaders.parse(hex("00" * 32)) == null)
    assert(VideoHeaders.parse("not a video at all".getBytes) == null)
    // valid ftyp but moov truncated mid-mvhd
    val cut = hex(ftyp + "00000080 6d6f6f76 0000006c 6d766864 000000")
    assert(VideoHeaders.parse(cut) == null)
    // wav bytes are not mp4
    assert(VideoHeaders.parse(hex(
      "52494646 24100000 57415645 666D7420")) == null)
  }

  test("query-side synthesis round-trips through the parser") {
    val docs = Tables.documents(spark, sf).limit(50)
    val got = graft.operators.Multimodal.videoHeaderFeatures(
      graft.operators.Multimodal.synthVideoTable(docs), "doc_id", "media")
    assert(got.count() == 50)
    assert(got.filter(org.apache.spark.sql.functions.col("format").isNull)
      .count() == 0)
  }
}
