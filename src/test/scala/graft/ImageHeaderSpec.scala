package graft

import graft.plans.{ImageHeaders, ImageMeta}
import org.apache.spark.sql.functions._

/** The header parser against hand-assembled container bytes: correct
  * dimensions per format, marker-walking past leading JPEG segments,
  * and NULL (never an exception) on garbage/truncation. */
class ImageHeaderSpec extends SparkSpecBase {
  import spark.implicits._

  private def hex(s: String): Array[Byte] =
    s.replaceAll("\\s", "").grouped(2)
      .map(Integer.parseInt(_, 16).toByte).toArray

  private def dims(b: Array[Byte]): Option[(String, Int, Int)] =
    Option(ImageHeaders.parse(b)).map(r =>
      (r.getUTF8String(0).toString, r.getInt(1), r.getInt(2)))

  test("PNG IHDR: big-endian width/height at fixed offsets") {
    val png = hex("89504E470D0A1A0A 0000000D 49484452" +
      "00000280 000001E0 0806000000") // 640 × 480
    assert(dims(png).contains(("png", 640, 480)))
  }

  test("GIF logical screen: little-endian width/height") {
    val gif = hex("474946383961" + "8002" + "E001" + "00") // 640 × 480 LE
    assert(dims(gif).contains(("gif", 640, 480)))
  }

  test("BMP info header: little-endian, height may be negative (top-down)") {
    def bmp(h: String) = hex("424D 00000000 0000 0000 36000000 28000000" +
      "80020000" + h)
    assert(dims(bmp("E0010000")).contains(("bmp", 640, 480)))
    assert(dims(bmp("20FEFFFF")).contains(("bmp", 640, 480))) // -480 top-down
  }

  test("JPEG: marker walk reaches SOF0 past APP0/COM segments") {
    val jpeg = hex("FFD8" +
      "FFE0 0010 4A46494600 010100 0001 0001 0000" + // APP0
      "FFFE 0007 68656C6C6F" +                       // COM "hello"
      "FFC0 0011 08 01E0 0280 03 011100 021101 031101") // SOF0 480h 640w
    assert(dims(jpeg).contains(("jpeg", 640, 480)))
  }

  test("garbage, truncation, and non-image bytes yield null, not errors") {
    assert(dims(Array[Byte]()).isEmpty)
    assert(dims("not an image at all".getBytes).isEmpty)
    assert(dims(hex("89504E470D0A1A0A 0000")).isEmpty)       // truncated PNG
    assert(dims(hex("FFD8 FFE0 0010 4A46")).isEmpty)         // truncated JPEG
    assert(dims(hex("FFD8 00FF 0000")).isEmpty)              // desynced JPEG
  }

  test("the expression evaluates identically interpreted and codegen'd") {
    val media = Multimodal.synthImageTable(Tables.documents(spark, sf))
    def run(codegen: String): Array[(Long, String, Int, Int)] = {
      spark.conf.set("spark.sql.codegen.factoryMode", codegen)
      try media.select(col("doc_id"), ImageMeta(col("media")).as("m"))
        .select(col("doc_id"), col("m.format"), col("m.width"), col("m.height"))
        .orderBy(col("doc_id")).collect()
        .map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getInt(3)))
      finally spark.conf.unset("spark.sql.codegen.factoryMode")
    }
    val gen = run("CODEGEN_ONLY")
    val interp = run("NO_CODEGEN")
    assert(gen.nonEmpty && gen.sameElements(interp))
    // and the synthesized bytes really carry the documented formulas
    val (id, fmt, w, _) = gen.head
    assert(fmt == (if (id % 3 == 0) "png" else if (id % 3 == 1) "gif" else "jpeg"))
    assert(w >= 1 && w <= 640)
  }

  private def Multimodal = graft.operators.Multimodal
}
