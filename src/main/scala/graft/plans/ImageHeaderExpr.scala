package graft.plans

import org.apache.spark.sql.{Column, GraftSqlShim}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Container-header parser for image payloads (north-star multimodal
  * tier): extracts `(format, width, height)` from the LEADING BYTES of
  * a PNG / GIF / BMP / JPEG payload — signature sniff plus fixed-offset
  * (PNG IHDR, GIF logical screen, BMP info header) or marker-walk
  * (JPEG SOF segment) field reads.
  *
  * This is the honest version of "decode" at corpus scale: dimensions,
  * format, and validity come from tens of header bytes, not from pixel
  * decoding — so the scan never inflates compressed payloads, needs no
  * codec library, and stays a per-row scalar expression inside
  * whole-stage codegen (the parse itself runs as one static call on
  * the byte array; no boxing, no encoder round-trip). Pixel-level
  * work remains `Multimodal.fakeDecode`'s clearly-stubbed contract.
  *
  * Unrecognized or truncated payloads yield NULL, not an error — at
  * 100 TB a corrupt file is a row to filter, never a failed task.
  */
object ImageHeaders extends Serializable {

  private def be16(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)
  private def be32(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 24) | ((b(i + 1) & 0xff) << 16) |
      ((b(i + 2) & 0xff) << 8) | (b(i + 3) & 0xff)
  private def le16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
  private def le32(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8) |
      ((b(i + 2) & 0xff) << 16) | (b(i + 3) & 0xff) << 24

  private def row(fmt: String, w: Int, h: Int): InternalRow =
    new GenericInternalRow(Array[Any](UTF8String.fromString(fmt), w, h))

  /** Null on anything unrecognized/truncated. */
  def parse(b: Array[Byte]): InternalRow = {
    if (b == null || b.length < 10) return null
    // PNG: 8-byte signature, IHDR width/height big-endian at 16/20
    if (b.length >= 24 &&
        (b(0) & 0xff) == 0x89 && b(1) == 'P' && b(2) == 'N' && b(3) == 'G' &&
        b(4) == 0x0d && b(5) == 0x0a && b(6) == 0x1a && b(7) == 0x0a)
      return row("png", be32(b, 16), be32(b, 20))
    // GIF87a/GIF89a: logical screen w/h little-endian at 6/8
    if (b(0) == 'G' && b(1) == 'I' && b(2) == 'F' && b(3) == '8' &&
        (b(4) == '7' || b(4) == '9') && b(5) == 'a')
      return row("gif", le16(b, 6), le16(b, 8))
    // BMP: "BM", BITMAPINFOHEADER w/h little-endian at 18/22
    if (b.length >= 26 && b(0) == 'B' && b(1) == 'M')
      return row("bmp", le32(b, 18), math.abs(le32(b, 22)))
    // JPEG: SOI then a marker walk to the first SOFn frame header
    if ((b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8) {
      var i = 2
      while (i + 3 < b.length) {
        if ((b(i) & 0xff) != 0xff) return null // desynced marker stream
        val marker = b(i + 1) & 0xff
        if (marker == 0xff) { i += 1 } // fill bytes before a marker
        else if (marker == 0xd8 || (marker >= 0xd0 && marker <= 0xd7)) {
          i += 2 // standalone markers carry no length
        } else {
          val segLen = be16(b, i + 2)
          if (segLen < 2) return null
          val isSof = marker >= 0xc0 && marker <= 0xcf &&
            marker != 0xc4 && marker != 0xc8 && marker != 0xcc
          if (isSof) {
            if (i + 8 >= b.length) return null
            return row("jpeg", be16(b, i + 7), be16(b, i + 5))
          }
          i += 2 + segLen
        }
      }
      return null
    }
    null
  }

  val schema: StructType = StructType(Seq(
    StructField("format", StringType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false)))
}

/** `image_meta(binary)` → `struct<format,width,height>` (null when the
  * payload is not a recognized image container). */
case class ImageMeta(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"image_meta expects binary, got ${dt.simpleString}")
  }

  override def dataType: DataType = ImageHeaders.schema
  override def nullable: Boolean = true
  override def prettyName: String = "image_meta"

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null
    else ImageHeaders.parse(v.asInstanceOf[Array[Byte]])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val parser = ctx.addReferenceObj("imageHeaders", ImageHeaders,
      "graft.plans.ImageHeaders$")
    ev.copy(code = code"""
      ${childGen.code}
      boolean ${ev.isNull} = true;
      org.apache.spark.sql.catalyst.InternalRow ${ev.value} = null;
      if (!${childGen.isNull}) {
        ${ev.value} = $parser.parse(${childGen.value});
        ${ev.isNull} = ${ev.value} == null;
      }""")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ImageMeta {
  def apply(c: Column): Column =
    GraftSqlShim.column(ImageMeta(GraftSqlShim.expression(c)))
}
