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

/** Container-header parser for VIDEO payloads — the third leg of the
  * multimodal header tier ([[ImageHeaders]], [[AudioHeaders]]): an
  * ISO BMFF (MP4) top-level box walk to `ftyp` (brand) and `moov`,
  * then a child walk to `mvhd` (timescale + duration, version 0 and
  * 1 layouts) and the first `trak`'s `tkhd` (16.16 fixed-point
  * width/height), counting `trak` children on the way.
  *
  * Same honesty contract as the siblings: everything comes from
  * header bytes — no codec, no payload decode, one static call
  * inside whole-stage codegen. Unrecognized, truncated, or
  * structurally invalid payloads yield NULL, never an error.
  * 64-bit `size==1` largesize boxes and `size==0` to-end boxes are
  * honored in the walk.
  */
object VideoHeaders extends Serializable {

  private def be32(b: Array[Byte], i: Int): Long =
    ((b(i) & 0xffL) << 24) | ((b(i + 1) & 0xffL) << 16) |
      ((b(i + 2) & 0xffL) << 8) | (b(i + 3) & 0xffL)
  private def be64(b: Array[Byte], i: Int): Long =
    (be32(b, i) << 32) | be32(b, i + 4)
  private def isType(b: Array[Byte], i: Int, t: String): Boolean =
    b(i) == t.charAt(0) && b(i + 1) == t.charAt(1) &&
      b(i + 2) == t.charAt(2) && b(i + 3) == t.charAt(3)

  /** Null on anything unrecognized/truncated. */
  def parse(b: Array[Byte]): InternalRow = {
    if (b == null || b.length < 16) return null
    // first box must be ftyp; brand is its first payload word
    if (be32(b, 0) < 16 || !isType(b, 4, "ftyp")) return null
    val brand = new String(b, 8, 4, "US-ASCII")
    var timescale = -1L; var duration = -1L
    var nTracks = 0; var width = -1; var height = -1
    var i = 0
    while (i + 8 <= b.length) {
      var size = be32(b, i); var hdr = 8
      if (size == 1) {
        if (i + 16 > b.length) return null
        size = be64(b, i + 8); hdr = 16
      } else if (size == 0) size = b.length - i
      if (size < hdr || i + size > b.length) return null
      if (isType(b, i + 4, "moov")) {
        var j = i + hdr
        val end = i + size.toInt
        while (j + 8 <= end) {
          val csize = be32(b, j)
          if (csize < 8 || j + csize > end) return null
          if (isType(b, j + 4, "mvhd") && j + 8 + 4 <= end) {
            val v = b(j + 8) & 0xff
            if (v == 0 && j + 28 <= end) {
              timescale = be32(b, j + 20); duration = be32(b, j + 24)
            } else if (v == 1 && j + 40 <= end) {
              timescale = be32(b, j + 28); duration = be64(b, j + 32)
            } else return null
          } else if (isType(b, j + 4, "trak")) {
            nTracks += 1
            if (width < 0) {
              // child walk to tkhd for the first track's dimensions
              var k = j + 8
              val tend = j + csize.toInt
              while (k + 8 <= tend) {
                val tsize = be32(b, k)
                if (tsize < 8 || k + tsize > tend) return null
                if (isType(b, k + 4, "tkhd")) {
                  val tv = b(k + 8) & 0xff
                  val wOff = if (tv == 1) k + 96 else k + 84
                  if (tv > 1 || wOff + 8 > tend) return null
                  width = (be32(b, wOff) >>> 16).toInt
                  height = (be32(b, wOff + 4) >>> 16).toInt
                }
                k += tsize.toInt
              }
            }
          }
          j += csize.toInt
        }
      }
      i += size.toInt
    }
    if (timescale <= 0) return null
    new GenericInternalRow(Array[Any](UTF8String.fromString("mp4"),
      UTF8String.fromString(brand), timescale.toInt, duration, nTracks,
      width, height))
  }

  val schema: StructType = StructType(Seq(
    StructField("format", StringType, nullable = false),
    StructField("brand", StringType, nullable = false),
    StructField("timescale", IntegerType, nullable = false),
    StructField("duration", LongType, nullable = false),
    StructField("n_tracks", IntegerType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false)))
}

/** `video_meta(binary)` → `struct<format,brand,timescale,duration,
  * n_tracks,width,height>` (null when the payload is not a recognized
  * MP4 container). */
case class VideoMeta(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"video_meta expects binary, got ${dt.simpleString}")
  }

  override def dataType: DataType = VideoHeaders.schema
  override def nullable: Boolean = true
  override def prettyName: String = "video_meta"

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null
    else VideoHeaders.parse(v.asInstanceOf[Array[Byte]])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val parser = ctx.addReferenceObj("videoHeaders", VideoHeaders,
      "graft.plans.VideoHeaders$")
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

object VideoMeta {
  def apply(c: Column): Column =
    GraftSqlShim.column(VideoMeta(GraftSqlShim.expression(c)))
}
