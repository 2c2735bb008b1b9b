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

  /** Box size + header length at `i` within `[i, end)`, honoring the
    * `size==1` 64-bit largesize and `size==0` to-end-of-enclosure
    * forms at EVERY nesting level (to-end resolves against the
    * enclosing box's end, which is what the spec means by "to the end
    * of the file" for top-level boxes). Packs `(size << 8) | hdr`;
    * -1 when malformed. The `i + size > end` bound runs before
    * packing, so size < 2^31 and the shift cannot overflow. */
  private def boxSize(b: Array[Byte], i: Int, end: Int): Long = {
    var size = be32(b, i); var hdr = 8L
    if (size == 1) {
      if (i + 16 > end) return -1L
      size = be64(b, i + 8); hdr = 16L
    } else if (size == 0) size = (end - i).toLong
    if (size < hdr || size > end - i) return -1L
    (size << 8) | hdr
  }

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
      val packed = boxSize(b, i, b.length)
      if (packed < 0) return null
      val size = (packed >>> 8).toInt; val hdr = (packed & 0xff).toInt
      if (isType(b, i + 4, "moov")) {
        var j = i + hdr
        val end = i + size
        while (j + 8 <= end) {
          val cpacked = boxSize(b, j, end)
          if (cpacked < 0) return null
          val csize = (cpacked >>> 8).toInt; val chdr = (cpacked & 0xff).toInt
          val p = j + chdr // payload base — correct for largesize too
          if (isType(b, j + 4, "mvhd") && p + 4 <= end) {
            val v = b(p) & 0xff
            if (v == 0 && p + 20 <= end) {
              timescale = be32(b, p + 12); duration = be32(b, p + 16)
            } else if (v == 1 && p + 32 <= end) {
              timescale = be32(b, p + 20); duration = be64(b, p + 24)
            } else return null
          } else if (isType(b, j + 4, "trak")) {
            nTracks += 1
            if (width < 0) {
              // child walk to tkhd for the first track's dimensions
              var k = p
              val tend = j + csize
              while (k + 8 <= tend) {
                val tpacked = boxSize(b, k, tend)
                if (tpacked < 0) return null
                val tsize = (tpacked >>> 8).toInt
                val thdr = (tpacked & 0xff).toInt
                if (isType(b, k + 4, "tkhd")) {
                  val tp = k + thdr
                  if (tp >= tend) return null
                  val tv = b(tp) & 0xff
                  val wOff = if (tv == 1) tp + 88 else tp + 76
                  if (tv > 1 || wOff + 8 > tend) return null
                  width = (be32(b, wOff) >>> 16).toInt
                  height = (be32(b, wOff + 4) >>> 16).toInt
                }
                k += tsize
              }
            }
          }
          j += csize
        }
      }
      i += size
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
