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

/** Container-header parser for AUDIO payloads — the audio sibling of
  * [[ImageHeaders]] (north-star multimodal tier): extracts
  * `(format, channels, sample_rate, bits_per_sample, n_samples)` from
  * the leading bytes of a WAV (RIFF chunk walk to `fmt `/`data`) or
  * FLAC (STREAMINFO bit-unpack) payload.
  *
  * Same honesty contract as the image tier: duration and layout come
  * from tens of header bytes — no codec library, no payload
  * inflation, one static call inside whole-stage codegen.
  * Unrecognized or truncated payloads yield NULL, never an error.
  * `n_samples` is 0 where the container doesn't record it (a WAV
  * with a zero block-align).
  */
object AudioHeaders extends Serializable {

  private def le16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
  private def le32(b: Array[Byte], i: Int): Long =
    ((b(i) & 0xffL)) | ((b(i + 1) & 0xffL) << 8) |
      ((b(i + 2) & 0xffL) << 16) | ((b(i + 3) & 0xffL) << 24)
  private def be24(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 16) | ((b(i + 1) & 0xff) << 8) | (b(i + 2) & 0xff)

  private def row(fmt: String, ch: Int, rate: Int, bits: Int,
                  n: Long): InternalRow =
    new GenericInternalRow(Array[Any](UTF8String.fromString(fmt),
      ch, rate, bits, n))

  /** Null on anything unrecognized/truncated. */
  def parse(b: Array[Byte]): InternalRow = {
    if (b == null || b.length < 12) return null
    // WAV: "RIFF"....  "WAVE", then a chunk walk to fmt (+ data size)
    if (b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
        b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E') {
      var i = 12
      var ch = -1; var rate = -1; var bits = -1; var align = -1
      var dataSize = -1L
      while (i + 8 <= b.length && (ch < 0 || dataSize < 0)) {
        val size = le32(b, i + 4)
        if (size < 0 || size > Int.MaxValue) return null
        val isFmt = b(i) == 'f' && b(i + 1) == 'm' && b(i + 2) == 't' &&
          b(i + 3) == ' '
        val isData = b(i) == 'd' && b(i + 1) == 'a' && b(i + 2) == 't' &&
          b(i + 3) == 'a'
        if (isFmt) {
          if (i + 8 + 16 > b.length) return null
          ch = le16(b, i + 10)
          rate = le32(b, i + 12).toInt
          align = le16(b, i + 20)
          bits = le16(b, i + 22)
        } else if (isData) {
          dataSize = size
        }
        // chunks are word-aligned: odd sizes carry a pad byte
        i += 8 + size.toInt + (size.toInt & 1)
      }
      if (ch <= 0 || rate <= 0) return null
      val n = if (align > 0 && dataSize >= 0) dataSize / align else 0L
      return row("wav", ch, rate, bits, n)
    }
    // FLAC: "fLaC" then the mandatory first STREAMINFO block —
    // sample rate 20 bits, channels-1 3 bits, bits-1 5 bits, total
    // samples 36 bits, packed big-endian from byte 18 of the stream
    if (b.length >= 42 && b(0) == 'f' && b(1) == 'L' && b(2) == 'a' &&
        b(3) == 'C' && (b(4) & 0x7f) == 0) {
      val o = 8 + 10 // block header + min/max block + min/max frame
      val rate = (be24(b, o) >>> 4)
      val ch = ((b(o + 2) >>> 1) & 0x07) + 1
      val bits = (((b(o + 2) & 0x01) << 4) | ((b(o + 3) >>> 4) & 0x0f)) + 1
      val n = ((b(o + 3) & 0x0fL) << 32) |
        ((b(o + 4) & 0xffL) << 24) | ((b(o + 5) & 0xffL) << 16) |
        ((b(o + 6) & 0xffL) << 8) | (b(o + 7) & 0xffL)
      if (rate <= 0) return null
      return row("flac", ch, rate, bits, n)
    }
    null
  }

  val schema: StructType = StructType(Seq(
    StructField("format", StringType, nullable = false),
    StructField("channels", IntegerType, nullable = false),
    StructField("sample_rate", IntegerType, nullable = false),
    StructField("bits_per_sample", IntegerType, nullable = false),
    StructField("n_samples", LongType, nullable = false)))
}

/** `audio_meta(binary)` → `struct<format,channels,sample_rate,
  * bits_per_sample,n_samples>` (null when the payload is not a
  * recognized audio container). */
case class AudioMeta(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"audio_meta expects binary, got ${dt.simpleString}")
  }

  override def dataType: DataType = AudioHeaders.schema
  override def nullable: Boolean = true
  override def prettyName: String = "audio_meta"

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null
    else AudioHeaders.parse(v.asInstanceOf[Array[Byte]])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val parser = ctx.addReferenceObj("audioHeaders", AudioHeaders,
      "graft.plans.AudioHeaders$")
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

object AudioMeta {
  def apply(c: Column): Column =
    GraftSqlShim.column(AudioMeta(GraftSqlShim.expression(c)))
}
