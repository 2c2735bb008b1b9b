package graft.plans

import org.apache.spark.sql.{Column, GraftSqlShim}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The 60-bit portable SimHash signature as ONE fused codegen
  * expression: tokenize + hash + bit-vote + assemble in a single pass
  * over the document where it already sits — no token explode, no
  * |tokens|-row shuffle, no 60-column aggregate. This is the
  * signature stage of [[graft.operators.Dedup.simhashNearDupPairs]]
  * collapsed to scan speed, the shape that matters at 100 TB (the
  * explode+aggregate spelling shuffled every token row to compute
  * what is per-document arithmetic).
  *
  * Bit-exactness contract (DedupSpec pins it against the
  * explode+aggregate formulation, and the q33 oracle replays it in
  * SQL): tokens are the `split(text, " ")` fields — split on EVERY
  * single 0x20 byte, empty tokens preserved (leading, trailing,
  * between consecutive spaces), which the byte walk reproduces
  * exactly; 0x20 never occurs inside a UTF-8 multi-byte sequence, so
  * scanning raw bytes is safe. Each token occurrence votes ±1 per bit
  * of its [[PortableHash.hash60]] (term-frequency weighting — no
  * dedup); bit k of the signature is set iff its vote sum is > 0.
  */
object SimHash extends Serializable {

  // @transient: a ThreadLocal is not serializable, and this module
  // rides the codegen references array into task closures — the lazy
  // val re-initializes per JVM after deserialization on a real cluster
  @transient private lazy val md =
    new ThreadLocal[java.security.MessageDigest] {
      override def initialValue(): java.security.MessageDigest =
        java.security.MessageDigest.getInstance("MD5")
    }

  def simhash60(s: UTF8String): Long = {
    val bytes = s.getBytes
    val votes = new Array[Int](60)
    val d = md.get()
    var start = 0
    var i = 0
    val n = bytes.length
    while (i <= n) {
      if (i == n || bytes(i) == 0x20) {
        d.reset()
        d.update(bytes, start, i - start)
        val dig = d.digest()
        val h = (((dig(0) & 0xffL) << 56) | ((dig(1) & 0xffL) << 48) |
          ((dig(2) & 0xffL) << 40) | ((dig(3) & 0xffL) << 32) |
          ((dig(4) & 0xffL) << 24) | ((dig(5) & 0xffL) << 16) |
          ((dig(6) & 0xffL) << 8) | (dig(7) & 0xffL)) >>> 4
        var k = 0
        while (k < 60) {
          if (((h >>> k) & 1L) != 0L) votes(k) += 1 else votes(k) -= 1
          k += 1
        }
        start = i + 1
      }
      i += 1
    }
    var sig = 0L
    var k = 0
    while (k < 60) {
      if (votes(k) > 0) sig |= (1L << k)
      k += 1
    }
    sig
  }
}

/** `simhash60(string)` → 60-bit signature long. Null in, null out. */
case class SimHash60(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"simhash60 expects string, got ${dt.simpleString}")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash60"

  override def nullSafeEval(input: Any): Any =
    SimHash.simhash60(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val sh = ctx.addReferenceObj("simHash", SimHash, "graft.plans.SimHash$")
    defineCodeGen(ctx, ev, c => s"$sh.simhash60($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHash60 {
  def apply(c: Column): Column =
    GraftSqlShim.column(SimHash60(GraftSqlShim.expression(c)))
}
