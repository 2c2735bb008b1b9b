package graft.plans

import org.apache.spark.sql.{Column, GraftSqlShim}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The engine's portable 60-bit hash as ONE fused codegen expression.
  *
  * Semantics are BIT-IDENTICAL to the composed spelling
  * `conv(substring(md5(cast(x as string)), 1, 15), 16, 10)` that every
  * oracle replays as `CAST('0x' || substr(md5(x), 1, 15) AS BIGINT)`:
  * the first 15 hex characters of the md5 digest are the top 60 bits
  * of its first 8 bytes, i.e. `(first8BytesBigEndian >>> 4)`. The
  * fused form skips the 32-char hex-string materialization and the
  * base-16 string parse the composed chain pays per call — this
  * expression sits on the hot path of every portable-hash operator
  * (MinHash shingles, SimHash votes, KMV sketches, hash splits,
  * reservoir orders, epoch shuffles). ScalarsSpec pins equality with
  * the composed spelling property-style.
  *
  * MessageDigest instances are NOT thread-safe — one per thread. */
object PortableHash extends Serializable {

  // @transient: a ThreadLocal is not serializable, and this module
  // rides the codegen references array into task closures — the lazy
  // val re-initializes per JVM after deserialization on a real cluster
  @transient private lazy val md =
    new ThreadLocal[java.security.MessageDigest] {
      override def initialValue(): java.security.MessageDigest =
        java.security.MessageDigest.getInstance("MD5")
    }

  def hash60(s: UTF8String): Long = {
    val d = md.get()
    d.reset()
    val digest = d.digest(s.getBytes)
    // first 15 hex chars == top 60 bits of the first 8 big-endian bytes
    (((digest(0) & 0xffL) << 56) | ((digest(1) & 0xffL) << 48) |
      ((digest(2) & 0xffL) << 40) | ((digest(3) & 0xffL) << 32) |
      ((digest(4) & 0xffL) << 24) | ((digest(5) & 0xffL) << 16) |
      ((digest(6) & 0xffL) << 8) | (digest(7) & 0xffL)) >>> 4
  }
}

/** `portable_hash64(string)` → long in [0, 2^60). Null in, null out.
  * Non-string inputs must be cast to string by the caller (matching
  * the oracle's `CAST(x AS VARCHAR)` rendering). */
case class PortableHash64(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"portable_hash64 expects string, got ${dt.simpleString}")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "portable_hash64"

  override def nullSafeEval(input: Any): Any =
    PortableHash.hash60(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ph = ctx.addReferenceObj("portableHash", PortableHash,
      "graft.plans.PortableHash$")
    defineCodeGen(ctx, ev, c => s"$ph.hash60($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PortableHash64 {
  def apply(c: Column): Column =
    GraftSqlShim.column(PortableHash64(GraftSqlShim.expression(c)))
}
