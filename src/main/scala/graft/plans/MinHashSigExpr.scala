package graft.plans

import org.apache.spark.sql.{Column, GraftSqlShim}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The portable MinHash SIGNATURE as one fused codegen expression:
  * tokenize → per-token md5 hash mod P → Horner-fold k-windows into
  * shingle ids → all `numHashes` multiply-add minima, plus the
  * distinct-shingle count, in a single pass per document. This
  * replaces the shingle explode + |shingles|-row shuffle + 64-wide
  * min-aggregate for the signature half of
  * [[graft.operators.Dedup.minhashNearDupPairs]] (the exploded
  * shingle frame is still built for the Jaccard verify join, which
  * genuinely needs the rows).
  *
  * Bit-exactness contract (DedupSpec pins it against the
  * explode+aggregate formulation, and the q32 oracle replays it in
  * SQL): tokens are `split(text, " ")` fields (the [[SimHash]] byte
  * walk); token hash = [[PortableHash.hash60]] mod
  * [[graft.operators.Dedup.MinhashP]]; shingle id = Horner fold with
  * [[graft.operators.Dedup.HornerC]]; member j's minimum runs over
  * the shingle MULTISET (min over multiset ≡ min over set, so the
  * per-doc distinct the exploded frame applies changes nothing);
  * n_sh counts DISTINCT shingle ids. Documents with fewer than k
  * tokens yield NULL (they have no shingles). */
object MinHashSig extends Serializable {

  // @transient: a ThreadLocal is not serializable, and this module
  // rides the codegen references array into task closures — the lazy
  // val re-initializes per JVM after deserialization on a real cluster
  @transient private lazy val md =
    new ThreadLocal[java.security.MessageDigest] {
      override def initialValue(): java.security.MessageDigest =
        java.security.MessageDigest.getInstance("MD5")
    }

  private val coeffCache =
    new java.util.concurrent.ConcurrentHashMap[Int, (Array[Long], Array[Long])]()

  private def coeffs(numHashes: Int): (Array[Long], Array[Long]) =
    coeffCache.computeIfAbsent(numHashes, n => {
      val cs = graft.operators.Dedup.minhashCoeffs(n)
      (cs.map(_._1).toArray, cs.map(_._2).toArray)
    })

  def compute(s: UTF8String, k: Int, numHashes: Int): InternalRow = {
    val P = graft.operators.Dedup.MinhashP
    val C = graft.operators.Dedup.HornerC
    val bytes = s.getBytes
    val n = bytes.length
    // token count = spaces + 1 (split(" ") keeps empty fields)
    var nTok = 1
    var i = 0
    while (i < n) { if (bytes(i) == 0x20) nTok += 1; i += 1 }
    val nSh = nTok - k + 1
    if (nSh < 1) return null
    // per-token portable hash mod P
    val ths = new Array[Long](nTok)
    val d = md.get()
    var t = 0
    var start = 0
    i = 0
    while (i <= n) {
      if (i == n || bytes(i) == 0x20) {
        d.reset()
        d.update(bytes, start, i - start)
        val dig = d.digest()
        val h = (((dig(0) & 0xffL) << 56) | ((dig(1) & 0xffL) << 48) |
          ((dig(2) & 0xffL) << 40) | ((dig(3) & 0xffL) << 32) |
          ((dig(4) & 0xffL) << 24) | ((dig(5) & 0xffL) << 16) |
          ((dig(6) & 0xffL) << 8) | (dig(7) & 0xffL)) >>> 4
        ths(t) = h % P
        t += 1
        start = i + 1
      }
      i += 1
    }
    val (as, bs) = coeffs(numHashes)
    val mins = new Array[Long](numHashes)
    java.util.Arrays.fill(mins, Long.MaxValue)
    val ids = new Array[Long](nSh)
    var p = 0
    while (p < nSh) {
      var acc = ths(p)
      var j = 1
      while (j < k) { acc = (acc * C + ths(p + j)) % P; j += 1 }
      ids(p) = acc
      var m = 0
      while (m < numHashes) {
        val v = (acc * as(m) + bs(m)) % P
        if (v < mins(m)) mins(m) = v
        m += 1
      }
      p += 1
    }
    java.util.Arrays.sort(ids)
    var distinct = 1
    p = 1
    while (p < nSh) { if (ids(p) != ids(p - 1)) distinct += 1; p += 1 }
    new GenericInternalRow(Array[Any](new GenericArrayData(mins), distinct))
  }

  def schema(numHashes: Int): StructType = StructType(Seq(
    StructField("sig", ArrayType(LongType, containsNull = false),
      nullable = false),
    StructField("n_sh", IntegerType, nullable = false)))
}

/** `minhash_sig(string)` → `struct<sig: array<long>, n_sh: int>`;
  * NULL for null text or documents shorter than k tokens. */
case class MinHashSigExpr(child: Expression, k: Int, numHashes: Int)
    extends UnaryExpression {
  require(k >= 1 && k <= 16, s"k=$k outside [1, 16]")
  require(numHashes >= 1 && numHashes <= 512,
    s"numHashes=$numHashes outside [1, 512]")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig expects string, got ${dt.simpleString}")
  }

  override def dataType: DataType = MinHashSig.schema(numHashes)
  override def nullable: Boolean = true
  override def prettyName: String = "minhash_sig"

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null
    else MinHashSig.compute(v.asInstanceOf[UTF8String], k, numHashes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val childGen = child.genCode(ctx)
    val obj = ctx.addReferenceObj("minHashSig", MinHashSig,
      "graft.plans.MinHashSig$")
    ev.copy(code = code"""
      ${childGen.code}
      boolean ${ev.isNull} = true;
      org.apache.spark.sql.catalyst.InternalRow ${ev.value} = null;
      if (!${childGen.isNull}) {
        ${ev.value} = $obj.compute(${childGen.value}, $k, $numHashes);
        ${ev.isNull} = ${ev.value} == null;
      }""")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashSigExpr {
  def apply(c: Column, k: Int, numHashes: Int): Column =
    GraftSqlShim.column(MinHashSigExpr(GraftSqlShim.expression(c), k, numHashes))
}
