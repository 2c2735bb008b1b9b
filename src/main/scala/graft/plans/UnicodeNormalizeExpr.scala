package graft.plans

import org.apache.spark.sql.{Column, GraftSqlShim}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Unicode text normalization (training-data pipeline ★ — the step
  * every multilingual corpus runs before tokenizing/fingerprinting:
  * "é" composed and "e"+combining-acute must dedup as the SAME
  * document). Spark has no built-in normalizer; this wraps the JDK's
  * `java.text.Normalizer` (the same Unicode NFC/NFD algorithm DuckDB's
  * utf8proc implements — the q105 oracle pins cross-engine agreement)
  * as a codegen'd scalar expression: one static call per row, no UDF
  * boxing, stays inside whole-stage codegen.
  *
  * `stripAccents` additionally removes combining marks after NFD
  * (é → e, ñ → n) and recomposes — DuckDB `strip_accents` semantics.
  */
object UnicodeNorm extends Serializable {

  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    // already-NFC fast path (the whole corpus, for ASCII-dominated
    // data): one scan, no allocation beyond the toString
    if (java.text.Normalizer.isNormalized(str,
        java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(java.text.Normalizer.normalize(
      str, java.text.Normalizer.Form.NFC))
  }

  def stripAccents(s: UTF8String): UTF8String = {
    val decomposed = java.text.Normalizer.normalize(
      s.toString, java.text.Normalizer.Form.NFD)
    val sb = new java.lang.StringBuilder(decomposed.length)
    var i = 0
    while (i < decomposed.length) {
      val c = decomposed.charAt(i)
      if (Character.getType(c) != Character.NON_SPACING_MARK) sb.append(c)
      i += 1
    }
    UTF8String.fromString(java.text.Normalizer.normalize(
      sb.toString, java.text.Normalizer.Form.NFC))
  }
}

/** `unicode_normalize(string)` → NFC-normalized string; with
  * `stripAccents`, combining marks are removed (DuckDB
  * `strip_accents` semantics). Null in, null out. */
case class UnicodeNormalize(child: Expression, stripAccentsFlag: Boolean)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"unicode_normalize expects string, got ${dt.simpleString}")
  }

  override def dataType: DataType = StringType
  override def prettyName: String = "unicode_normalize"

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String]
    if (stripAccentsFlag) UnicodeNorm.stripAccents(s) else UnicodeNorm.nfc(s)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val norm = ctx.addReferenceObj("unicodeNorm", UnicodeNorm,
      "graft.plans.UnicodeNorm$")
    val fn = if (stripAccentsFlag) "stripAccents" else "nfc"
    defineCodeGen(ctx, ev, c => s"$norm.$fn($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object UnicodeNormalize {
  def apply(c: Column, stripAccents: Boolean): Column =
    GraftSqlShim.column(UnicodeNormalize(GraftSqlShim.expression(c),
      stripAccents))
}
