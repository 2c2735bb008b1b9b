package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** SparkSessionExtensions hook exposing the engine's native
  * expressions to SQL (SURVEY §7.4's escape hatch, exercised for the
  * similarity hot path):
  *
  * {{{
  * SparkSession.builder().withExtensions(new GraftExtensions).getOrCreate()
  * spark.sql("SELECT cosine_sim(a, b) FROM vectors")
  * }}}
  *
  * The extension route keeps the engine a LIBRARY: no fork of the
  * session builder, works with `--conf spark.sql.extensions=
  * graft.plans.GraftExtensions` on a cluster.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  import org.apache.spark.sql.catalyst.expressions.Expression

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectPlannerStrategy(_ => AsOfStrategy)
    // conf-gated (default off) COUNT(DISTINCT) → HLL++ rewrite
    ext.injectOptimizerRule(_ => ApproxDistinctRewrite)
    ext.injectFunction((
      new FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "cosine_sim takes exactly 2 arguments")
        CosineSimilarity(children.head, children(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "dot_product takes exactly 2 arguments")
        DotProduct(children.head, children(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("image_meta"),
      new ExpressionInfo(classOf[ImageMeta].getName, "image_meta"),
      (children: Seq[Expression]) => {
        require(children.length == 1, "image_meta takes exactly 1 argument")
        ImageMeta(children.head)
      }))
    ext.injectFunction((
      new FunctionIdentifier("audio_meta"),
      new ExpressionInfo(classOf[AudioMeta].getName, "audio_meta"),
      (children: Seq[Expression]) => {
        require(children.length == 1, "audio_meta takes exactly 1 argument")
        AudioMeta(children.head)
      }))
    ext.injectFunction((
      new FunctionIdentifier("video_meta"),
      new ExpressionInfo(classOf[VideoMeta].getName, "video_meta"),
      (children: Seq[Expression]) => {
        require(children.length == 1, "video_meta takes exactly 1 argument")
        VideoMeta(children.head)
      }))
    // scalar functions built as PURE Catalyst trees (a Column-builder
    // extraction would leave unresolved ColumnNode wrappers behind the
    // analyzer's back — Spark 4 resolves Column ASTs only at Dataset
    // boundaries)
    ext.injectFunction((
      new FunctionIdentifier("parse_human_number"),
      new ExpressionInfo(GraftExtensions.getClass.getName,
        "parse_human_number"),
      (children: Seq[Expression]) => {
        require(children.length == 1, "parse_human_number takes 1 argument")
        GraftExtensions.parseHumanNumberExpr(children.head)
      }))
    ext.injectFunction((
      new FunctionIdentifier("portable_hash64"),
      new ExpressionInfo(GraftExtensions.getClass.getName,
        "portable_hash64"),
      (children: Seq[Expression]) => {
        require(children.length == 1, "portable_hash64 takes 1 argument")
        GraftExtensions.portableHash64Expr(children.head)
      }))
    ext.injectFunction((
      new FunctionIdentifier("strip_markup"),
      new ExpressionInfo(GraftExtensions.getClass.getName, "strip_markup"),
      (children: Seq[Expression]) => {
        require(children.length == 1, "strip_markup takes 1 argument")
        graft.functions.TextFunctions.stripMarkupExpr(children.head)
      }))
    ext.injectFunction((
      new FunctionIdentifier("canonicalize_url"),
      new ExpressionInfo(GraftExtensions.getClass.getName,
        "canonicalize_url"),
      (children: Seq[Expression]) => {
        require(children.length == 1, "canonicalize_url takes 1 argument")
        graft.functions.TextFunctions.canonicalizeUrlExpr(children.head)
      }))
    ext.injectFunction((
      new FunctionIdentifier("extract_urls"),
      new ExpressionInfo(GraftExtensions.getClass.getName, "extract_urls"),
      (children: Seq[Expression]) => {
        require(children.length == 1, "extract_urls takes 1 argument")
        graft.functions.TextFunctions.extractUrlsExpr(children.head)
      }))
    ext.injectFunction((
      new FunctionIdentifier("simhash60"),
      new ExpressionInfo(GraftExtensions.getClass.getName, "simhash60"),
      (children: Seq[Expression]) => {
        require(children.length == 1, "simhash60 takes 1 argument")
        GraftExtensions.simHash60Expr(children.head)
      }))
    // DuckDB-named alias for the engine's NFC pass (UnicodeNormalize
    // with stripAccents off) so SQL written against either engine runs
    ext.injectFunction((
      new FunctionIdentifier("nfc_normalize"),
      new ExpressionInfo(GraftExtensions.getClass.getName, "nfc_normalize"),
      (children: Seq[Expression]) => {
        require(children.length == 1, "nfc_normalize takes 1 argument")
        UnicodeNormalize(children.head, stripAccentsFlag = false)
      }))
    ext.injectFunction((
      new FunctionIdentifier("approx_top_terms"),
      new ExpressionInfo(classOf[SpaceSavingAgg].getName, "approx_top_terms"),
      (children: Seq[Expression]) => {
        require(children.length == 2,
          "approx_top_terms takes (term, k) arguments")
        val k = children(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v, _) =>
            v.toString.toInt
          case other =>
            throw new IllegalArgumentException(s"k must be a literal: $other")
        }
        SpaceSavingAgg(children.head, k).toAggregateExpression()
      }))
  }
}

object GraftExtensions {
  import org.apache.spark.sql.catalyst.expressions._
  import org.apache.spark.sql.types.{DoubleType, LongType, StringType}

  /** Catalyst tree of `Scalars.portableHash64` (same semantics; the
    * Column form stays the library API, this one feeds the SQL
    * registry). Rides the fused codegen expression — bit-identical
    * to the conv(substring(md5…)) chain it replaced. */
  def portableHash64Expr(child: Expression): Expression =
    PortableHash64(Cast(child, StringType))

  /** Catalyst tree of the SQL-surface `simhash60` — the SAME builder
    * the extension injects, exposed so specs exercise the injected
    * path (including the cast that lets non-string arguments hash by
    * their string form) rather than a hand-rolled registration. */
  def simHash60Expr(child: Expression): Expression =
    SimHash60(Cast(child, StringType))

  /** Catalyst tree of `Scalars.parseHumanNumber`. */
  def parseHumanNumberExpr(child: Expression): Expression = {
    val num = Cast(RegExpExtract(child,
      Literal("^([0-9]+\\.?[0-9]*)"), Literal(1)), DoubleType,
      evalMode = EvalMode.TRY)
    val suffix = RegExpExtract(child, Literal("([KMBT])$"), Literal(1))
    val mult = CaseWhen(Seq(
      (EqualTo(suffix, Literal("K")), Literal(1e3)),
      (EqualTo(suffix, Literal("M")), Literal(1e6)),
      (EqualTo(suffix, Literal("B")), Literal(1e9)),
      (EqualTo(suffix, Literal("T")), Literal(1e12))),
      Some(Literal(1.0)))
    Multiply(num, mult)
  }
}
