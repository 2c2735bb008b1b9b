package graft

import graft.operators.Dsir
import org.apache.spark.sql.functions._

/** Direction, smoothing, and determinism laws for the DSIR
  * importance-weight operator. */
class DsirSpec extends SparkSpecBase {

  test("weights rank target-looking docs above raw-looking docs") {
    import spark.implicits._
    // target = docs labeled t; "aa bb" dominates target, "zz yy" raw
    val docs = (Seq.tabulate(20)(i => (i.toLong, "t", "aa bb aa bb")) ++
      Seq.tabulate(20)(i => (20L + i, "r", "zz yy zz yy")) ++
      Seq((100L, "r", "aa bb aa bb"), (101L, "r", "zz yy zz yy")))
      .toDF("id", "grp", "text")
    val w = Dsir.importanceWeights(docs, "id", "text",
        col("grp") === "t", 64)
      .filter(col("id") >= 100L)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(w(100L) > w(101L),
      s"target-like doc ${w(100L)} should outrank raw-like ${w(101L)}")
    assert(w(100L) > 0.0 && w(101L) < 0.0,
      "log-ratio sign should separate the two populations")
  }

  test("empty target subcorpus degrades to uniform smoothing, not NaN") {
    import spark.implicits._
    val docs = Seq((1L, "x y z"), (2L, "x x")).toDF("id", "text")
    val out = Dsir.importanceWeights(docs, "id", "text", lit(false), 16)
      .collect()
    assert(out.forall(r => !r.getDouble(2).isNaN))
  }

  test("weights are invariant under repartitioning") {
    val docs = Tables.documents(spark, sf)
    val a = Dsir.importanceWeights(docs, "doc_id", "text",
      col("lang") === "en", 256)
    val b = Dsir.importanceWeights(docs.repartition(13), "doc_id", "text",
      col("lang") === "en", 256)
    assertBagEqual(a, b)
  }

  test("n_toks matches the raw token count") {
    val docs = Tables.documents(spark, sf)
    val out = Dsir.importanceWeights(docs, "doc_id", "text",
      col("lang") === "en", 256)
    val direct = docs.select(col("doc_id"),
      size(split(col("text"), " ")).cast("long").as("n_toks"))
    assertBagEqual(out.select("doc_id", "n_toks"), direct)
  }

  test("en docs average a higher weight than non-en under an en target") {
    val docs = Tables.documents(spark, sf)
    val w = Dsir.importanceWeights(docs, "doc_id", "text",
        col("lang") === "en", 256)
      .join(docs.select("doc_id", "lang"), Seq("doc_id"))
    val Array(enAvg, restAvg) = Seq(col("lang") === "en",
      col("lang") =!= "en").map(p =>
      w.filter(p).agg(avg("weight")).head().getDouble(0)).toArray
    // direction, not magnitude: the synthetic langs share one
    // vocabulary with only a frequency tilt, so the separation is
    // real but modest; exact weights are pinned by the q163 oracle
    assert(enAvg > restAvg,
      s"en avg weight $enAvg not above non-en $restAvg")
  }
}
