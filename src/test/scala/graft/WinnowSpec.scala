package graft

import graft.operators.Winnow
import org.apache.spark.sql.functions._

/** The winnowing guarantees (Schleimer et al. 2003): density bound,
  * the shared-substring detection promise, the stop-gram guard, and
  * determinism. */
class WinnowSpec extends SparkSpecBase {

  test("shared substring of length >= w+k-1 yields a shared fingerprint") {
    import spark.implicits._
    val shared = (1 to 12).map(i => s"s$i").mkString(" ") // 12 >= w+k-1=7
    val df = Seq(
      (1L, s"alpha beta gamma $shared delta"),
      (2L, s"zeta eta $shared theta iota kappa"),
      (3L, "completely unrelated words only here"))
      .toDF("id", "text")
    val pairs = Winnow.overlapPairs(df, "id", "text", k = 4, w = 4,
        maxDf = 100L, minShared = 1L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)),
      "the guaranteed shared fingerprint was not found")
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L),
      "unrelated doc produced a candidate pair")
  }

  test("fingerprint density is far below the full k-gram count") {
    val docs = Tables.documents(spark, sf)
    val fp = Winnow.fingerprints(docs, "doc_id", "text", k = 4, w = 4)
    val row = fp.agg(sum(col("n_grams")).as("g"),
      sum(size(col("fingerprints"))).as("f")).head()
    val (g, f) = (row.getLong(0), row.getLong(1))
    // expected density ~ 2/(w+1) = 0.4 of grams; distinct-ing within
    // a doc lowers it further. Assert the coarse bound.
    assert(f < g * 6 / 10, s"winnowed $f of $g grams — not sparse")
    assert(f > 0)
  }

  test("stop-gram guard: fingerprints above maxDf never form pairs") {
    import spark.implicits._
    val boiler = (1 to 10).map(i => s"b$i").mkString(" ")
    val df = (1L to 5L).map(i => (i, s"$boiler unique$i tail$i"))
      .toDF("id", "text")
    // every fingerprint from the boilerplate block hits df=5 > maxDf=4
    val pairs = Winnow.overlapPairs(df, "id", "text", k = 4, w = 4,
      maxDf = 4L, minShared = 1L)
    assert(pairs.count() == 0,
      "stop-gram fingerprints leaked into the candidate join")
  }

  test("pairs are invariant under repartitioning; scores in (0, 1]") {
    val d = Tables.documents(spark, sf).select(col("doc_id"), col("text"))
    val twins = d.filter(col("doc_id") % 2 === 0)
      .select((col("doc_id") + 1000000L).as("doc_id"),
        expr("substring(text, instr(text, ' ') + 1)").as("text"))
    val u = d.unionByName(twins)
    val a = Winnow.overlapPairs(u, "doc_id", "text")
    val b = Winnow.overlapPairs(u.repartition(13), "doc_id", "text")
    assertBagEqual(a, b)
    val mm = a.agg(min(col("score")), max(col("score"))).head()
    assert(mm.getDouble(0) > 0.0 && mm.getDouble(1) <= 1.0)
    // the dropped-first-token twins must surface with high containment
    val twinPairs = a.filter(col("b") === col("a") + 1000000L)
    assert(twinPairs.filter(col("score") > 0.5).count() >
      twinPairs.count() / 2,
      "twin docs did not dominate the high-containment band")
  }
}
