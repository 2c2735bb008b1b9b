package graft

import graft.operators.RetrievalEval
import org.apache.spark.sql.functions._

/** Judged retrieval metrics: hand-computed precision/MRR/nDCG on a
  * fixed run, the no-relevant edge case, and the ideal-run identity. */
class RetrievalEvalSpec extends SparkSpecBase {

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("hand-computed metrics on a 3-query run at k=3") {
    import spark.implicits._
    // q1: rel at ranks 1,3 of [1,2,3]; n_rel=5 -> ideal m=3
    // q2: rel at rank 2 only; n_rel=1 -> ideal m=1
    // q3: no rel; n_rel=4 -> all-zero metrics
    val run = Seq(
      (1L, 1L, 1L), (1L, 2L, 0L), (1L, 3L, 1L),
      (2L, 1L, 0L), (2L, 2L, 1L), (2L, 3L, 0L),
      (3L, 1L, 0L), (3L, 2L, 0L), (3L, 3L, 0L))
      .toDF("q_id", "rn", "rel")
    val rc = Seq((1L, 5L), (2L, 1L), (3L, 4L)).toDF("q_id", "n_rel")
    val out = RetrievalEval.judgedMetrics(run, rc, 3)
      .orderBy(col("q_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5)))
    val t = (i: Long) => round6(1.0 / (math.log(i + 1.0) / math.log(2.0)))
    // q1: dcg = t(1)+t(3); idcg = t(1)+t(2)+t(3)
    val ndcg1 = round6((t(1) + t(3)) / (t(1) + t(2) + t(3)))
    // q2: dcg = t(2); idcg = t(1) = 1.0
    val ndcg2 = round6(t(2) / t(1))
    assert(out.toSeq === Seq(
      (1L, 5L, 2L, round6(2.0 / 3), 1.0, ndcg1),
      (2L, 1L, 1L, round6(1.0 / 3), 0.5, ndcg2),
      (3L, 4L, 0L, 0.0, 0.0, 0.0)))
  }

  test("ideal run scores ndcg = 1 and mrr = 1; n_rel = 0 is all-zero " +
      "without NULL or NaN") {
    import spark.implicits._
    val run = Seq((1L, 1L, 1L), (1L, 2L, 1L), (1L, 3L, 0L),
      (2L, 1L, 0L)).toDF("q_id", "rn", "rel")
    val rc = Seq((1L, 2L), (2L, 0L)).toDF("q_id", "n_rel")
    val out = RetrievalEval.judgedMetrics(run, rc, 3)
      .orderBy(col("q_id")).collect()
      .map(r => (r.getLong(0), r.getDouble(4), r.getDouble(5)))
    assert(out.toSeq === Seq((1L, 1.0, 1.0), (2L, 0.0, 0.0)))
  }
}
