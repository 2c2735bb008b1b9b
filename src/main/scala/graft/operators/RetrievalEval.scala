package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Judged retrieval-quality metrics (training-data pipeline ★): the
  * standard IR eval tier — precision@k, MRR, and binary-relevance
  * nDCG@k — over ANY ranked run plus a relevance-count table. This is
  * the measurement side of the ANN/retrieval family (q34/q52/q179/
  * q181 produce runs; q176 audits recall of ONE detector against ONE
  * truth set; this scores ranked quality the way retrieval-training
  * pipelines select hard-negative miners and embedding models).
  *
  * Scale shape: the run arrives already ranked (the caller's top-k
  * chain); everything here is ONE groupBy(q_id) collecting ≤ k
  * entries per query plus a BROADCAST join of the query-bounded
  * relevance counts — no corpus re-scan, no extra shuffle beyond the
  * per-query aggregate.
  *
  * Determinism: every per-rank term is round-6 BEFORE summation and
  * the per-query folds run left-to-right over the rank-sorted array
  * in both engines (the [[Pca]] `foldSum` discipline), so the only
  * libm op (log2) is rounded before it can interact with ordering.
  * nDCG's ideal DCG uses min(n_rel, k) terms; queries with no
  * relevant documents score 0 across the board (not NULL).
  */
object RetrievalEval {

  /** `run`: `(q_id, rn, rel)` — rank (1-based, ≤ k rows per query
    * expected) and binary relevance. `relCounts`: `(q_id, n_rel)` —
    * total relevant documents in the corpus for the query (the
    * recall/ideal-DCG denominator), query-bounded (broadcast).
    * Output per query: `(q_id, n_rel_corpus, n_rel_topk,
    * precision_at_k, mrr, ndcg_at_k)`. */
  def judgedMetrics(run: DataFrame, relCounts: DataFrame, k: Int)
      : DataFrame = {
    require(k >= 1 && k <= 1000, s"k=$k outside [1, 1000]")
    val term = (rn: Column) =>
      round(lit(1.0) / log2(rn.cast("double") + 1), 6)
    val top = run.filter(col("rn") <= k)
      .groupBy(col("q_id"))
      .agg(array_sort(collect_list(struct(
        col("rn").cast("long").as("rn"),
        col("rel").cast("long").as("rel")))).as("t"))
      .join(broadcast(relCounts), Seq("q_id"))
    val nTop = aggregate(col("t"), lit(0L), (acc, x) => acc + x("rel"))
    val dcg = aggregate(col("t"), lit(0.0), (acc, x) =>
      acc + when(x("rel") === 1, term(x("rn"))).otherwise(lit(0.0)))
    // sequence(1, m) descends when m < 1 — guard the empty case
    val idcg = when(col("n_rel") >= 1,
      aggregate(sequence(lit(1L), least(col("n_rel"), lit(k.toLong))),
        lit(0.0), (acc, i) => acc + term(i)))
      .otherwise(lit(0.0))
    val firstRel = array_min(transform(
      filter(col("t"), x => x("rel") === 1), x => x("rn")))
    top.select(col("q_id"),
      col("n_rel").cast("long").as("n_rel_corpus"),
      nTop.as("n_rel_topk"),
      round(nTop.cast("double") / lit(k.toDouble), 6).as("precision_at_k"),
      round(coalesce(lit(1.0) / firstRel.cast("double"), lit(0.0)), 6)
        .as("mrr"),
      when(idcg > 0, round(dcg / idcg, 6)).otherwise(lit(0.0))
        .as("ndcg_at_k"))
  }

  /** DuckDB replay of [[judgedMetrics]]: expects CTEs `run`
    * (q_id, rn, rel) and `rc` (q_id, n_rel) in scope; emits the
    * final SELECT with the same left folds
    * (`list_reduce(list_prepend(...))` — the [[Pca]] spelling). */
  def sqlJudgedMetrics(k: Int): String = {
    require(k >= 1 && k <= 1000, s"k=$k outside [1, 1000]")
    def fold(listExpr: String, zero: String): String =
      s"list_reduce(list_prepend($zero, $listExpr), (a, b) -> a + b)"
    val dcg = fold(
      "list_transform(t, x -> CASE WHEN x.rel = 1 THEN " +
        "round(1.0 / log2(CAST(x.rn AS DOUBLE) + 1), 6) " +
        "ELSE CAST(0.0 AS DOUBLE) END)",
      "CAST(0.0 AS DOUBLE)")
    val idcg = fold(
      s"list_transform(range(1, least(n_rel, $k) + 1), " +
        "i -> round(1.0 / log2(CAST(i AS DOUBLE) + 1), 6))",
      "CAST(0.0 AS DOUBLE)")
    s"""top AS (
       |  SELECT q_id,
       |    list_sort(list({'rn': CAST(rn AS BIGINT),
       |                    'rel': CAST(rel AS BIGINT)})) AS t
       |  FROM run WHERE rn <= $k GROUP BY 1),
       |j AS (
       |  SELECT top.q_id, top.t, CAST(rc.n_rel AS BIGINT) AS n_rel
       |  FROM top JOIN rc ON rc.q_id = top.q_id),
       |m AS (
       |  SELECT q_id, n_rel, t,
       |    ${fold("list_transform(t, x -> x.rel)", "CAST(0 AS BIGINT)")}
       |      AS n_top,
       |    $dcg AS dcg, $idcg AS idcg
       |  FROM j)
       |SELECT q_id, n_rel AS n_rel_corpus, n_top AS n_rel_topk,
       |  round(CAST(n_top AS DOUBLE) / ${k}.0, 6) AS precision_at_k,
       |  round(COALESCE(1.0 / CAST(list_min(list_transform(
       |    list_filter(t, x -> x.rel = 1), x -> x.rn)) AS DOUBLE),
       |    0.0), 6) AS mrr,
       |  CASE WHEN idcg > 0 THEN round(dcg / idcg, 6)
       |       ELSE 0.0 END AS ndcg_at_k
       |FROM m ORDER BY q_id""".stripMargin
  }
}
