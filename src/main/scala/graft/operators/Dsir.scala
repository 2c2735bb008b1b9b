package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data Selection via Importance Resampling (training-data pipeline ★
  * — DSIR, Xie et al. 2023: pick raw-corpus documents that LOOK like a
  * small target corpus by scoring each doc's hashed n-gram features
  * under a target-vs-raw bag-of-features likelihood ratio). This is
  * the distribution-matching selection tier that sits between the
  * rule banks (q148) and the learned classifier (q162): no labels and
  * no lexicon, just two feature histograms.
  *
  * Features are hashed token buckets (`portableHash64 mod buckets`) —
  * the fixed-dimension trick that makes the model size INDEPENDENT of
  * vocabulary: both histograms are exactly `buckets` rows regardless
  * of corpus size, so they broadcast at any scale. The importance
  * weight of a doc is
  *   Σ_b m_b · [log2 p̂_target(b) − log2 p̂_raw(b)]
  * with add-one smoothing over the bucket space; DSIR then keeps the
  * top-weighted docs (the deterministic stand-in for its Gumbel
  * resampling — the ranking is the engine-checkable core).
  *
  * Determinism contract: histogram counts are exact ints; the per-doc
  * sum folds a SORTED (bucket asc) struct array in IEEE order and
  * rounds to 6 (the q121/q155 discipline); the final ranking's
  * (weight desc, key asc) order is total and null-free.
  *
  * Scale shape (100 TB lens): the corpus is exploded ONCE and
  * aggregated to (doc, bucket) counts — the only corpus-sized shuffle;
  * target and raw histograms come from the SAME pass as conditional
  * sums (the target subset is a predicate, not a second scan); the
  * two model frames (≤ buckets rows + one 1-row totals frame)
  * broadcast into the scoring join; top-k plans as
  * TakeOrderedAndProject, never a global sort.
  */
object Dsir {

  /** Per-doc importance weights of `docs(keyCol, textCol)` toward the
    * subcorpus selected by `targetPred`:
    * `(keyCol, n_toks, weight)` — rank by (weight desc, key) and LIMIT
    * for the resampled subset. `buckets` must be small enough to
    * broadcast (≤ 1 << 20). */
  def importanceWeights(docs: DataFrame, keyCol: String, textCol: String,
                        targetPred: Column, buckets: Int): DataFrame = {
    require(buckets > 0 && buckets <= (1 << 20),
      s"buckets=$buckets outside (0, 2^20]")
    val b = pmod(graft.functions.Scalars.portableHash64(col("tok")),
      lit(buckets.toLong)).as("b")
    // ONE corpus explode feeds doc features AND both histograms
    val dt = docs
      .select(col(keyCol), targetPred.as("is_t"),
        explode(split(col(textCol), " ")).as("tok"))
      .select(col(keyCol), col("is_t"), b)
      .groupBy(col(keyCol), col("is_t"), col("b"))
      .agg(count(lit(1)).as("m"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val hist = dt.groupBy(col("b"))
      .agg(sum(when(col("is_t"), col("m")).otherwise(lit(0L))).as("tb"),
        sum(col("m")).as("rb"))
    val tot = hist.agg(sum(col("tb")).as("tt"), sum(col("rb")).as("rt"))
    val nl = col("m").cast("double") *
      (log(2.0, (coalesce(col("tb"), lit(0L)) + lit(1L)).cast("double") /
          (col("tt") + lit(buckets.toLong)).cast("double")) -
        log(2.0, (coalesce(col("rb"), lit(0L)) + lit(1L)).cast("double") /
          (col("rt") + lit(buckets.toLong)).cast("double")))
    dt.join(broadcast(hist), Seq("b"), "left")
      .crossJoin(broadcast(tot))
      .groupBy(col(keyCol))
      .agg(sum(col("m")).cast("long").as("n_toks"),
        array_sort(collect_list(struct(col("b"), nl.as("nl")))).as("es"))
      .select(col(keyCol), col("n_toks"),
        (round(aggregate(col("es"), lit(0.0), (acc, x) => acc + x("nl")),
          6) + lit(0.0)).as("weight"))
  }

  /** DuckDB replay of [[importanceWeights]]; CTE chain ending in
    * `dsirw(k, n_toks, weight)`. */
  def sqlImportanceWeights(rel: String, keyExpr: String, textExpr: String,
                           targetWhere: String, buckets: Int): String = {
    val h = graft.functions.Scalars.sqlPortableHash64("tok")
    s"""dsirt AS (
       |  SELECT k, is_t, ($h) % $buckets AS b FROM (
       |    SELECT $keyExpr AS k, ($targetWhere) AS is_t,
       |      unnest(string_split($textExpr, ' ')) AS tok FROM $rel)),
       |dsird AS (
       |  SELECT k, is_t, b, COUNT(*) AS m FROM dsirt GROUP BY 1, 2, 3),
       |dsirh AS (
       |  SELECT b,
       |    CAST(SUM(CASE WHEN is_t THEN m ELSE 0 END) AS BIGINT) AS tb,
       |    CAST(SUM(m) AS BIGINT) AS rb
       |  FROM dsird GROUP BY 1),
       |dsirg AS (
       |  SELECT CAST(SUM(tb) AS BIGINT) AS tt,
       |    CAST(SUM(rb) AS BIGINT) AS rt FROM dsirh),
       |dsirw AS (
       |  SELECT k, CAST(SUM(m) AS BIGINT) AS n_toks,
       |    round(list_reduce(list_prepend(0.0, list_transform(
       |      list_sort(list({'b': b,
       |        'nl': CAST(m AS DOUBLE) *
       |          (ln(CAST(COALESCE(tb, 0) + 1 AS DOUBLE)
       |              / CAST(tt + $buckets AS DOUBLE)) / ln(2)
       |           - ln(CAST(COALESCE(rb, 0) + 1 AS DOUBLE)
       |              / CAST(rt + $buckets AS DOUBLE)) / ln(2))})),
       |      x -> x.nl)), (acc, x) -> acc + x), 6) + 0.0 AS weight
       |  FROM dsird LEFT JOIN dsirh USING (b) CROSS JOIN dsirg
       |  GROUP BY k)""".stripMargin
  }
}
