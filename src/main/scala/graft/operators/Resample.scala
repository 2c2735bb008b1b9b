package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Time-series resampling to a regular grid (SURVEY §2.9's spine
  * pattern promoted to an operator): aggregate to `grain` buckets,
  * complete the grid so EVERY (bucket, key) combination exists —
  * missing buckets surface as explicit rows instead of silent holes —
  * then optionally repair the value column by carry-forward.
  *
  * Scale shape: the aggregate is one shuffle over the facts; the spine
  * is generated DISTRIBUTED from the data's own min/max (a 2-scalar
  * aggregate feeding `sequence` — no driver collect, no hand-written
  * calendar), and is bucket-count-sized, so the grid completion join
  * broadcasts. The optional fill is [[Relational.fillForward]]'s
  * per-key window. Facts stream through exactly once.
  */
object Resample {

  /** Supported grains map 1:1 to `date_trunc` units with a matching
    * spine step. */
  private val steps = Map(
    "day" -> "interval 1 day",
    "week" -> "interval 7 day",
    "month" -> "interval 1 month",
    "year" -> "interval 1 year")

  /** Resample `valueCol` to (`grain` bucket × keys): `vsum`
    * (decimal-exact) and `vcount` per cell; absent cells get
    * `vcount = 0` and, when `fill`, the latest preceding `vsum`
    * (otherwise null). */
  def resample(df: DataFrame, timeCol: String, grain: String,
               keys: Seq[String], valueCol: String,
               fill: Boolean = false): DataFrame = {
    val step = steps.getOrElse(grain.toLowerCase,
      throw new IllegalArgumentException(
        s"grain '$grain' not in ${steps.keys.mkString("/")}"))
    val bucketed = df
      .groupBy(date_trunc(grain, col(timeCol)).as("bucket") +:
        keys.map(col): _*)
      .agg(sum(col(valueCol).cast(DecimalType(18, 4))).as("vsum"),
        count(col(valueCol)).as("vcount"))
    val spine = df
      .agg(date_trunc(grain, min(col(timeCol))).as("lo"),
        date_trunc(grain, max(col(timeCol))).as("hi"))
      .select(explode(sequence(col("lo"), col("hi"), expr(step)))
        .as("bucket"))
    val grid =
      if (keys.isEmpty) spine
      else spine.crossJoin(df.select(keys.map(col): _*).distinct())
    val full = grid.join(bucketed, "bucket" +: keys, "left")
      .withColumn("vcount", coalesce(col("vcount"), lit(0L)))
    if (fill) Relational.fillForward(full, keys, Seq("bucket"), Seq("vsum"))
    else full
  }

  /** Exponentially weighted moving average, final value per key:
    * e₁ = v₁, eᵢ = α·vᵢ + (1−α)·eᵢ₋₁ over the key's history in
    * (ts, v) order — the streaming-metric smoother (recursive, so no
    * window frame expresses it; the fold does). Cross-engine
    * reproducible by the q121 discipline: the history folds as a
    * SORTED array seeded with its first element (fold1 — exactly
    * DuckDB's `list_reduce`), and the caller mirrors 1−α op-for-op,
    * so every intermediate is bit-identical. Output: `(keyCol,
    * n_obs, ewma)` rounded to 6 decimals.
    *
    * Scale shape: one shuffle (the groupBy); state per key = its
    * history array. Histories are clock-bounded (one point per tick);
    * unbounded streams chunk by calendar partition first. */
  def ewma(df: DataFrame, keyCol: String, tsCol: String, valCol: String,
           alpha: Double): DataFrame = {
    require(alpha > 0 && alpha < 1, s"alpha=$alpha outside (0,1)")
    val beta = 1.0 - alpha
    df.filter(col(valCol).isNotNull)
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_obs"),
        array_sort(collect_list(
          struct(col(tsCol).as("ts"), col(valCol).cast("double").as("v"))))
          .as("hist"))
      .select(col(keyCol), col("n_obs"),
        round(aggregate(
          // NB: a literal Int.MaxValue length overflows inside Slice
          // (start+length wraps) and yields an EMPTY tail — bound by
          // the actual size instead
          slice(transform(col("hist"), x => x("v")), lit(2),
            size(col("hist"))),
          element_at(transform(col("hist"), x => x("v")), 1),
          (acc, x) => lit(alpha) * x + lit(beta) * acc), 6).as("ewma"))
  }

  /** Oracle spelling of [[ewma]]'s fold (the history list must be
    * built by the caller in the same (ts, v) sort order). */
  def sqlEwmaFold(histExpr: String, alpha: Double): String =
    s"list_reduce($histExpr, (acc, x) -> $alpha * x + " +
      s"(CAST(1 AS DOUBLE) - $alpha) * acc)"
}
