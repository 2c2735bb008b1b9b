package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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

  /** Holt double (linear-trend) exponential smoothing — the
    * forecasting baseline one tier above [[ewma]]: a level AND a
    * trend state, l_t = αy_t + (1−α)(l+b), b_t = β(l_t−l) + (1−β)b,
    * initialized the textbook way (l₀ = y₁, b₀ = y₂ − y₁) and folded
    * over the time-sorted history in one per-group pass (the q121
    * sorted-array discipline — series are calendar-bounded after the
    * daily aggregation, so per-group state is metadata-sized). The
    * h-step forecast is l + h·b. Every step is a pinned IEEE op
    * sequence ([[sqlHoltFold]] replays it with a same-shape struct
    * accumulator), so level, trend, and forecasts hash-match.
    * Requires ≥ 2 observations per key (shorter series are dropped —
    * b₀ is undefined). */
  def holt(df: DataFrame, keyCol: String, tsCol: String, valCol: String,
           alpha: Double, beta: Double, horizons: Int = 3): DataFrame = {
    require(alpha > 0 && alpha < 1, s"alpha=$alpha outside (0,1)")
    require(beta > 0 && beta < 1, s"beta=$beta outside (0,1)")
    require(horizons >= 1 && horizons <= 12, "horizons outside [1,12]")
    val grouped = df.filter(col(valCol).isNotNull)
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_obs"),
        array_sort(collect_list(
          struct(col(tsCol).as("ts"), col(valCol).cast("double").as("v"))))
          .as("hist"))
      .filter(col("n_obs") >= 2)
    val vs = transform(col("hist"), x => x("v"))
    // the trend update uses the IDENTITY l_t − l_{t−1} =
    // α(y − l) + (1−α)b so the level expression is never recomputed
    // inside the trend field: DuckDB's list_reduce mis-CSEs a
    // repeated sibling-field subexpression across fold steps (step 1
    // right, step 2 wrong — found the hard way), and this spelling
    // keeps each struct field an independent tree. Both engines run
    // THIS op sequence, so parity holds.
    val fin = aggregate(
      slice(vs, lit(3), greatest(size(vs) - 2, lit(0))),
      struct(element_at(vs, 1).as("l"),
        (element_at(vs, 2) - element_at(vs, 1)).as("b")),
      (acc, y) => struct(
        (lit(alpha) * y +
          (lit(1.0) - lit(alpha)) * (acc("l") + acc("b"))).as("l"),
        (lit(beta) * (lit(alpha) * (y - acc("l")) +
          (lit(1.0) - lit(alpha)) * acc("b")) +
          (lit(1.0) - lit(beta)) * acc("b")).as("b")))
    val fcs = (1 to horizons).map(h =>
      (round(fin("l") + lit(h) * fin("b"), 6) + lit(0.0)).as(s"fc$h"))
    grouped.select(Seq(col(keyCol), col("n_obs"),
      (round(fin("l"), 6) + lit(0.0)).as("level"),
      (round(fin("b"), 6) + lit(0.0)).as("trend")) ++ fcs: _*)
  }

  /** Holt–Winters ADDITIVE seasonal smoothing — the tier above
    * [[holt]] for series with a repeating period m (weekly cycles on
    * daily data): level, trend, AND a rolling m-vector of seasonal
    * indices. Textbook initialization over the first two seasons
    * (l₀ = mean of season 1, b₀ = (mean₂ − mean₁)/m, sᵢ = yᵢ − l₀),
    * then one per-group fold over the rest with the updates
    * l ← α(y − s_{t−m}) + (1−α)(l+b);
    * b ← β·Δl + (1−β)b (via the Δl identity, the [[holt]] CSE
    * discipline); s_t ← γ(y − l − b) + (1−γ)s_{t−m}, the seasonal
    * queue rolling left. h-step forecast = l + h·b + s_queue[h]
    * (h ≤ m). Requires ≥ 2m observations (shorter series drop — the
    * init means are undefined). Init sums are LEFT folds in both
    * engines, so every IEEE op is sequence-pinned end to end.
    * Output also carries `s_range` = round-6 max−min of the final
    * seasonal queue — the seasonality-amplitude statistic. */
  def holtWinters(df: DataFrame, keyCol: String, tsCol: String,
                  valCol: String, alpha: Double, beta: Double,
                  gamma: Double, period: Int,
                  horizons: Int = 3): DataFrame = {
    require(alpha > 0 && alpha < 1, s"alpha=$alpha outside (0,1)")
    require(beta > 0 && beta < 1, s"beta=$beta outside (0,1)")
    require(gamma > 0 && gamma < 1, s"gamma=$gamma outside (0,1)")
    require(period >= 2 && period <= 24, s"period=$period outside [2,24]")
    require(horizons >= 1 && horizons <= period,
      s"horizons=$horizons outside [1, period]")
    val m = period
    val grouped = df.filter(col(valCol).isNotNull)
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_obs"),
        array_sort(collect_list(
          struct(col(tsCol).as("ts"), col(valCol).cast("double").as("v"))))
          .as("hist"))
      .filter(col("n_obs") >= 2 * m)
    val vs = transform(col("hist"), x => x("v"))
    val foldSum = (arr: org.apache.spark.sql.Column) =>
      aggregate(arr, lit(0.0), (acc, x) => acc + x)
    val sum1 = foldSum(slice(vs, lit(1), lit(m)))
    val sum2 = foldSum(slice(vs, lit(m + 1), lit(m)))
    val l0 = sum1 / lit(m.toDouble)
    val b0 = (sum2 / lit(m.toDouble) - sum1 / lit(m.toDouble)) /
      lit(m.toDouble)
    val s0 = transform(slice(vs, lit(1), lit(m)), y => y - l0)
    val fin = aggregate(
      slice(vs, lit(2 * m + 1), greatest(size(vs) - 2 * m, lit(0))),
      struct(l0.as("l"), b0.as("b"), s0.as("sq")),
      (acc, y) => {
        val sUse = element_at(acc("sq"), 1)
        struct(
          (lit(alpha) * (y - sUse) +
            (lit(1.0) - lit(alpha)) * (acc("l") + acc("b"))).as("l"),
          (lit(beta) * (lit(alpha) * (y - sUse - acc("l")) +
            (lit(1.0) - lit(alpha)) * acc("b")) +
            (lit(1.0) - lit(beta)) * acc("b")).as("b"),
          concat(slice(acc("sq"), lit(2), lit(m - 1)),
            array(lit(gamma) * (y - acc("l") - acc("b")) +
              (lit(1.0) - lit(gamma)) * sUse)).as("sq"))
      })
    val fcs = (1 to horizons).map(h =>
      (round(fin("l") + lit(h) * fin("b") +
        element_at(fin("sq"), h), 6) + lit(0.0)).as(s"fc$h"))
    grouped.select(Seq(col(keyCol), col("n_obs"),
      (round(fin("l"), 6) + lit(0.0)).as("level"),
      (round(fin("b"), 6) + lit(0.0)).as("trend"),
      (round(array_max(fin("sq")) - array_min(fin("sq")), 6) + lit(0.0))
        .as("s_range")) ++ fcs: _*)
  }

  /** Oracle replay of [[holtWinters]] as a RECURSIVE CTE (the
    * [[sqlHoltRec]] struct-mutation rationale; the seasonal queue is
    * a DOUBLE[] column rolling left each row). Emits `rec(<key>, i,
    * l, b, sq)`; caller opens WITH RECURSIVE, provides
    * `<rel>(<key>, <hist>)` with a time-sorted DOUBLE list ≥ 2m long,
    * and selects `rec.i = len(hist)`. */
  def sqlHoltWintersRec(rel: String, key: String, hist: String,
                        alpha: Double, beta: Double, gamma: Double,
                        period: Int): String = {
    val m = period
    val a = s"CAST($alpha AS DOUBLE)"
    val b = s"CAST($beta AS DOUBLE)"
    val g = s"CAST($gamma AS DOUBLE)"
    val one = "CAST(1 AS DOUBLE)"
    val md = s"CAST($m AS DOUBLE)"
    def foldSum(listExpr: String): String =
      s"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), $listExpr), " +
        "(x, y) -> x + y)"
    val sum1 = foldSum(s"$hist[1:$m]")
    val sum2 = foldSum(s"$hist[${m + 1}:${2 * m}]")
    s"""ini AS (
       |  SELECT $key, $sum1 / $md AS l0,
       |    ($sum2 / $md - $sum1 / $md) / $md AS b0
       |  FROM $rel),
       |rec AS (
       |  SELECT r.$key, ${2 * m} AS i, ini.l0 AS l, ini.b0 AS b,
       |    list_transform(r.$hist[1:$m], y -> y - ini.l0) AS sq
       |  FROM $rel r JOIN ini ON ini.$key = r.$key
       |  UNION ALL
       |  SELECT r.$key, r.i + 1,
       |    $a * (h.$hist[r.i + 1] - r.sq[1])
       |      + ($one - $a) * (r.l + r.b),
       |    $b * ($a * (h.$hist[r.i + 1] - r.sq[1] - r.l)
       |      + ($one - $a) * r.b) + ($one - $b) * r.b,
       |    list_append(r.sq[2:$m],
       |      $g * (h.$hist[r.i + 1] - r.l - r.b) + ($one - $g) * r.sq[1])
       |  FROM rec r JOIN $rel h ON h.$key = r.$key
       |  WHERE r.i < len(h.$hist))""".stripMargin
  }

  /** Oracle replay of [[holt]]'s fold as a RECURSIVE CTE — NOT a
    * struct-valued list_reduce: DuckDB (v1.0.0) mutates the struct
    * accumulator IN PLACE from the second fold application on, so a
    * sibling field reading `acc.l` sees the freshly written level
    * (found the hard way — step 1 folds correctly, step 2 diverges).
    * The recursive CTE computes both state fields from the same
    * previous ROW, the standard semantics both engines share. Emits
    * the CTE `rec(<key>, i, l, b)`; the caller must open the clause
    * with WITH RECURSIVE, have `<rel>(<key>, <hist>)` in scope with a
    * time-sorted DOUBLE list ≥ 2 long, and select the terminal rows
    * `rec.i = len(hist)`. The trend update uses the identity
    * l_t − l_{t−1} = α(y−l) + (1−α)b — the op sequence [[holt]] pins. */
  def sqlHoltRec(rel: String, key: String, hist: String,
                 alpha: Double, beta: Double): String = {
    val a = s"CAST($alpha AS DOUBLE)"
    val b = s"CAST($beta AS DOUBLE)"
    val one = "CAST(1 AS DOUBLE)"
    s"""rec AS (
       |  SELECT $key, 2 AS i, $hist[1] AS l, $hist[2] - $hist[1] AS b
       |  FROM $rel
       |  UNION ALL
       |  SELECT r.$key, r.i + 1,
       |    $a * h.$hist[r.i + 1] + ($one - $a) * (r.l + r.b),
       |    $b * ($a * (h.$hist[r.i + 1] - r.l) + ($one - $a) * r.b)
       |      + ($one - $b) * r.b
       |  FROM rec r JOIN $rel h ON h.$key = r.$key
       |  WHERE r.i < len(h.$hist))""".stripMargin
  }
}
