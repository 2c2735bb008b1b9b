package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Partial-aggregate maintenance (SURVEY §2.10's incremental-load
  * protocol applied to AGGREGATES): at 100 TB you never re-aggregate
  * history — you keep associative partial state (sum, count) at a fine
  * grain and re-aggregate THAT. A month's rollup over a year of data
  * reads 365 partial rows per key instead of billions of facts, and a
  * late-arriving day only rewrites its own partial (pairs with
  * `Sinks.upsertPartitions` for the landing step).
  *
  * Only algebraic state lives here — sum/count/min/max compose
  * losslessly across grains (avg derives as sum/count at read time;
  * storing avg itself would not merge). Distinct counts need a sketch
  * (HLL / `SpaceSavingAgg`) instead; that's deliberate — the partial
  * table's contract is that coarse answers from partials are EXACTLY
  * the answers from raw data, which q84's oracle checks.
  */
object Rollups {

  /** Fine-grain partial state: one row per (bucket, keys) carrying the
    * associative pieces. `grain` is any `date_trunc` unit. Sums are
    * decimal-exact so re-aggregation order can't perturb them. */
  def partials(df: DataFrame, timeCol: String, grain: String,
               keys: Seq[String], valueCol: String): DataFrame =
    df.groupBy(date_trunc(grain, col(timeCol)).as("bucket") +:
        keys.map(col): _*)
      .agg(
        sum(col(valueCol).cast(DecimalType(18, 4))).as("psum"),
        count(col(valueCol)).as("pcount"),
        min(col(valueCol)).as("pmin"),
        max(col(valueCol)).as("pmax"))

  /** Re-aggregate partial state to a coarser grain — the only pass a
    * scheduled rollup runs. Touches partials only, never raw facts. */
  def reaggregate(partialsDf: DataFrame, coarserGrain: String,
                  keys: Seq[String]): DataFrame =
    partialsDf
      .groupBy(date_trunc(coarserGrain, col("bucket")).as("bucket") +:
        keys.map(col): _*)
      .agg(
        sum(col("psum")).as("psum"),
        sum(col("pcount")).as("pcount"),
        min(col("pmin")).as("pmin"),
        max(col("pmax")).as("pmax"))

  /** The sketch tier: DISTINCT counts in partial state. An exact
    * distinct does not compose across buckets (day-level distincts
    * can't merge into a month's), which is exactly what HLL sketches
    * buy — `pdistinct` is a fixed-size binary that unions losslessly
    * (for the sketch's own error bound) at any coarser grain. The
    * estimate stays within the standard HLL error of the true distinct
    * (RollupsSpec pins it); answers needing exactness go to raw data. */
  def partialsWithDistinct(df: DataFrame, timeCol: String, grain: String,
                           keys: Seq[String],
                           distinctCol: String): DataFrame =
    df.groupBy(date_trunc(grain, col(timeCol)).as("bucket") +:
        keys.map(col): _*)
      .agg(
        count(col(distinctCol)).as("pcount"),
        hll_sketch_agg(col(distinctCol)).as("pdistinct"))

  /** Merge sketch partials to a coarser grain: counts add, sketches
    * union — still never touching raw facts. */
  def reaggregateWithDistinct(partialsDf: DataFrame, coarserGrain: String,
                              keys: Seq[String]): DataFrame =
    partialsDf
      .groupBy(date_trunc(coarserGrain, col("bucket")).as("bucket") +:
        keys.map(col): _*)
      .agg(
        sum(col("pcount")).as("pcount"),
        hll_union_agg(col("pdistinct")).as("pdistinct"))

  /** Read a sketch column out as an estimate. */
  def distinctEstimate(c: org.apache.spark.sql.Column):
      org.apache.spark.sql.Column =
    hll_sketch_estimate(c)

  /** Incremental equi-JOIN maintenance (the join sibling of
    * [[partials]]): with a materialized join J = A ⋈ B and
    * append-only deltas ΔA, ΔB, the rows J is missing are exactly
    *
    *   ΔA ⋈ B  ∪  A ⋈ ΔB  ∪  ΔA ⋈ ΔB
    *
    * (base⋈base is already in J; each mixed term pairs one old side
    * with one new side; delta⋈delta pairs the new arrivals). At scale
    * the deltas are a sliver of the bases, so all three joins
    * broadcast the delta side and STREAM the base — a refresh costs
    * O(|Δ| + matching base partitions), never a base×base recompute.
    * Appending the result to J (e.g. via `Sinks.upsertPartitions`)
    * completes the refresh; q96's oracle checks the union equals the
    * full recomputed join. */
  def joinDelta(base: DataFrame, delta: DataFrame, otherBase: DataFrame,
                otherDelta: DataFrame, keys: Seq[String]): DataFrame =
    broadcast(delta).join(otherBase, keys)
      .unionByName(base.join(broadcast(otherDelta), keys))
      .unionByName(delta.join(otherDelta, keys))
}
