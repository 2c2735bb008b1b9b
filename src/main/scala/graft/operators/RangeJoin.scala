package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Interval (range-containment) join — `probe.t ∈ [ival.start,
  * ival.end)` (SURVEY §2.3 lists range joins among the join types the
  * reference lacks and Spark has no native operator for; Catalyst
  * plans the raw theta join as a broadcast nested loop).
  *
  * Two strategies:
  *
  *  - `naive`: the BNL join — fine when one side broadcasts.
  *  - `bucketed`: the scale path. Intervals are exploded onto a
  *    fixed-width bucket grid (one row per bucket they overlap), the
  *    probe computes its single bucket, and the join becomes an
  *    EQUI-join on bucket id followed by the exact containment filter.
  *    Work scales with |probe| + Σ interval-widths/bucketWidth instead
  *    of |probe|·|intervals|. Skewed buckets (an interval spanning
  *    everything) are bounded by the grid width and AQE's skew
  *    handling on the shuffle.
  */
object RangeJoin {

  /** Both timestamps as epoch micros (UTC session). */
  private def us(c: Column): Column = unix_micros(c.cast("timestamp"))

  def naive(probe: DataFrame, intervals: DataFrame, probeTime: String,
            startCol: String, endCol: String): DataFrame =
    probe.join(intervals,
      col(probeTime) >= col(startCol) && col(probeTime) < col(endCol))

  def bucketed(probe: DataFrame, intervals: DataFrame, probeTime: String,
               startCol: String, endCol: String,
               bucketWidthUs: Long = 30L * 86400 * 1000000): DataFrame = {
    val expanded = intervals.withColumn("_bucket",
      explode(sequence(
        (us(col(startCol)) / bucketWidthUs).cast("long"),
        ((us(col(endCol)) - 1) / bucketWidthUs).cast("long"))))
    val probed = probe.withColumn("_bucket",
      (us(col(probeTime)) / bucketWidthUs).cast("long"))
    probed.join(expanded, Seq("_bucket"))
      .filter(col(probeTime) >= col(startCol) && col(probeTime) < col(endCol))
      .drop("_bucket")
  }
}
