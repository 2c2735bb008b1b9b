package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The Wilson 95% score interval (z = 1.96, z² = 3.8416) spelled
  * ONCE for both engines — the estimator every sampled-truth audit
  * row (q256/q258/q261/q262) reports around its recall estimate. All
  * arithmetic is count-ratio-then-double with one shared operation
  * order, so the interval replays bit-for-bit in DuckDB: the SQL
  * fragments and the Column expressions below are the SAME formula
  * token for token, and the specs pin the sampled rows against their
  * exact-truth anchors. */
private[queries] object Wilson {

  /** DuckDB fragments over aggregated hit/total count expressions:
    * (recall_est, ci_lo, ci_hi), each already round(..., 6). */
  def sqlFragments(hitExpr: String, nExpr: String)
      : (String, String, String) = {
    val nD = s"CAST($nExpr AS DOUBLE)"
    val pD = s"(CAST($hitExpr AS DOUBLE) / $nD)"
    val denomD = s"(1.0 + 3.8416 / $nD)"
    val centerD = s"(($pD + 1.9208 / $nD) / $denomD)"
    val halfD = s"((1.96 / $denomD) * sqrt($pD * (1.0 - $pD) / $nD" +
      s" + 0.9604 / ($nD * $nD)))"
    (s"round($pD, 6)",
      s"round(greatest(0.0, $centerD - $halfD), 6)",
      s"round(least(1.0, $centerD + $halfD), 6)")
  }

  /** The Spark twin of [[sqlFragments]]: `hit` is the hit-count
    * column, `n` the truth-count column AS A DOUBLE (pass
    * `lit(n.toDouble)` for a constant denominator, `col(...)` cast
    * for a per-group one). Returns (recall_est, ci_lo, ci_hi),
    * each round(..., 6). */
  def columns(hit: Column, n: Column): (Column, Column, Column) = {
    val p = hit.cast("double") / n
    val denom = lit(1.0) + lit(3.8416) / n
    val center = (p + lit(1.9208) / n) / denom
    val half = (lit(1.96) / denom) *
      sqrt(p * (lit(1.0) - p) / n + lit(0.9604) / (n * n))
    (round(p, 6),
      round(greatest(lit(0.0), center - half), 6),
      round(least(lit(1.0), center + half), 6))
  }
}
