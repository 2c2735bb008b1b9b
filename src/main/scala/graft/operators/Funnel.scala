package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Ordered funnel analysis (product analytics over the event stream):
  * how many users progress through stage 1 → 2 → … → k, where a user
  * reaches stage i iff their event history contains the stage types
  * in that time order (greedy earliest match; same-timestamp ties
  * break by stage index, deterministically on both engines).
  *
  * Scale shape: ONE pass — non-stage events are filtered at the scan,
  * the per-user history collapses to a sorted (ts, stage) array whose
  * greedy fold yields the furthest stage reached (state per user =
  * their stage events only), and the final row is a k-column
  * conditional-sum aggregate over users. No per-stage join cascade
  * (the k-join formulation reads the event table k times and shuffles
  * k times; this shuffles once). The fold is the q121/q124 pinned-
  * order discipline, though here the values are ints — exact
  * regardless of order, the sort matters for SEMANTICS (time order),
  * not reproducibility. */
object Funnel {

  /** Stage index column: 1-based position of `typeCol` in `stages`,
    * 0 for non-stage events. */
  def stageIndex(typeCol: String, stages: Seq[String]): Column = {
    require(stages.nonEmpty && stages.size <= 8,
      s"stages.size=${stages.size} outside [1, 8]")
    require(stages.distinct.size == stages.size, "duplicate stages")
    stages.zipWithIndex.foldLeft(lit(0)) {
      case (acc, (s, i)) => when(col(typeCol) === s, lit(i + 1)).otherwise(acc)
    }
  }

  /** `(u, reached)` — the furthest stage each user progresses to, via
    * the greedy fold over their time-sorted stage events. Users with
    * no stage events are absent; users with stage events but no
    * stage-1 start have `reached = 0`. */
  def reachedPerUser(events: DataFrame, userCol: String, typeCol: String,
                     tsCol: String, stages: Seq[String]): DataFrame =
    events
      .select(col(userCol).as("u"),
        stageIndex(typeCol, stages).as("si"), col(tsCol).as("ts"))
      .filter(col("si") >= 1)
      .groupBy(col("u"))
      .agg(aggregate(
        transform(array_sort(collect_list(struct(col("ts"), col("si")))),
          x => x("si")),
        lit(0),
        (acc, x) => when(x === acc + 1, acc + 1).otherwise(acc))
        .as("reached"))

  /** One row: `n_<stage>` user counts for every stage, monotonically
    * non-increasing left to right. */
  def funnel(events: DataFrame, userCol: String, typeCol: String,
             tsCol: String, stages: Seq[String]): DataFrame = {
    val perUser = reachedPerUser(events, userCol, typeCol, tsCol, stages)
    val aggs = stages.zipWithIndex.map { case (s, i) =>
      sum(when(col("reached") >= i + 1, 1L).otherwise(0L)).as(s"n_$s")
    }
    perUser.agg(aggs.head, aggs.tail: _*)
  }
}
