package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, AttributeSet, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}
import org.apache.spark.sql.types.{DataType, DoubleType}

object AsOfJoinPlan {
  /** Conf key bounding the collected/broadcast reference side — the
    * small-by-contract assumption made enforceable: misuse at scale
    * fails fast instead of OOMing the driver. */
  val MaxRefRowsKey = "spark.graft.asof.maxRefRows"
  val MaxRefRowsDefault = 10000000L

  def maxRefRows(spark: org.apache.spark.sql.SparkSession): Long =
    spark.conf.get(MaxRefRowsKey, MaxRefRowsDefault.toString).toLong

  /** Stable output attributes must be minted ONCE per node (plan copy
    * during analysis must not re-mint exprIds). */
  def create(left: LogicalPlan, right: LogicalPlan, leftTimeIdx: Int,
             rightTimeIdx: Int, rightValIdx: Int,
             refTsType: DataType): AsOfJoinPlan =
    AsOfJoinPlan(left, right, leftTimeIdx, rightTimeIdx, rightValIdx,
      AttributeReference("ref_ts", refTsType)(),
      AttributeReference("ref_val", DoubleType)())
}

/** Whole-operator custom plan for the backward as-of join (SURVEY §2.3
  * ★; custom-operator tier (c): LogicalPlan + Strategy + SparkPlan,
  * registered via graft.plans.GraftExtensions).
  *
  * Semantics: for each left row, append (ref_ts, ref_val) from the
  * latest right row with rightTime <= leftTime; drop left rows before
  * the first right observation (inner as-of). Physical strategy: the
  * reference side is collected sorted once and shipped to every
  * partition of the probe side, which is processed embarrassingly
  * parallel with a per-row binary search — ZERO shuffles end to end
  * (same shape Spark uses for BroadcastNestedLoopJoin, specialized to
  * ordered lookup).
  *
  * The Column-level strategies in operators.AsOfJoin express the same
  * semantics by composition; this node exists for the plan-integration
  * tier: it participates in Catalyst analysis/optimization like any
  * built-in operator (AsOfPlanSpec asserts equivalence with both).
  */
case class AsOfJoinPlan(
    left: LogicalPlan, right: LogicalPlan,
    leftTimeIdx: Int, rightTimeIdx: Int, rightValIdx: Int,
    refTsAttr: AttributeReference, refValAttr: AttributeReference)
  extends BinaryNode {

  override def output: Seq[Attribute] = left.output ++ Seq(refTsAttr, refValAttr)

  // every child column is consumed positionally by the exec — declare
  // them referenced so ColumnPruning doesn't project them away
  override def references: AttributeSet =
    AttributeSet(left.output ++ right.output)

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

case class AsOfJoinExec(
    left: SparkPlan, right: SparkPlan,
    leftTimeIdx: Int, rightTimeIdx: Int, rightValIdx: Int,
    output: Seq[Attribute])
  extends BinaryExecNode {

  override protected def doExecute(): RDD[InternalRow] = {
    // reference side: small by contract — collect sorted once (the
    // planner would wrap a big side in its own exchange; this operator
    // targets the macro-series-sized case, reference §1.1 grains)
    val maxRef = math.min(org.apache.spark.sql.internal.SQLConf.get
      .getConfString(AsOfJoinPlan.MaxRefRowsKey,
        AsOfJoinPlan.MaxRefRowsDefault.toString).toLong,
      Int.MaxValue - 8L).toInt
    // take(maxRef+1) scans partitions incrementally and aborts BEFORE
    // materializing an oversized side on the driver (collect-then-check
    // would OOM first, defeating the guard); within bound, take returns
    // every row
    val taken: Array[(Long, Double)] = right.execute()
      .map(r => (r.getLong(rightTimeIdx), r.getDouble(rightValIdx)))
      .take(maxRef + 1)
    require(taken.length <= maxRef,
      s"as-of reference side exceeds the ${AsOfJoinPlan.MaxRefRowsKey} " +
        s"broadcast contract ($maxRef rows); " +
        "use AsOfJoin.unionWindowAsOf with a bucketing key instead")
    // full tuple sort: among duplicate timestamps the binary search's
    // last-match lands on the highest value — the same tie choice as
    // the window strategies
    val ref = taken.sorted
    val refBc = sparkContext.broadcast(ref)
    val leftOutput = left.output
    val outAttrs = output
    left.execute().mapPartitions { iter =>
      val proj = UnsafeProjection.create(outAttrs.map(_.dataType).toArray)
      val s = refBc.value
      val row = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        outAttrs.length)
      iter.flatMap { in =>
        val t = in.getLong(leftTimeIdx)
        var lo = 0; var hi = s.length - 1; var ans = -1
        while (lo <= hi) {
          val mid = (lo + hi) >>> 1
          if (s(mid)._1 <= t) { ans = mid; lo = mid + 1 } else hi = mid - 1
        }
        if (ans < 0) None
        else {
          var i = 0
          while (i < leftOutput.length) {
            row.update(i, in.get(i, leftOutput(i).dataType))
            i += 1
          }
          row.update(leftOutput.length, s(ans)._1)
          row.update(leftOutput.length + 1, s(ans)._2)
          Some(proj(row).copy(): InternalRow)
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}
