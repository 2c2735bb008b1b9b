package graft.plans

import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count, HyperLogLogPlusPlus}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule

/** Opt-in optimizer rewrite: exact `COUNT(DISTINCT x)` → HyperLogLog++
  * (SURVEY §4 — the custom `Rule[LogicalPlan]` tier of the extension
  * surface, alongside the function and strategy injections).
  *
  * Why a RULE and not "just call approx_count_distinct": at 100 TB the
  * expensive aggregate usually arrives in SQL text the engine does not
  * author (dashboards, ad-hoc users). Exact distinct over a high-
  * cardinality key is the classic two-Exchange killer — every distinct
  * value shuffles. With
  *
  *   spark.conf.set("spark.graft.approxDistinct.enabled", "true")
  *
  * a session opts its WHOLE workload into the sketch (map-side-
  * combined, one Exchange of fixed-size buffers, standard ±rsd error),
  * without touching query text. Default OFF: exactness is the
  * engine's default contract (every oracle query runs with the flag
  * unset). Multi-argument COUNT(DISTINCT a, b) and filtered
  * aggregates are left untouched — only the unambiguous single-column
  * form rewrites, and the result type (long) is unchanged so no
  * downstream re-resolution is needed. */
object ApproxDistinctRewrite extends Rule[LogicalPlan] {

  private val flag = "spark.graft.approxDistinct.enabled"

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (conf.getConfString(flag, "false") != "true") plan
    else plan.transformUp {
      case agg: Aggregate =>
        agg.transformExpressions {
          case ae @ AggregateExpression(Count(children), _, true, None, _)
              if children.length == 1 =>
            // resultId is preserved by copy(), so references to the
            // aggregate's output stay valid; HLL++ returns long like
            // Count
            ae.copy(aggregateFunction = HyperLogLogPlusPlus(children.head),
              isDistinct = false)
        }
    }
}
