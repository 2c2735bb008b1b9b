package graft

/** Plan-shape regression guards: the scale properties the engine
  * promises (SURVEY §4, README "Scale design") asserted on the actual
  * physical plans, so a future edit that silently reintroduces a
  * broadcast-nested-loop join, loses a pushed filter, or widens a scan
  * fails CI instead of surfacing at 100 TB.
  */
class PlanAuditSpec extends SparkSpecBase {

  private def planOf(name: String): String =
    Queries.byName(name).run(spark, sf).queryExecution.executedPlan.toString

  test("no query plans a BroadcastNestedLoopJoin or CartesianProduct") {
    // a BNL join is only a scale-killer when the broadcast side grows
    // with the data (q37's old theta self-join). These queries broadcast
    // a CONTRACT-BOUNDED side — the ≤16-vector query set (q34) or the
    // ≤numCells centroid set (q52) or a 1-row count (q62) — over a
    // streamed corpus: exactly the plan wanted at scale. Whitelisted.
    val bounded = Set("q34_cosine_topk", "q52_ivf_topk", "q62_tfidf")
    for (q <- Queries.all if !bounded(q.name)) {
      val plan = q.run(spark, sf).queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"),
        s"${q.name} plans a CartesianProduct")
      assert(!plan.contains("BroadcastNestedLoopJoin"),
        s"${q.name} plans a BroadcastNestedLoopJoin — the q37 scale-killer " +
          "pattern; use an equi-join formulation (grid/bucket/band)")
    }
  }

  test("q03 filter is pushed to the parquet scan and the scan is pruned") {
    val plan = planOf("q03_filter_project")
    assert(plan.contains("PushedFilters: [") &&
      !plan.contains("PushedFilters: []"), s"no pushed filters:\n$plan")
    assert(!plan.contains("l_comment"),
      "scan reads l_comment — column pruning regressed")
  }

  test("q04 dimension joins broadcast") {
    assert(planOf("q04_region_revenue").contains("BroadcastHashJoin"))
  }

  test("q08 global top-k is TakeOrderedAndProject, not a global sort") {
    assert(planOf("q08_top_orders").contains("TakeOrderedAndProject"))
  }

  test("as-of queries run on the custom exec node") {
    assert(planOf("q45_asof_join").contains("AsOfJoin"))
    assert(planOf("q56_asof_native").contains("AsOfJoin"))
  }

  test("q37 exact near-dup is grid equi-joined") {
    val plan = planOf("q37_cosine_neardup")
    assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin")
      || plan.contains("BroadcastHashJoin"), s"no equi-join in:\n$plan")
  }
}
