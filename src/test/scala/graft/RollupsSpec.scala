package graft

import graft.operators.Rollups
import org.apache.spark.sql.functions._

/** The partial-aggregate contract: answers from partials are EXACTLY
  * the answers from raw facts, at any coarser grain, and partials
  * merge — a late day folds in by re-aggregating state, never facts. */
class RollupsSpec extends SparkSpecBase {

  private def orders = Tables.orders(spark, sf)

  test("yearly rollup from daily partials equals the direct aggregate") {
    val daily = Rollups.partials(orders, "o_orderdate", "day",
      Seq("o_orderpriority"), "o_totalprice")
    val fromPartials = Rollups.reaggregate(daily, "year",
        Seq("o_orderpriority"))
      .select(col("bucket"), col("o_orderpriority"), col("pcount"),
        col("psum").cast("double").as("total"), col("pmin"), col("pmax"))
    val direct = orders
      .groupBy(date_trunc("year", col("o_orderdate")).as("bucket"),
        col("o_orderpriority"))
      .agg(count(col("o_totalprice")).as("pcount"),
        sum(col("o_totalprice").cast("decimal(18,4)")).cast("double")
          .as("total"),
        min(col("o_totalprice")).as("pmin"),
        max(col("o_totalprice")).as("pmax"))
      .select(col("bucket"), col("o_orderpriority"), col("pcount"),
        col("total"), col("pmin"), col("pmax"))
    assertBagEqual(fromPartials, direct)
  }

  test("HLL partials: distinct-over-month from day sketches, within error") {
    val daily = Rollups.partialsWithDistinct(orders, "o_orderdate", "day",
      Seq("o_orderpriority"), "o_custkey")
    val monthly = Rollups.reaggregateWithDistinct(daily, "month",
        Seq("o_orderpriority"))
      .select(col("bucket"), col("o_orderpriority"),
        Rollups.distinctEstimate(col("pdistinct")).as("est"))
    val exact = orders
      .groupBy(date_trunc("month", col("o_orderdate")).as("bucket"),
        col("o_orderpriority"))
      .agg(countDistinct(col("o_custkey")).as("exact"))
    val joined = monthly.join(exact, Seq("bucket", "o_orderpriority"))
      .select(col("est"), col("exact")).collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      val (est, ex) = (r.getLong(0), r.getLong(1))
      // default lgK=12 HLL: ~1.6% standard error; allow 5 sigma + slack
      assert(math.abs(est - ex) <= math.max(3, 0.1 * ex),
        s"sketch estimate $est too far from exact $ex")
    }
  }

  test("partials merge: a late day's state folds in by re-aggregation") {
    val lateDay = orders.agg(max(col("o_orderdate"))).head().get(0)
    val early = orders.filter(col("o_orderdate") < lit(lateDay))
    val late = orders.filter(col("o_orderdate") >= lit(lateDay))
    assert(late.count() > 0, "fixture needs a non-empty late slice")
    val merged = Rollups.reaggregate(
      Rollups.partials(early, "o_orderdate", "day", Nil, "o_totalprice")
        .unionByName(
          Rollups.partials(late, "o_orderdate", "day", Nil, "o_totalprice")),
      "day", Nil)
    val full = Rollups.partials(orders, "o_orderdate", "day", Nil,
      "o_totalprice")
    assertBagEqual(merged, full)
  }

  test("joinDelta is exhaustive and disjoint vs the full recompute") {
    import org.apache.spark.sql.functions._
    val o = Tables.orders(spark, sf)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
    val c = Tables.customer(spark, sf)
      .select(col("c_custkey").as("o_custkey"), col("c_mktsegment"))
    val (oBase, oDelta) =
      (o.filter(col("o_orderkey") % 3 =!= 0), o.filter(col("o_orderkey") % 3 === 0))
    val (cBase, cDelta) =
      (c.filter(col("o_custkey") % 7 =!= 0), c.filter(col("o_custkey") % 7 === 0))
    val incremental = oBase.join(cBase, Seq("o_custkey"))
      .unionByName(Rollups.joinDelta(oBase, oDelta, cBase, cDelta,
        Seq("o_custkey")))
    val full = o.join(c, Seq("o_custkey"))
    // bag equality = every pair produced exactly once: exhaustive
    // (nothing missing) AND disjoint (nothing double-counted)
    assertBagEqual(incremental, full)
  }
}
