package graft

import org.apache.spark.sql.functions._

/** Smoke + contract tests over the whole query registry. */
class QueriesSpec extends SparkSpecBase {

  test("registry names are unique and oracle keys are a subset") {
    assert(Queries.all.map(_.name).distinct.size == Queries.all.size)
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  test("entry (flagship) returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  for (q <- Queries.all) {
    test(s"${q.name} executes on sf0.001") {
      val df = q.run(spark, sf)
      assert(df.columns.nonEmpty)
      assert(df.count() >= 0)
    }
  }

  test("q01 aggregates reconcile with raw scan") {
    val r = Queries.byName("q01_pricing_summary").run(spark, sf)
    val total = r.agg(sum(col("count_order"))).head.getLong(0)
    val raw = Tables.lineitem(spark, sf)
      .filter(col("l_shipdate") <= to_timestamp(lit("1998-09-02 00:00:00")))
      .count()
    assert(total == raw)
  }

  test("q19 approx distinct within 5% of exact") {
    Queries.byName("q19_approx_distinct").run(spark, sf).collect().foreach { r =>
      val approx = r.getLong(1); val exact = r.getLong(2)
      assert(math.abs(approx - exact).toDouble / exact <= 0.05,
        s"approx $approx vs exact $exact")
    }
  }

  test("q08 top-k is ordered and bounded") {
    val rows = Queries.byName("q08_top_orders").run(spark, sf).collect()
    assert(rows.length == 25)
    val prices = rows.map(_.getDouble(2))
    assert(prices.zip(prices.tail).forall { case (a, b) => a >= b })
  }
}
