package graft.queries

import graft.{QuerySpec, Tables}
import graft.functions.Exact
import graft.operators.Relational
import org.apache.spark.sql.functions._

/** Relational-core query library (SURVEY §2.2–§2.4, §2.6–§2.7, §2.9).
  * Each spec pairs the Spark plan with its DuckDB oracle SQL.
  */
object RelationalQueries {

  /** q01: grouped rollup over the fact table — the canonical OHLCV-style
    * aggregation SURVEY §2.4 adds over the reference's ingest-grain
    * tables (reference stores, never aggregates: `weekly_dag.py` passim).
    * TPC-H Q1 shape: scan → filter (pushed to parquet) → hash agg with
    * map-side partials → tiny sort.
    */
  val q01PricingSummary: QuerySpec = QuerySpec(
    "q01_pricing_summary",
    s"""SELECT l_returnflag, l_linestatus,
       |  ${Exact.sqlSum("l_quantity")} AS sum_qty,
       |  ${Exact.sqlSum("l_extendedprice")} AS sum_base_price,
       |  ${Exact.sqlSumExact(Exact.sqlRevenue("l_extendedprice", "l_discount"))} AS sum_disc_price,
       |  ${Exact.sqlSumExact(Exact.sqlCharge("l_extendedprice", "l_discount", "l_tax"))} AS sum_charge,
       |  ${Exact.sqlAvg("l_quantity")} AS avg_qty,
       |  COUNT(*) AS count_order
       |FROM lineitem
       |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
       |GROUP BY l_returnflag, l_linestatus
       |ORDER BY l_returnflag, l_linestatus""".stripMargin) { (s, dir) =>
    Tables.lineitem(s, dir)
      .filter(col("l_shipdate") <= to_timestamp(lit("1998-09-02 00:00:00")))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        Exact.dsum(col("l_quantity")).as("sum_qty"),
        Exact.dsum(col("l_extendedprice")).as("sum_base_price"),
        Exact.dsumExact(Exact.revenue(col("l_extendedprice"), col("l_discount")))
          .as("sum_disc_price"),
        Exact.dsumExact(Exact.charge(col("l_extendedprice"), col("l_discount"),
          col("l_tax"))).as("sum_charge"),
        Exact.davg(col("l_quantity")).as("avg_qty"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  /** q02 (flagship): the SURVEY §7.2 minimum slice — entry point 3.2's
    * shape (`weekly_dag.py:366-432`) on warehouse data: join fact to
    * its date spine, derive year/month parts (X1), range-filter (F3,
    * `weekly_dag.py:417`), aggregate, sort (O1). The join shuffles on
    * l_orderkey/o_orderkey; the agg reuses nothing bigger than
    * (year, month) cardinality so AQE coalesces its shuffle.
    */
  val q02MonthlyRollup: QuerySpec = QuerySpec(
    "q02_monthly_rollup",
    s"""SELECT CAST(EXTRACT(year FROM o_orderdate) AS INTEGER) AS year,
       |  CAST(EXTRACT(month FROM o_orderdate) AS INTEGER) AS month,
       |  ${Exact.sqlSumExact(Exact.sqlRevenue("l_extendedprice", "l_discount"))} AS revenue,
       |  COUNT(DISTINCT o_orderkey) AS n_orders,
       |  COUNT(*) AS n_items
       |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
       |WHERE EXTRACT(year FROM o_orderdate) > 1995
       |GROUP BY 1, 2
       |ORDER BY 1, 2""".stripMargin) { (s, dir) =>
    val o = Relational.withDateParts(Tables.orders(s, dir), "o_orderdate")
      .filter(col("year") > 1995)
    val li = Tables.lineitem(s, dir)
    o.join(li, o("o_orderkey") === li("l_orderkey"))
      .groupBy(col("year"), col("month"))
      .agg(
        Exact.dsumExact(Exact.revenue(col("l_extendedprice"), col("l_discount")))
          .as("revenue"),
        countDistinct(col("o_orderkey")).as("n_orders"),
        count(lit(1)).as("n_items"))
      .orderBy(col("year"), col("month"))
  }

  val specs: Seq[QuerySpec] = Seq(q01PricingSummary, q02MonthlyRollup)
}
