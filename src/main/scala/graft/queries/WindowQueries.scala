package graft.queries

import graft.{QuerySpec, Tables}
import graft.functions.Exact
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Window-function layer (SURVEY §2.5 — absent in the reference, which
  * stores OHLCV facts but never computes the consumer analytics its
  * README promises (`/root/reference/README.md:4`); these are the
  * canonical stock-style rolling queries over the fact table).
  *
  * Determinism rules: every window ORDER BY ends in a unique key, and
  * rolling means are computed as exact-decimal rolling SUM divided by
  * rolling COUNT in double space (window frames are sequential per
  * partition, but the decimal rule keeps Spark and the oracle
  * bit-identical regardless).
  */
object WindowQueries {

  /** q20: row-frame family — the 30-day moving average of SURVEY §2.5
    * (bounded sliding frame) AND the running total (unbounded-preceding
    * frame, formerly its own q22 — merged round 3: same table,
    * partition key, and ordering, so two registry slots bought one
    * shuffle's worth of coverage; as two measures over one window spec
    * both frame kinds still verify, in one pass). */
  val q20MovingAvg: QuerySpec = QuerySpec(
    "q20_moving_avg",
    """SELECT l_suppkey, l_orderkey, l_linenumber,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) OVER w AS DOUBLE)
      |    / CAST(COUNT(*) OVER w AS DOUBLE) AS mov_avg_price,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) OVER cum AS DOUBLE)
      |    AS cum_qty
      |FROM lineitem
      |WHERE l_suppkey <= 3
      |WINDOW w AS (PARTITION BY l_suppkey
      |  ORDER BY l_shipdate, l_orderkey, l_linenumber
      |  ROWS BETWEEN 6 PRECEDING AND CURRENT ROW),
      |cum AS (PARTITION BY l_suppkey
      |  ORDER BY l_shipdate, l_orderkey, l_linenumber
      |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |ORDER BY l_suppkey, l_orderkey, l_linenumber""".stripMargin) { (s, dir) =>
    val order = Seq(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
    val w = Window.partitionBy(col("l_suppkey")).orderBy(order: _*)
      .rowsBetween(-6, Window.currentRow)
    val cum = Window.partitionBy(col("l_suppkey")).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.lineitem(s, dir)
      .filter(col("l_suppkey") <= 3)
      .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
        (sum(col("l_extendedprice").cast("decimal(18,4)")).over(w).cast("double")
          / count(lit(1)).over(w).cast("double")).as("mov_avg_price"),
        sum(col("l_quantity").cast("decimal(18,4)")).over(cum).cast("double")
          .as("cum_qty"))
      .orderBy(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"))
  }

  /** q21: lag-based deltas — the daily-returns query of SURVEY §2.5.
    * Per-row double arithmetic on lag pairs is engine-deterministic. */
  val q21OrderDeltas: QuerySpec = QuerySpec(
    "q21_order_deltas",
    """SELECT o_custkey, o_orderkey, o_totalprice,
      |  o_totalprice - lag(o_totalprice) OVER w AS delta,
      |  o_totalprice / lag(o_totalprice) OVER w - 1 AS pct_change
      |FROM orders
      |WHERE o_custkey <= 30
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
      |ORDER BY o_custkey, o_orderkey""".stripMargin) { (s, dir) =>
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    Tables.orders(s, dir)
      .filter(col("o_custkey") <= 30)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
        (col("o_totalprice") - lag(col("o_totalprice"), 1).over(w)).as("delta"),
        (col("o_totalprice") / lag(col("o_totalprice"), 1).over(w) - 1)
          .as("pct_change"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  /** q23: ranking family (rank / dense_rank) — price ranking within
    * brand, keeping only the podium. */
  val q23RankParts: QuerySpec = QuerySpec(
    "q23_rank_parts",
    """SELECT p_brand, p_partkey, p_retailprice, rnk, drnk FROM (
      |  SELECT p_brand, p_partkey, p_retailprice,
      |    rank() OVER w AS rnk, dense_rank() OVER w AS drnk
      |  FROM part
      |  WINDOW w AS (PARTITION BY p_brand ORDER BY p_retailprice DESC, p_partkey))
      |WHERE rnk <= 3
      |ORDER BY p_brand, rnk, p_partkey""".stripMargin) { (s, dir) =>
    val w = Window.partitionBy(col("p_brand"))
      .orderBy(col("p_retailprice").desc, col("p_partkey"))
    Tables.part(s, dir)
      .select(col("p_brand"), col("p_partkey"), col("p_retailprice"),
        rank().over(w).as("rnk"), dense_rank().over(w).as("drnk"))
      .filter(col("rnk") <= 3)
      .orderBy(col("p_brand"), col("rnk"), col("p_partkey"))
  }

  /** q24: ntile quartiles over account balance per segment, then
    * per-tile stats — distribution summary without a global sort. */
  val q24BalanceQuartiles: QuerySpec = QuerySpec(
    "q24_balance_quartiles",
    s"""SELECT c_mktsegment, tile, COUNT(*) AS n,
       |  ${Exact.sqlSum("c_acctbal")} AS total_bal
       |FROM (
       |  SELECT c_mktsegment, c_acctbal,
       |    ntile(4) OVER (PARTITION BY c_mktsegment
       |      ORDER BY c_acctbal, c_custkey) AS tile
       |  FROM customer)
       |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, dir) =>
    val w = Window.partitionBy(col("c_mktsegment"))
      .orderBy(col("c_acctbal"), col("c_custkey"))
    Tables.customer(s, dir)
      .select(col("c_mktsegment"), col("c_acctbal"),
        ntile(4).over(w).as("tile"))
      .groupBy(col("c_mktsegment"), col("tile"))
      .agg(count(lit(1)).as("n"), Exact.dsum(col("c_acctbal")).as("total_bal"))
      .orderBy(col("c_mktsegment"), col("tile"))
  }

  /** q25: first/last value over an unbounded frame — each order's
    * price against its customer's first and latest order price. */
  val q25FirstLast: QuerySpec = QuerySpec(
    "q25_first_last",
    """SELECT o_custkey, o_orderkey,
      |  first_value(o_totalprice) OVER w AS first_price,
      |  last_value(o_totalprice) OVER w AS last_price
      |FROM orders
      |WHERE o_custkey <= 30
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
      |ORDER BY o_custkey, o_orderkey""".stripMargin) { (s, dir) =>
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    Tables.orders(s, dir)
      .filter(col("o_custkey") <= 30)
      .select(col("o_custkey"), col("o_orderkey"),
        first(col("o_totalprice")).over(w).as("first_price"),
        last(col("o_totalprice")).over(w).as("last_price"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  /** q53: time-based RANGE frame — the true "30-day moving spend"
    * (row frames approximate it only under uniform spacing). Both
    * engines order by epoch-microseconds and use the same numeric
    * range, so frame contents are identical. */
  val q53RangeWindow: QuerySpec = {
    val thirtyDaysUs = 30L * 86400 * 1000000
    QuerySpec(
      "q53_range_window",
      s"""SELECT o_custkey, o_orderkey,
         |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) OVER w AS DOUBLE)
         |    AS spend_30d,
         |  CAST(COUNT(*) OVER w AS BIGINT) AS n_30d
         |FROM orders
         |WHERE o_custkey <= 40
         |WINDOW w AS (PARTITION BY o_custkey ORDER BY epoch_us(o_orderdate)
         |  RANGE BETWEEN $thirtyDaysUs PRECEDING AND CURRENT ROW)
         |ORDER BY o_custkey, o_orderkey""".stripMargin) { (s, dir) =>
      // parquet timestamps surface as TIMESTAMP_NTZ; the UTC-pinned
      // session makes the NTZ→LTZ cast micro-identical to epoch_us
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(unix_micros(col("o_orderdate").cast("timestamp")))
        .rangeBetween(-thirtyDaysUs, Window.currentRow)
      Tables.orders(s, dir)
        .filter(col("o_custkey") <= 40)
        .select(col("o_custkey"), col("o_orderkey"),
          sum(col("o_totalprice").cast("decimal(18,4)")).over(w).cast("double")
            .as("spend_30d"),
          count(lit(1)).over(w).cast("long").as("n_30d"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    }
  }

  /** q54: GROUPING SETS — a single ANSI SQL text executed verbatim by
    * BOTH engines (Spark via the registered-view SQL surface, DuckDB
    * as the oracle): the dialects' common subset is itself part of
    * the engine's contract. */
  val q54GroupingSets: QuerySpec = {
    val sql =
      """SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS INTEGER) AS year,
        |  o_orderstatus, COUNT(*) AS n
        |FROM orders
        |GROUP BY GROUPING SETS (
        |  (CAST(EXTRACT(YEAR FROM o_orderdate) AS INTEGER), o_orderstatus),
        |  (CAST(EXTRACT(YEAR FROM o_orderdate) AS INTEGER)), ())
        |ORDER BY year ASC NULLS FIRST, o_orderstatus ASC NULLS FIRST""".stripMargin
    QuerySpec("q54_grouping_sets", sql) { (s, dir) =>
      graft.Tables.registerViews(s, dir)
      s.sql(sql)
    }
  }

  /** q58: distribution window functions — percent_rank / cume_dist of
    * each supplier's account balance within its nation. Both are
    * rank-ratio definitions, identical across engines; ties broken by
    * the unique key in the window order. */
  val q58Distribution: QuerySpec = QuerySpec(
    "q58_distribution",
    """SELECT s_nationkey, s_suppkey, s_acctbal,
      |  percent_rank() OVER w AS pr,
      |  cume_dist() OVER w AS cd
      |FROM supplier
      |WINDOW w AS (PARTITION BY s_nationkey ORDER BY s_acctbal, s_suppkey)
      |ORDER BY s_nationkey, s_suppkey""".stripMargin) { (s, dir) =>
    val w = Window.partitionBy(col("s_nationkey"))
      .orderBy(col("s_acctbal"), col("s_suppkey"))
    Tables.supplier(s, dir)
      .select(col("s_nationkey"), col("s_suppkey"), col("s_acctbal"),
        percent_rank().over(w).as("pr"),
        cume_dist().over(w).as("cd"))
      .orderBy(col("s_nationkey"), col("s_suppkey"))
  }

  val specs: Seq[QuerySpec] = Seq(
    q20MovingAvg, q21OrderDeltas, q23RankParts,
    q24BalanceQuartiles, q25FirstLast, q53RangeWindow, q54GroupingSets,
    q58Distribution)
}
