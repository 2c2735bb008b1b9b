package graft

import org.apache.spark.sql.functions._

/** The engine's SQL surface: registered views + spark.sql give the
  * same answers as the Column DSL (the reference's only query language
  * was SQL text, S5/K3 sites — both entries must agree). */
class SqlSurfaceSpec extends SparkSpecBase {

  test("spark.sql over registered views matches the DSL plan") {
    Tables.registerViews(spark, sf)
    val sqlResult = spark.sql(
      """SELECT l_returnflag, COUNT(*) AS n
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE o_orderstatus = 'F'
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)
    val dsl = Tables.lineitem(spark, sf)
      .join(Tables.orders(spark, sf).filter(col("o_orderstatus") === "F"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_returnflag")).agg(count(lit(1)).as("n"))
      .orderBy(col("l_returnflag"))
    assertBagEqual(sqlResult, dsl)
  }

  test("events view exposes micro-truncated timestamps") {
    Tables.registerViews(spark, sf)
    val n = spark.sql(
      "SELECT COUNT(*) FROM events WHERE ts >= TIMESTAMP '2024-01-01 00:00:00'")
      .head.getLong(0)
    assert(n == Tables.events(spark, sf).count())
  }
}
