package graft

import graft.operators.RangeJoin
import org.apache.spark.sql.functions._

class RangeJoinSpec extends SparkSpecBase {

  test("bucketed range join equals the naive theta join") {
    val o = Tables.orders(spark, sf)
    val ivals = o.filter(col("o_custkey") <= 15)
      .groupBy(col("o_custkey").as("vip"))
      .agg(min(col("o_orderdate")).as("w_start"),
        (max(col("o_orderdate")) + expr("INTERVAL 1 DAY")).as("w_end"))
    val probe = o.filter(col("o_custkey") > 15)
      .select(col("o_orderkey"), col("o_orderdate"))
    val naive = RangeJoin.naive(probe, ivals, "o_orderdate", "w_start", "w_end")
      .select("o_orderkey", "vip")
    val bucketed = RangeJoin.bucketed(probe, ivals, "o_orderdate",
        "w_start", "w_end")
      .select("o_orderkey", "vip")
    assertBagEqual(naive, bucketed)
    assert(naive.count() > 0)
  }

  test("bucket boundaries: points at interval edges resolve exactly") {
    import spark.implicits._
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val ivals = Seq((1L, ts("2024-01-10 00:00:00"), ts("2024-02-10 00:00:00")))
      .toDF("ival_id", "w_start", "w_end")
    val probe = Seq(
      (1L, ts("2024-01-10 00:00:00")),  // == start → inside
      (2L, ts("2024-02-10 00:00:00")),  // == end → outside (half-open)
      (3L, ts("2024-02-09 23:59:59")))  // just inside
      .toDF("pid", "t")
    val got = RangeJoin.bucketed(probe, ivals, "t", "w_start", "w_end")
      .select("pid").collect().map(_.getLong(0)).toSet
    assert(got == Set(1L, 3L))
  }
}
