package graft

import graft.operators.AsOfJoin
import org.apache.spark.sql.functions._

/** All as-of strategies (native plan node — the default behind
  * broadcastAsOf — the union-window form, and the spec-only UDF
  * cross-check) must agree with each other and with the hand-computed
  * expectation (the DuckDB ASOF JOIN oracle covers the default path
  * again at driver time via q45/q56). */
class AsOfSpec extends SparkSpecBase {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("broadcast and union-window strategies agree on a known case") {
    val probe = Seq(
      (1L, ts("2024-01-01 10:00:00")),
      (2L, ts("2024-01-01 10:05:00")),
      (3L, ts("2024-01-01 09:00:00")),  // before first ref → dropped
      (4L, ts("2024-01-01 11:00:00")))
      .toDF("id", "t")
    val ref = Seq(
      (ts("2024-01-01 09:30:00"), 1.0),
      (ts("2024-01-01 10:00:00"), 2.0),
      (ts("2024-01-01 10:30:00"), 3.0))
      .toDF("rt", "rv")
    val a = AsOfJoin.broadcastAsOf(spark, probe, ref, "t", "rt", "rv")
      .select("id", "ref_ts", "ref_val")
    val b = AsOfJoin.unionWindowAsOf(probe, ref, "t", "rt", "rv")
      .select("id", "ref_ts", "ref_val")
    assertBagEqual(a, b)
    val m = a.collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(m == Map(1L -> 2.0, 2L -> 2.0, 4L -> 3.0)) // exact-tie → ref row 2.0
  }

  test("strategies agree on the events table") {
    val e = Tables.events(spark, sf)
    val probe = e.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("ts"))
    val ref = e.filter(col("event_type") === "error")
      .select(col("ts").as("rt"), col("value").as("rv"))
    val a = AsOfJoin.broadcastAsOf(spark, probe, ref, "ts", "rt", "rv")
      .select("event_id", "ref_ts", "ref_val")
    val b = AsOfJoin.unionWindowAsOf(probe, ref, "ts", "rt", "rv")
      .select("event_id", "ref_ts", "ref_val")
    assertBagEqual(a, b)
  }

  test("custom-plan as-of (LogicalPlan+Strategy+Exec) matches both strategies") {
    val e = Tables.events(spark, sf)
    val probe = e.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("ts"))
    val ref = e.filter(col("event_type") === "error")
      .select(col("ts").as("rt"), col("value").as("rv"))
    val native = AsOfJoin.nativeAsOf(spark, probe, ref, "ts", "rt", "rv")
      .select("event_id", "ref_ts", "ref_val")
    assert(native.queryExecution.executedPlan.toString.contains("AsOfJoin"),
      "expected the custom exec node in the physical plan")
    val baseline = AsOfJoin.udfAsOf(spark, probe, ref, "ts", "rt", "rv")
      .select("event_id", "ref_ts", "ref_val")
    assertBagEqual(native, baseline)
    // and broadcastAsOf IS the native path now
    assert(AsOfJoin.broadcastAsOf(spark, probe, ref, "ts", "rt", "rv")
      .queryExecution.executedPlan.toString.contains("AsOfJoin"))
  }

  test("range-bucketed big-big as-of agrees with the serial strategies") {
    val e = Tables.events(spark, sf)
    val probe = e.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("ts"))
    val ref = e.filter(col("event_type") === "error")
      .select(col("ts").as("rt"), col("value").as("rv"))
    val bucketed = AsOfJoin.rangeAsOf(probe, ref, "ts", "rt", "rv", "day")
      .select("event_id", "ref_ts", "ref_val")
    val serial = AsOfJoin.unionWindowAsOf(probe, ref, "ts", "rt", "rv")
      .select("event_id", "ref_ts", "ref_val")
    assertBagEqual(bucketed, serial)
  }

  test("range-bucketed as-of carries values across empty buckets") {
    // refs only on day 1; probes span days 1-4 → days 2-4 have no
    // in-bucket ref and must inherit day 1's closing observation with
    // its REAL timestamp; the pre-ref probe drops
    val probe = Seq(
      (1L, ts("2024-01-01 05:00:00")),  // before any ref → dropped
      (2L, ts("2024-01-01 12:00:00")),
      (3L, ts("2024-01-02 08:00:00")),  // empty bucket
      (4L, ts("2024-01-04 23:00:00")))  // two empty buckets later
      .toDF("id", "t")
    val ref = Seq(
      (ts("2024-01-01 09:00:00"), 1.0),
      (ts("2024-01-01 11:00:00"), 2.0))
      .toDF("rt", "rv")
    val out = AsOfJoin.rangeAsOf(probe, ref, "t", "rt", "rv", "day")
      .select("id", "ref_ts", "ref_val").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getDouble(2))).toList
      .sortBy(_._1)
    assert(out.map(_._1) == List(2L, 3L, 4L))
    assert(out.map(_._3) == List(2.0, 2.0, 2.0))
    assert(out.forall(_._2 == ts("2024-01-01 11:00:00")))
  }

  test("duplicate reference timestamps resolve identically in every strategy") {
    val probe = Seq((1L, ts("2024-01-01 10:00:00")),
      (2L, ts("2024-01-01 11:00:00"))).toDF("id", "t")
    val ref = Seq((ts("2024-01-01 10:00:00"), 1.0),
      (ts("2024-01-01 10:00:00"), 2.0)).toDF("rt", "rv")
    val strategies = Seq(
      "native" -> AsOfJoin.broadcastAsOf(spark, probe, ref, "t", "rt", "rv"),
      "udf" -> AsOfJoin.udfAsOf(spark, probe, ref, "t", "rt", "rv"),
      "window" -> AsOfJoin.unionWindowAsOf(probe, ref, "t", "rt", "rv"),
      "range" -> AsOfJoin.rangeAsOf(probe, ref, "t", "rt", "rv", "day"))
    strategies.foreach { case (name, df) =>
      val m = df.select("id", "ref_val").collect()
        .map(r => r.getLong(0) -> r.getDouble(1)).toMap
      assert(m == Map(1L -> 2.0, 2L -> 2.0),
        s"strategy $name picked $m — duplicate-ts tie must go to the highest value")
    }
  }

  test("reference side over maxRefRows fails fast instead of broadcasting") {
    val e = Tables.events(spark, sf)
    val probe = e.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("ts"))
    val ref = e.filter(col("event_type") === "error")
      .select(col("ts").as("rt"), col("value").as("rv"))
    spark.conf.set(graft.plans.AsOfJoinPlan.MaxRefRowsKey, "3")
    try {
      val thrown = intercept[Throwable] {
        AsOfJoin.nativeAsOf(spark, probe, ref, "ts", "rt", "rv").count()
      }
      def chain(t: Throwable): Seq[Throwable] =
        Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(10).toSeq
      assert(chain(thrown).exists(c =>
        Option(c.getMessage).exists(_.contains("maxRefRows"))), s"got: $thrown")
      val thrownUdf = intercept[Throwable] {
        AsOfJoin.udfAsOf(spark, probe, ref, "ts", "rt", "rv").count()
      }
      assert(chain(thrownUdf).exists(c =>
        Option(c.getMessage).exists(_.contains("maxRefRows"))))
    } finally spark.conf.unset(graft.plans.AsOfJoinPlan.MaxRefRowsKey)
  }
}
