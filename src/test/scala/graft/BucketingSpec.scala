package graft

import graft.operators.Bucketing
import org.apache.spark.sql.functions._

/** The point of bucketing is the ABSENT shuffle: the co-located join
  * over same-bucketed tables must plan with zero Exchange operators
  * and still produce exactly the plain-join answer.
  *
  * At test scale Spark's planner would rather broadcast the tiny side
  * (and auto-disable the bucketed scan it then doesn't need), so the
  * join test pins the at-scale scenario: no broadcast candidates —
  * exactly when bucketing earns its keep.
  */
class BucketingSpec extends SparkSpecBase {

  private def withConf[T](pairs: (String, String)*)(body: => T): T = {
    val saved = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("same-bucketed tables join with zero Exchange and exact results") {
    val o = Tables.orders(spark, sf)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
    val l = Tables.lineitem(spark, sf)
      .select(col("l_orderkey").as("o_orderkey"), col("l_quantity"))
    Bucketing.writeBucketed(o, "b_orders", Seq("o_orderkey"), 4)
    Bucketing.writeBucketed(l, "b_lineitem", Seq("o_orderkey"), 4)
    withConf("spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val joined = Bucketing.cocatedJoin(spark, "b_orders", "b_lineitem",
        Seq("o_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"expected a shuffle-free co-located join, got:\n$plan")
      assert(plan.contains("SortMergeJoin"), s"expected SMJ, got:\n$plan")
      assertBagEqual(joined, o.join(l, Seq("o_orderkey")))
    }
  }

  test("bucket pruning reaches the scan for single-key probes") {
    // a point lookup on the bucket key reads 1 of numBuckets buckets
    withConf(
      "spark.sql.sources.bucketing.autoBucketedScan.enabled" -> "false") {
      val probe = spark.table("b_orders").filter(col("o_orderkey") === 7L)
      val scan = probe.queryExecution.executedPlan.toString
      assert(scan.contains("SelectedBucketsCount: 1 out of 4"),
        s"expected a pruned bucketed scan, got:\n$scan")
      assert(probe.count() ==
        Tables.orders(spark, sf).filter(col("o_orderkey") === 7L).count())
    }
  }
}
