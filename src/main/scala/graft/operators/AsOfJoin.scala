package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join (SURVEY §2.3 ★ — the natural finance-domain
  * extension: align each fact row with the latest reference-series
  * observation at or before its timestamp, e.g. OHLCV rows against a
  * macro series, `weekly_dag.py`'s monthly/quarterly tables).
  *
  * Two physical strategies, chosen by the caller:
  *
  *  - `broadcastAsOf`: the reference series is small (the reference
  *    repo's macro tables are ~10³ rows) — collect it sorted to the
  *    driver, broadcast, binary-search per probe row. ZERO shuffles:
  *    scales to any probe size at 100 TB because the probe side is
  *    embarrassingly parallel.
  *  - `unionWindowAsOf`: both sides large — union tagged rows and take
  *    a running last over a single time-ordered window. Exact, pure
  *    Column, but the unpartitioned window serializes; use only when
  *    the reference side is too big to broadcast AND a bucketing key
  *    exists (pass `partitionCols` to window within buckets).
  */
object AsOfJoin {

  /** Small-reference path. `ref` must have exactly (refTimeCol:
    * timestamp, refValCol: double); emits probe columns + ref_ts +
    * ref_val, inner semantics (probes before the first ref row drop).
    *
    * Since round 2 this routes through the native plan node
    * (`nativeAsOf` / graft.plans.AsOfJoinPlan): the former Scala-UDF
    * strategy (`udfAsOf`) boxed an Option per probe row, escaped
    * codegen, and blocked predicate movement through its `_hit`
    * column — the plan-integrated exec produces the identical answer
    * (AsOfSpec asserts 3-way equivalence) without any of that. */
  def broadcastAsOf(spark: SparkSession, probe: DataFrame, ref: DataFrame,
                    probeTimeCol: String, refTimeCol: String,
                    refValCol: String): DataFrame =
    nativeAsOf(spark, probe, ref, probeTimeCol, refTimeCol, refValCol)

  /** UDF strategy, kept ONLY as a spec-side cross-check for the native
    * node (never on a query path: boxed per-row Option, no codegen). */
  private[graft] def udfAsOf(spark: SparkSession, probe: DataFrame, ref: DataFrame,
                             probeTimeCol: String, refTimeCol: String,
                             refValCol: String): DataFrame = {
    // sorted (epochMicros, value) pairs; ~series-sized, driver-safe.
    // limit(maxRef+1) bounds what can reach the driver BEFORE the
    // collect (a collect-then-check would OOM first); within bound the
    // limit is a no-op and every row arrives.
    val maxRef = math.min(graft.plans.AsOfJoinPlan.maxRefRows(spark),
      Int.MaxValue - 8L).toInt
    val taken = ref
      .select(col(refTimeCol).cast("timestamp"), col(refValCol).cast("double"))
      .limit(maxRef + 1)
      .collect()
    require(taken.length <= maxRef,
      s"as-of reference side exceeds the spark.graft.asof.maxRefRows " +
        s"broadcast contract ($maxRef rows); use unionWindowAsOf " +
        "with a bucketing key for large references")
    val series: Array[(Long, Double)] = taken
      .map(r => (r.getTimestamp(0).getTime * 1000 +
        r.getTimestamp(0).getNanos / 1000 % 1000, r.getDouble(1)))
      .sorted // tuple order: duplicate-ts ties resolve to highest value
    val bc = spark.sparkContext.broadcast(series)
    val lookup = udf { (micros: Long) =>
      val s = bc.value
      var lo = 0; var hi = s.length - 1; var ans = -1
      while (lo <= hi) {
        val mid = (lo + hi) >>> 1
        if (s(mid)._1 <= micros) { ans = mid; lo = mid + 1 } else hi = mid - 1
      }
      if (ans < 0) None else Some((s(ans)._1, s(ans)._2))
    }
    probe
      .withColumn("_hit", lookup(unix_micros(col(probeTimeCol))))
      .filter(col("_hit").isNotNull)
      .withColumn("ref_ts", timestamp_micros(col("_hit._1")))
      .withColumn("ref_val", col("_hit._2"))
      .drop("_hit")
  }

  /** Plan-integrated path (custom-operator tier (c)): builds the
    * graft.plans.AsOfJoinPlan logical node directly, planned by
    * AsOfStrategy (inject via GraftExtensions, or rely on the
    * session-local strategy registration done here). Same semantics
    * and physical shape as `broadcastAsOf`, but as a first-class plan
    * node visible to Catalyst. `ref` must be (refTimeCol, refValCol)
    * only. */
  def nativeAsOf(spark: SparkSession, probe: DataFrame, ref: DataFrame,
                 probeTimeCol: String, refTimeCol: String,
                 refValCol: String): DataFrame = {
    import org.apache.spark.sql.GraftSqlShim
    if (!spark.experimental.extraStrategies.contains(graft.plans.AsOfStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ graft.plans.AsOfStrategy
    val lp = probe.queryExecution.analyzed
    val rp = ref.select(col(refTimeCol), col(refValCol).cast("double"))
      .queryExecution.analyzed
    val lIdx = lp.output.indexWhere(_.name == probeTimeCol)
    require(lIdx >= 0, s"probe column $probeTimeCol not found")
    GraftSqlShim.ofRows(spark,
      graft.plans.AsOfJoinPlan.create(lp, rp, lIdx, 0, 1,
        rp.output.head.dataType))
  }

  /** Big-big path (the 100 TB shape when NO natural bucketing key
    * exists): range-bucket both sides on the time axis, then run the
    * union-window as-of WITHIN each bucket — the per-bucket sort is
    * bounded by bucket volume, and buckets process in parallel.
    * Correctness across bucket boundaries comes from a carry-forward
    * pass: each bucket's latest ref observation is aggregated to one
    * row (B rows total — metadata-sized), a prefix-window computes
    * every probe bucket's "opening" observation from strictly earlier
    * buckets, and that opening is injected into the bucket as a
    * synthetic ref row (carrying its REAL timestamp, so `ref_ts` is
    * still exact). Probes before the first ref observation anywhere
    * drop, matching the inner as-of contract.
    *
    * `bucket` is a date_trunc unit (e.g. "day", "hour"): pick it so a
    * bucket's rows fit a task — the only single-partition step left is
    * the B-row opening window. */
  def rangeAsOf(probe: DataFrame, ref: DataFrame,
                probeTimeCol: String, refTimeCol: String,
                refValCol: String, bucket: String = "day"): DataFrame = {
    val pb = probe.withColumn("_tb",
      date_trunc(bucket, col(probeTimeCol).cast("timestamp")))
    val rb = ref.select(
      date_trunc(bucket, col(refTimeCol).cast("timestamp")).as("_tb"),
      col(refTimeCol).cast("timestamp").as("_rts"),
      col(refValCol).cast("double").as("_rv"))
    // per-bucket closing observation (max struct → deterministic on
    // duplicate timestamps: highest value wins the tie on both passes)
    val closing = rb.groupBy(col("_tb"))
      .agg(max(struct(col("_rts"), col("_rv"))).as("c"))
      .select(col("_tb"), col("c._rts").as("_ots"), col("c._rv").as("_ov"))
    // opening per probe bucket = latest closing of any STRICTLY earlier
    // bucket: same-bucket closings sort after the probe marker, so the
    // running last never sees them. B rows — the one serial step.
    val probeBuckets = pb.select(col("_tb")).distinct()
      .withColumn("_isP", lit(1))
      .withColumn("_ots", lit(null).cast("timestamp"))
      .withColumn("_ov", lit(null).cast("double"))
    val marked = probeBuckets.unionByName(
      closing.withColumn("_isP", lit(0))
        .select(col("_tb"), col("_isP"), col("_ots"), col("_ov")))
    val w = Window.orderBy(col("_tb"), col("_isP").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val openings = marked
      .withColumn("_bts", last(col("_ots"), ignoreNulls = true).over(w))
      .withColumn("_bv", last(col("_ov"), ignoreNulls = true).over(w))
      .filter(col("_isP") === 1 && col("_bts").isNotNull)
      .select(col("_tb"), col("_bts").as("_rts"), col("_bv").as("_rv"))
    // in-bucket refs ∪ injected openings, then the bucketed window
    val refAug = rb.select(col("_tb"), col("_rts"), col("_rv"))
      .unionByName(openings)
    unionWindowAsOf(pb, refAug, probeTimeCol, "_rts", "_rv",
        partitionCols = Seq("_tb"))
      .drop("_tb")
  }

  /** General path: tagged union + running last over the time order.
    * With `partitionCols` empty this is exact but single-partition;
    * callers at scale supply a bucketing key whose buckets contain
    * both sides (e.g. symbol). */
  def unionWindowAsOf(probe: DataFrame, ref: DataFrame,
                      probeTimeCol: String, refTimeCol: String,
                      refValCol: String,
                      partitionCols: Seq[String] = Nil): DataFrame = {
    val probeCols = probe.columns
    val p = probe.withColumn("_t", col(probeTimeCol).cast("timestamp"))
      .withColumn("_isRef", lit(0))
      .withColumn("_refTs", lit(null).cast("timestamp"))
      .withColumn("_refVal", lit(null).cast("double"))
    val r0 = ref.select(
      (partitionCols.map(col) ++ Seq(
        col(refTimeCol).cast("timestamp").as("_t"),
        lit(1).as("_isRef"),
        col(refTimeCol).cast("timestamp").as("_refTs"),
        col(refValCol).cast("double").as("_refVal"))): _*)
    val rAligned = probeCols.foldLeft(r0) { (acc, c) =>
      if (acc.columns.contains(c)) acc else acc.withColumn(c, lit(null))
    }.select((probeCols.map(col) ++ Seq(col("_t"), col("_isRef"),
      col("_refTs"), col("_refVal"))): _*)
    val unioned = p.select((probeCols.map(col) ++ Seq(col("_t"),
      col("_isRef"), col("_refTs"), col("_refVal"))): _*)
      .unionByName(rAligned)
    // _refVal asc after (_t, _isRef desc): among DUPLICATE ref
    // timestamps the running `last` lands on the highest value —
    // deterministic, and the same choice rangeAsOf's max-struct closing
    // row makes, so the two strategies can never disagree on ties
    val w = Window.partitionBy(partitionCols.map(col): _*)
      .orderBy(col("_t"), col("_isRef").desc, col("_refVal").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .withColumn("ref_ts", last(col("_refTs"), ignoreNulls = true).over(w))
      .withColumn("ref_val", last(col("_refVal"), ignoreNulls = true).over(w))
      .filter(col("_isRef") === 0 && col("ref_ts").isNotNull)
      .drop("_t", "_isRef", "_refTs", "_refVal")
  }
}
