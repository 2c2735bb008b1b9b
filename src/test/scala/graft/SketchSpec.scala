package graft

import graft.plans.SpaceSavingAgg
import org.apache.spark.sql.functions._

/** SpaceSaving heavy-hitters guarantees (the TypedImperativeAggregate
  * tier): estimates over-count by at most `err`, never under-count,
  * and any term with frequency > n/k must survive the summary. */
class SketchSpec extends SparkSpecBase {
  import spark.implicits._

  test("exact when distinct terms fit the summary") {
    val df = Seq.fill(5)("a") ++ Seq.fill(3)("b") ++ Seq.fill(2)("c")
    val got = df.toDF("t")
      .agg(SpaceSavingAgg.approxTopTerms(col("t"), 10).as("top"))
      .select(explode(col("top")).as("e"))
      .select(col("e.term"), col("e.count_est"), col("e.err"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.toList == List(("a", 5L, 0L), ("b", 3L, 0L), ("c", 2L, 0L)))
  }

  test("planted heavy hitter survives a k-bounded summary with valid bounds") {
    // 300 "hot" + 700 singleton-ish tail terms, k=20 → hot freq ≫ n/k
    val rows = (Seq.fill(300)("hot") ++
      (0 until 700).map(i => s"tail_${i % 350}")).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }
    val df = rows.toDF("id", "t").repartition(7, col("id"))
    val top = df.agg(SpaceSavingAgg.approxTopTerms(col("t"), 20).as("top"))
      .select(explode(col("top")).as("e"))
      .select(col("e.term"), col("e.count_est"), col("e.err"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(top.length <= 20)
    val hot = top.find(_._1 == "hot")
    assert(hot.isDefined, s"heavy hitter evicted; summary: ${top.take(5).toList}")
    val (_, est, err) = hot.get
    assert(est >= 300, s"under-count: $est < 300 (SpaceSaving never undercounts)")
    assert(est - err <= 300, s"lower bound ${est - err} above true 300")
  }

  test("merge offsets terms missing from a full summary (mergeable summaries)") {
    // partition A (k=2) sees x,x,y,y,z — x gets evicted by z's arrival;
    // partition B sees one more x. A plain union-merge reports x as 1
    // (undercount: true total is 3); the Agarwal et al. merge offsets
    // the absent term by A's minimum count and keeps the bounds valid.
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.BoundReference
    import org.apache.spark.sql.types.StringType
    import org.apache.spark.unsafe.types.UTF8String
    val agg = SpaceSavingAgg(BoundReference(0, StringType, nullable = true), 2)
    def row(t: String) = InternalRow(UTF8String.fromString(t))
    val a = agg.createAggregationBuffer()
    Seq("x", "x", "y", "y", "z").foreach(t => agg.update(a, row(t)))
    assert(!a.contains("x"), "precondition: x must have been evicted from A")
    val b = agg.createAggregationBuffer()
    agg.update(b, row("x"))
    val merged = agg.merge(a, b)
    assert(merged.size <= 2)
    val (cx, ex) = merged("x")
    assert(cx >= 3, s"x undercounted after merge: est $cx < true 3")
    assert(cx - ex <= 3, s"x lower bound ${cx - ex} above true 3")
  }

  test("per-group aggregation: each group keeps its own summary") {
    val df = (Seq.fill(50)(("g1", "x")) ++ Seq.fill(50)(("g2", "y")))
      .toDF("g", "t")
    val got = df.groupBy(col("g"))
      .agg(SpaceSavingAgg.approxTopTerms(col("t"), 5).as("top"))
      .select(col("g"), element_at(col("top"), 1).getField("term").as("t0"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got == Map("g1" -> "x", "g2" -> "y"))
  }

  test("KMV: exact below k, bounded error above, duplicates invisible") {
    import graft.operators.Kmv
    // group "small" has 10 distinct values (< k=16) → exact count;
    // group "big" has 5000 distinct → estimate within 60% (k=16 has
    // ~1/sqrt(14) ≈ 27% stddev)
    val rows = (1 to 10).map(i => ("small", i.toLong)) ++
      (1 to 10).map(i => ("small", i.toLong)) ++ // dups change nothing
      (1 to 5000).map(i => ("big", i.toLong))
    val df = rows.toDF("g", "v")
    val est = Kmv.estimate(Kmv.sketch(df, Seq("g"), "v", 16), 16)
      .collect().map(r => r.getString(0) -> r.getAs[Double]("est")).toMap
    assert(est("small") == 10.0)
    assert(est("big") > 2000 && est("big") < 8000, s"est=${est("big")}")
  }

  test("KMV: merged sketch equals the sketch of the concatenated data") {
    import graft.operators.Kmv
    val df = (1 to 3000).map(i => (i % 12 + 1, i.toLong)).toDF("m", "v")
      .withColumn("y", lit(2024))
    val monthly = Kmv.sketch(df, Seq("y", "m"), "v", 32)
    val merged = Kmv.merge(monthly, Seq("y"), 32)
      .select(col("y"), col("kmins"))
    val direct = Kmv.sketch(df, Seq("y"), "v", 32)
      .select(col("y"), col("kmins"))
    assertBagEqual(merged, direct)
  }

  test("CMS: never undercounts; exact on a collision-free grid") {
    import graft.operators.CountMin
    // 40 distinct keys on a 4×4096 grid: collisions are ~impossible,
    // so every estimate must equal the true count; on a 4×8 grid they
    // are certain, and the guarantee degrades to est >= exact only.
    val rows = (1 to 1000).map(i => i.toLong % 40)
    val df = rows.toDF("v")
    val truth = rows.groupBy(identity).map { case (k, g) => k -> g.size.toLong }
    val probe = (0L until 40L).toDF("v")
    for ((w, exactExpected) <- Seq((4096, true), (8, false))) {
      val cells = CountMin.sketch(df, Seq.empty, "v", 4, w)
      val est = CountMin.pointEstimate(cells, probe, "v", 4, w)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      truth.foreach { case (k, n) =>
        assert(est(k) >= n, s"w=$w key $k undercounted: ${est(k)} < $n")
        if (exactExpected)
          assert(est(k) == n, s"w=$w key $k: ${est(k)} != $n on a wide grid")
      }
    }
  }

  test("CMS: merged monthly cells equal the directly-built global grid") {
    import graft.operators.CountMin
    val df = (1 to 3000).map(i => (i % 12 + 1, i.toLong % 100))
      .toDF("m", "v").repartition(7, col("v"))
    val monthly = CountMin.sketch(df, Seq("m"), "v", 4, 64)
    val merged = CountMin.merge(monthly, Seq.empty)
    val direct = CountMin.sketch(df, Seq.empty, "v", 4, 64)
    assertBagEqual(merged, direct)
  }

  test("CMS: absent keys estimate zero unless every row collides") {
    import graft.operators.CountMin
    val cells = CountMin.sketch((1L to 50L).toDF("v"), Seq.empty, "v", 4, 4096)
    val est = CountMin.pointEstimate(
        cells, Seq(9999L, 12345L).toDF("v"), "v", 4, 4096)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(est.values.forall(_ == 0L),
      s"never-inserted keys should read 0 on a wide grid: $est")
  }

  test("quantile sketch: per-group fold equals the direct global " +
      "sketch, whatever the grouping or partitioning") {
    import graft.operators.QuantileSketch
    // skewed groups: one group holds 80% of the keys
    val rows = (1L to 1000L).map(i =>
      (i, if (i <= 800) "hot" else s"g${i % 7}", (i * 37 % 991).toDouble))
    val df = rows.toDF("key", "grp", "v")
    val direct = QuantileSketch.sketch(df, Seq.empty, "key", "v", 50)
      .collect().map(r => (r.getLong(1), r.getDouble(2))).toSet
    for (parts <- Seq(1, 13)) {
      val part = df.repartition(parts, col("key"))
      val folded = QuantileSketch.mergeToGlobal(
          QuantileSketch.sketch(part, Seq("grp"), "key", "v", 50), 50)
        .collect().map(r => (r.getLong(1), r.getDouble(2))).toSet
      assert(folded == direct,
        s"fold lost sketch rows at $parts partitions")
    }
  }

  test("quantile sketch: estimates hit the sample's own type-1 ranks " +
      "and land within the k-sample rank bound of exact") {
    import graft.operators.QuantileSketch
    val vals = (1L to 5000L).map(i => (i, i.toDouble)) // value = rank
    val sk = QuantileSketch.sketch(vals.toDF("key", "v"), Seq.empty,
      "key", "v", 400)
    val sample = sk.collect().map(_.getDouble(2)).sorted
    val est = QuantileSketch.estimate(sk, Seq(0.25, 0.5, 0.9))
      .collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    for ((p, e) <- est) {
      // definitionally the sample's ceil(p·n)-th order statistic
      assert(e == sample(math.max(1, math.ceil(p * sample.length).toInt) - 1))
      // and a uniform-400-sample's rank error: generous 4/sqrt(k) bound
      assert(math.abs(e / 5000.0 - p) < 4.0 / math.sqrt(400.0),
        s"p=$p estimate $e implies rank error ${math.abs(e / 5000.0 - p)}")
    }
  }

  test("approx percentile transform: within 4/sqrt(k) of the exact " +
      "CDF for every row, with no shuffle of the scored frame") {
    import graft.operators.QuantileSketch
    val k = 200
    val df = (1L to 4000L).map(i => (i, (i * 131 % 4001).toDouble))
      .toDF("key", "v")
    val sk = QuantileSketch.sketch(df, Seq.empty, "key", "v", k)
    val scored = QuantileSketch.approxPercentile(df, sk, "v")
    val n = 4000.0
    val bad = scored
      .withColumn("exact_pct",
        (col("v") / lit(n))) // v is a permutation of 1..4000: CDF = v/n
      .filter(abs(col("est_pct") - col("exact_pct")) >=
        lit(4.0 / math.sqrt(k)))
      .count()
    assert(bad == 0, s"$bad rows breach the 4/sqrt(k) rank-error bound")
    // plan: the scored frame takes NO exchange beyond the sample's own
    // single-row aggregate — no sort, no hash partitioning of df
    val plan = scored.queryExecution.executedPlan.toString
    assert(!plan.contains("SortExec") && !plan.contains("Sort ["),
      s"approx percentile sorted the scored frame:\n$plan")
  }
}
