package graft

import graft.operators.Sampling
import org.apache.spark.sql.functions._

class SamplingSpec extends SparkSpecBase {

  test("deterministic sample: same rows every run, rate near target") {
    val d = Tables.documents(spark, sf)
    val s1 = Sampling.deterministicSample(d, "doc_id", 300)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val s2 = Sampling.deterministicSample(d.repartition(7), "doc_id", 300)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(s1 == s2, "sample must be invariant to partitioning/re-runs")
    val rate = s1.size.toDouble / d.count()
    assert(rate > 0.2 && rate < 0.4, s"rate $rate far from 0.3")
  }

  test("hashSplit partitions the corpus deterministically, ~80/10/10") {
    val d = Tables.documents(spark, sf)
    val tagged = Sampling.hashSplit(d, "doc_id", "split", 800, 100)
    // a partition: every row tagged exactly once, none lost
    assert(tagged.count() == d.count())
    val byTag = tagged.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byTag.keySet == Set("train", "val", "test"))
    val n = d.count().toDouble
    assert(byTag("train") / n > 0.7 && byTag("train") / n < 0.9)
    // membership is a pure function of the key — partitioning-invariant
    val t1 = tagged.filter(col("split") === "val")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val t2 = Sampling.hashSplit(d.repartition(7), "doc_id", "split", 800, 100)
      .filter(col("split") === "val")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(t1 == t2, "val membership must be invariant to partitioning")
  }

  test("stratified sample honors per-stratum rates") {
    val d = Tables.documents(spark, sf)
    val sampled = Sampling.stratifiedSample(d, "doc_id", "lang",
      Map("en" -> 1000, "zh" -> 0), defaultPermille = 500)
    val byLang = sampled.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = d.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byLang("en") == total("en"))      // 100% stratum
    assert(!byLang.contains("zh"))           // 0% stratum
    val frRate = byLang.getOrElse("fr", 0L).toDouble / total("fr")
    assert(frRate > 0.3 && frRate < 0.7, s"default rate $frRate far from 0.5")
  }

  test("reservoirSample: exact k, partition-invariant, nested") {
    val o = Tables.orders(spark, sf)
    def keys(df: org.apache.spark.sql.DataFrame) =
      df.select("o_orderkey").collect().map(_.getLong(0)).toSet
    val s100 = keys(Sampling.reservoirSample(o, "o_orderkey", 100))
    assert(s100.size == 100, s"got ${s100.size} rows, wanted exactly 100")
    assert(s100 == keys(
      Sampling.reservoirSample(o.repartition(13), "o_orderkey", 100)),
      "sample must be invariant to partitioning")
    // hash-ranked top-k nests: the 100-sample is inside the 200-sample
    assert(s100.subsetOf(keys(Sampling.reservoirSample(o, "o_orderkey", 200))))
    val plan = Sampling.reservoirSample(o, "o_orderkey", 100)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"expected per-partition top-k, got:\n$plan")
  }

  test("reservoirPerGroup: salted prune is lossless — any salts value " +
      "yields the single-window result") {
    val d = Tables.documents(spark, sf)
    def sample(salts: Int) = Sampling.reservoirPerGroup(
        d, Seq("lang"), "doc_id", k = 7, salts = salts)
      .select("lang", "doc_id").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    val unsalted = sample(1)
    // exact per-group cap
    val perGroup = unsalted.groupBy(_._1).view.mapValues(_.size)
    val sizes = d.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    perGroup.foreach { case (g, n) =>
      assert(n == math.min(7L, sizes(g)), s"$g: $n of ${sizes(g)}")
    }
    // the skew shield must never change the draw
    assert(sample(16) == unsalted)
    assert(sample(3) == unsalted)
  }

  test("weightedSample favors heavy weights and stays deterministic") {
    val o = Tables.orders(spark, sf).select(col("o_orderkey"),
      col("o_totalprice")).cache()
    val k = 200
    val s1 = Sampling.weightedSample(o, "o_orderkey", "o_totalprice", k)
      .collect().map(_.getLong(0)).toSet
    assert(s1.size == k)
    assert(s1 == Sampling.weightedSample(o.repartition(11), "o_orderkey",
      "o_totalprice", k).collect().map(_.getLong(0)).toSet)
    // weight-proportional draw: the top price quartile must be heavily
    // overrepresented vs its 25% population share
    val q3 = o.stat.approxQuantile("o_totalprice", Array(0.75), 0.001)(0)
    val topShare = o.filter(col("o_orderkey").isin(s1.toSeq: _*))
      .filter(col("o_totalprice") >= q3).count().toDouble / k
    assert(topShare > 0.4, s"top-quartile share $topShare not > 0.4")
  }

  test("mixtureSample hits per-source budget shares; scarce sources cap") {
    val d = Tables.documents(spark, sf)
      .withColumn("n_tok",
        graft.functions.TextFunctions.tokenCount(col("text")))
      .cache()
    val totals = d.groupBy("lang").agg(sum(col("n_tok")).as("tot"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val weights = Map("en" -> 0.6, "zh" -> 0.4)
    val budget = 2L * totals.values.sum // force en+zh into the 1000‰ cap
    val capped = Sampling.mixtureSample(d, "lang", "doc_id", "n_tok",
      weights, budget)
    // capped sources are taken whole; unweighted languages are absent
    val byLang = capped.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byLang.keySet == Set("en", "zh"))
    val full = d.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byLang("en") == full("en") && byLang("zh") == full("zh"))
    // a tight budget samples at ~the target rate, deterministically
    val tight = Sampling.mixtureSample(d, "lang", "doc_id", "n_tok",
      Map("en" -> 1.0), totals("en") / 2)
    val got = tight.agg(sum(col("n_tok"))).head.getLong(0).toDouble
    assert(got > 0.35 * totals("en") && got < 0.65 * totals("en"),
      s"sampled $got of target ${totals("en") / 2}")
    assert(tight.collect().map(_.getAs[Long]("doc_id")).toSet ==
      Sampling.mixtureSample(d.repartition(7), "lang", "doc_id", "n_tok",
        Map("en" -> 1.0), totals("en") / 2)
        .collect().map(_.getAs[Long]("doc_id")).toSet,
      "sample must be partitioning-invariant")
  }

  test("epochOrder: shard-major total order, epochs decorrelated, stable") {
    import spark.implicits._
    val d = (0L until 300L).toDF("k")
    def order(epoch: Int, df: org.apache.spark.sql.DataFrame) =
      Sampling.epochOrder(df, "k", epoch, shards = 8).collect()
        .map(r => r.getAs[Long]("k") ->
          (r.getAs[Int]("shard"), r.getAs[Long]("ord"))).toMap
    val e1 = order(1, d)
    // every row assigned, (shard, ord) unique, ords dense per shard
    assert(e1.size == 300 && e1.values.toSet.size == 300)
    e1.values.groupBy(_._1).foreach { case (sh, g) =>
      assert(g.map(_._2).toSeq.sorted == (1L to g.size),
        s"shard $sh ords not dense")
    }
    // replay (different partitioning) reproduces the epoch exactly
    assert(order(1, d.repartition(7)) == e1)
    // a different epoch decorrelates: almost every row moves
    val e2 = order(2, d)
    assert(e1.count { case (k, v) => e2(k) == v } < 15,
      "epochs 1 and 2 should share almost no fixed points")
  }

  test("mixtureWaterfill: saturated source taken whole, shortfall " +
      "renormalizes; no-saturation case matches mixtureSample") {
    import spark.implicits._
    import graft.operators.Sampling
    // source a supplies 100 tokens, b supplies 1000
    val df = ((1L to 10L).map(i => ("a", i, 10L)) ++
      (11L to 20L).map(i => ("b", i, 100L))).toDF("src", "id", "n_tok")
    // budget 600 at 500/500: a's share (300) exceeds its supply -> a
    // is taken whole and its 200-token shortfall flows to b
    val perm = Sampling.mixtureWaterfill(df, "src", "id", "n_tok",
        Map("a" -> 500, "b" -> 500), 600L)
      .select(col("src"), col("permille")).distinct()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(perm("a") == 1000L, s"saturated source not taken whole: $perm")
    assert(perm("b") == 500L, // (600 - 100) / 1000
      s"shortfall did not renormalize onto b: $perm")
    // without saturation the cascade is the plain mixture rate
    val wf = Sampling.mixtureWaterfill(df, "src", "id", "n_tok",
      Map("a" -> 500, "b" -> 500), 100L)
    val plain = Sampling.mixtureSample(df, "src", "id", "n_tok",
      Map("a" -> 0.5, "b" -> 0.5), 100L)
    assertBagEqual(wf, plain)
  }

  test("temperatureMixture flattens shares toward the small source") {
    import spark.implicits._
    // source a: 9x the tokens of b. Natural share 90/10; alpha=0.5
    // gives sqrt(9):sqrt(1) = 3:1 = 75/25 — b's permille must exceed
    // its natural-share permille, a's must shrink
    val df = (1 to 900).map(i => (s"a$i", "a", 10L))
      .++((1 to 100).map(i => (s"b$i", "b", 10L)))
      .toDF("id", "src", "n_tok")
    val perm = Sampling.temperatureMixture(df, "src", "id", "n_tok",
        tokenBudget = 4000L, sqrtTimes = 1)
      .select(col("src"), col("permille")).distinct()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // natural: a = 1000*4000*0.9/9000 = 400; b = 1000*4000*0.1/1000 = 400
    // alpha=.5: a = 1000*4000*0.75/9000 = 333; b = 1000*4000*0.25/1000 = 1000
    assert(perm("a") === 333L, s"a: $perm")
    assert(perm("b") === 1000L, s"b: $perm")
  }

  test("temperatureMixture is deterministic under repartitioning and " +
      "broadcasts its per-source frame") {
    val docs = Tables.documents(spark, sf)
      .select(col("lang"), col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_tok"))
    val a = Sampling.temperatureMixture(docs, "lang", "doc_id", "n_tok",
      10000L, 1)
    val b = Sampling.temperatureMixture(docs.repartition(13), "lang",
      "doc_id", "n_tok", 10000L, 1)
    assertBagEqual(a, b)
    val plan = a.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"per-source permille frame is not broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"corpus shuffles against the mixture frame:\n$plan")
  }

  test("poissonWeight: bounded, deterministic, Poisson(1)-shaped mass " +
    "over many keys, decorrelated across replicates") {
    import spark.implicits._
    val keys = (0L until 4000L).toDF("k")
    val w = keys.select(col("k"),
      Sampling.poissonWeight(col("k"), lit(0)).as("w0"),
      Sampling.poissonWeight(col("k"), lit(1)).as("w1"))
    val rows = w.collect()
    val w0 = rows.map(_.getAs[Int]("w0"))
    assert(w0.forall(v => v >= 0 && v <= 8))
    // E[w] = 1, P(0) = P(1) = 1/e ≈ .368 — loose 3σ-ish bands
    assert(math.abs(w0.sum.toDouble / w0.length - 1.0) < 0.06)
    val p0 = w0.count(_ == 0).toDouble / w0.length
    assert(math.abs(p0 - math.exp(-1.0)) < 0.03, s"P(0)=$p0")
    // replicates decorrelate: the (w0, w1) joint must not sit on the
    // diagonal
    val same = rows.count(r => r.getAs[Int]("w0") == r.getAs[Int]("w1"))
    assert(same < w0.length * 6 / 10, s"replicates correlated: $same")
    // pure function of (key, replicate): identical under repartition
    val again = keys.repartition(7).select(col("k"),
      Sampling.poissonWeight(col("k"), lit(0)).as("w0")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    rows.foreach(r => assert(again(r.getLong(0)) == r.getAs[Int]("w0")))
  }
}
