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
}
