package graft.tools

import graft.operators.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only stage profiler: times the sub-stages of the dedup-family
  * pipelines (the registry's heaviest queries) under the same session
  * config Bench uses, so a per-query regression can be attributed to
  * a stage instead of re-guessed from totals. Two passes — pass 1
  * carries JIT/first-touch noise, pass 2 is the signal. Not part of
  * the driver contract.
  *
  * Usage: `sbt "runMain graft.tools.Profile"`; set
  * SPARK_GRAFT_SF_DIR to change scale (default sf0.1). */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s   rows=$n")
    }
    def reset(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
    }

    val d = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
    def planted(mod: Int) = d.unionByName(d.filter(col("doc_id") % mod === 0)
      .select((col("doc_id") + 1000000).as("doc_id"),
        expr("substring(text, instr(text, ' ') + 1)").as("text")))

    val all2 = planted(2).cache(); all2.count()
    val all5 = planted(5).cache(); all5.count()

    (1 to 2).foreach { p =>
      println(s"--- pass $p ---")
      reset(); all2.count(); all5.count()
      // q32 stages
      val sh = Dedup.portableShingleHashes(all2, "doc_id", "text", 3).cache()
      time("q32 portableShingles+cache")(sh.count())
      val sig = all2.select(col("doc_id"),
        graft.plans.MinHashSigExpr(col("text"), 3, 64).as("ms"))
      time("q32 fused signatures")(sig.count())
      time("q32 full minhash")(
        Dedup.minhashNearDupPairs(all2, "doc_id", "text", 3, 64, 16, 0.5)
          .count())
      reset(); all5.count()
      // q33 stages
      time("q33 fused simhash sigs")(
        Dedup.simhashSignature(all5, "doc_id", "text").count())
      time("q33 full simhash")(
        Dedup.simhashNearDupPairs(all5, "doc_id", "text", 6).count())
      reset(); all2.count()
      // q94 (prefix-filtered exact Jaccard)
      time("q94 full prefix-jaccard")(
        Dedup.prefixJaccardPairs(planted(4), "doc_id", "text",
          threshold = 0.6, shingleK = 3).count())
    }
    spark.stop()
  }
}
