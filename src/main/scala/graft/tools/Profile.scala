package graft.tools

import graft.operators.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only stage profiler for chasing per-query regressions: times
  * each sub-stage of a pipeline under the same session config Bench
  * uses. Not part of the driver contract. */
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

    val d = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val nearDup = d.filter(col("doc_id") % 2 === 0)
      .select((col("doc_id") + 1000000).as("doc_id"),
        expr("substring(text, instr(text, ' ') + 1)").as("text"))
    val all = d.unionByName(nearDup).cache()
    all.count()

    if (sys.env.contains("GRAFT_PROFILE_EXPLAIN")) {
      val q33 = Dedup.simhashNearDupPairs(all, "doc_id", "text", 6)
      q33.count()
      val plan = q33.queryExecution.executedPlan.toString
      println("q33 ReusedExchange nodes: " +
        plan.linesIterator.count(_.contains("ReusedExchange")))
      println("q33 Exchange nodes: " +
        plan.linesIterator.count(_.trim.contains("Exchange hashpartitioning")))
      val q32 = Dedup.minhashNearDupPairs(all, "doc_id", "text", 3, 64, 16, 0.5)
      q32.count()
      val plan32 = q32.queryExecution.executedPlan.toString
      println("q32 ReusedExchange nodes: " +
        plan32.linesIterator.count(_.contains("ReusedExchange")))
      println("q32 Exchange nodes: " +
        plan32.linesIterator.count(_.trim.contains("Exchange hashpartitioning")))
      spark.stop(); return
    }
    val all5 = d.unionByName(d.filter(col("doc_id") % 5 === 0)
      .select((col("doc_id") + 1000000).as("doc_id"),
        expr("substring(text, instr(text, ' ') + 1)").as("text"))).cache()
    all5.count()
    (1 to 2).foreach { p =>
      println(s"--- pass $p ---")
      spark.catalog.clearCache(); all.count(); all5.count()
      val sh = Dedup.portableShingleHashes(all, "doc_id", "text", 3).cache()
      time("portableShingles+cache")(sh.count())
      val sig = Dedup.minhashSignature(sh, "doc_id", 64)
      time("minhashSignature")(sig.count())
      val cand = Dedup.lshCandidatePairs(sig, "doc_id", 16, 4)
      time("lshCandidatePairs")(cand.count())
      time("full minhash")(
        Dedup.minhashNearDupPairs(all, "doc_id", "text", 3, 64, 16, 0.5).count())
      sh.unpersist()
      spark.catalog.clearCache(); all5.count()
      val tokX = all5.select(col("doc_id"),
        explode(split(col("text"), " ")).as("token"))
      time("tok explode only")(tokX.agg(count(lit(1))).head().getLong(0))
      time("tok + xxhash64 sum")(
        tokX.agg(sum(xxhash64(col("token")))).count())
      time("tok + portableHash sum")(
        tokX.agg(sum(graft.functions.Scalars.portableHash64(col("token"))))
          .count())
      val sig2 = Dedup.simhashSignature(all5, "doc_id", "text")
      time("simhashSignature")(sig2.count())
      time("simhash full")(
        Dedup.simhashNearDupPairs(all5, "doc_id", "text", 6).count())
    }
    spark.stop()
  }
}
