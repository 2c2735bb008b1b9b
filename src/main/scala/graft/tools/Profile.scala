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
    if (sys.env.contains("GRAFT_PROFILE_Q93")) {
      import graft.operators.{Chunking, Dedup, Sampling}
      import graft.functions.TextFunctions
      import org.apache.spark.sql.expressions.Window
      (1 to 2).foreach { p =>
        println(s"--- q93 pass $p ---")
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
        val docs = spark.read.parquet(s"$sfDir/documents.parquet")
        val gated = docs
          .filter(TextFunctions.qualityScore(col("text")) >= 0.5)
          .select(col("doc_id"), col("text"))
        time("gate")(gated.count())
        val exact = gated
          .withColumn("rn", row_number().over(
            Window.partitionBy(md5(col("text"))).orderBy(col("doc_id"))))
          .filter(col("rn") === 1).drop("rn")
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        time("exact dedup + persist")(exact.count())
        val pairs = Dedup.prefixJaccardPairs(
          exact.filter(size(split(col("text"), " ")) >= 3),
          "doc_id", "text", threshold = 0.5, shingleK = 3)
        time("prefix pairs")(pairs.count())
        val surv = Dedup.dedupApply(exact, "doc_id", pairs, "a", "b")
        time("dedupApply (CC + anti)")(surv.count())
        val chunks = Chunking.chunkTokenWindows(surv, "doc_id", "text",
          chunkSize = 32, stride = 24)
        time("chunking")(chunks.count())
        time("full + split")(Sampling.hashSplit(chunks, "doc_id", "split",
          trainPermille = 800, valPermille = 100).count())
      }
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
      val sig2 = Dedup.simhashSignature(all5, "doc_id", "text")
      time("simhashSignature")(sig2.count())
      time("simhash full")(
        Dedup.simhashNearDupPairs(all5, "doc_id", "text", 6).count())
      // q94 corpus: prefix-filtered Jaccard stages
      spark.catalog.clearCache()
      val all4 = d.unionByName(d.filter(col("doc_id") % 4 === 0)
        .select((col("doc_id") + 1000000).as("doc_id"),
          expr("substring(text, instr(text, ' ') + 1)").as("text")))
      val words = col("__words")
      val elems = array_distinct(transform(
        when(size(words) >= 3, sequence(lit(1), size(words) - lit(2)))
          .otherwise(array().cast("array<int>")),
        i => xxhash64(concat_ws(" ", element_at(words, i),
          element_at(words, i + lit(1)), element_at(words, i + lit(2))))))
      val base4 = all4.select(col("doc_id"), split(col("text"), " ").as("__words"))
      val noFilter = base4.select(col("doc_id"), elems.as("toks"))
      time("pj toks NO filter")(noFilter.count())
      val toks4 = noFilter.filter(size(col("toks")) > 0).cache()
      if (p == 1) {
        val planStr = toks4.queryExecution.optimizedPlan.toString
        println("toks4 optimized plan:\n" + planStr.take(3000))
      }
      time("pj toks+cache")(toks4.count())
      val tok4 = toks4.select(col("doc_id"), explode(col("toks")).as("token"))
      time("pj tok explode")(tok4.agg(count(lit(1))).head().getLong(0))
      val freq4 = tok4.groupBy(col("token")).agg(count(lit(1)).as("freq"))
      time("pj freq agg")(freq4.agg(count(lit(1))).head().getLong(0))
      val sorted4 = tok4.join(freq4, Seq("token"))
        .groupBy(col("doc_id"))
        .agg(array_sort(collect_list(struct(col("freq"), col("token"))))
          .as("sorted"))
      time("pj sorted agg")(sorted4.count())
      val n4 = size(col("sorted"))
      val prefixLen4 = n4 - ceil(lit(0.6) * n4).cast("int") + 1
      val prefix4 = sorted4.select(col("doc_id"), n4.as("n"),
        posexplode(transform(slice(col("sorted"), lit(1), prefixLen4),
          s => s.getField("token"))).as(Seq("pos", "token"))).cache()
      time("pj prefix+cache")(prefix4.count())
      val alpha4 = ceil(lit(0.6 / 1.6) * (col("n_a") + col("n_b")))
      val cand4 = prefix4
        .select(col("doc_id").as("a"), col("n").as("n_a"), col("pos").as("pa"),
          col("token"))
        .join(prefix4.select(col("doc_id").as("b"), col("n").as("n_b"),
          col("pos").as("pb"), col("token")), Seq("token"))
        .filter(col("a") < col("b"))
        .filter(col("n_b") >= ceil(lit(0.6) * col("n_a")) &&
          col("n_a") >= ceil(lit(0.6) * col("n_b")))
        .filter(least(col("n_a") - col("pa"), col("n_b") - col("pb")) >= alpha4)
        .select(col("a"), col("b")).distinct()
      time("pj candidates")(cand4.count())
      time("pj full")(Dedup.prefixJaccardPairs(all4, "doc_id", "text",
        threshold = 0.6, shingleK = 3).count())
    }
    spark.stop()
  }
}
