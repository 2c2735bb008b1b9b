package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
/** Scratch profiler for heavy pipelines (dev tool). */
object Prof {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $name: ${(System.nanoTime()-t0)/1e9}%.2f s"); r
    }
    // warm
    spark.read.parquet(s"$dir/documents.parquet").count()
    val d = Tables.documents(spark, dir).select(col("doc_id"), col("text"))
    val nearDup = d.filter(col("doc_id") % 2 === 0)
      .select((col("doc_id") + 1000000).as("doc_id"),
        expr("substring(text, instr(text, ' ') + 1)").as("text"))
    val all = d.unionByName(nearDup)
    val sh = operators.Dedup.shingleHashes(all, "doc_id", "text", 3).cache()
    time("shingleHashes+cache")(sh.count())
    val sig = operators.Dedup.minhashSignature(sh, "doc_id", 64)
    time("signature")(sig.count())
    val cand = operators.Dedup.lshCandidatePairs(sig, "doc_id", 16, 4)
    time("candidates")(cand.count())
    val full = operators.Dedup.minhashNearDupPairs(all, "doc_id", "text", 3, 64, 16, 0.5)
    time("full-pipeline")(full.count())
    spark.stop()
  }
}
