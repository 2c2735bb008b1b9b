package graft.tools

import graft.operators.Similarity
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only comparator for the q262 sampled nprobe sweep: times the
  * EXACT 80-query sweep (the audit the sampled row replaces — its
  * truth pass is 80 × corpus brute cosines) against the sampled form
  * (truth only for the 17-query hash stratum, full-population scan
  * costs kept), so SCALING.md's "what did sampling buy" number is a
  * measurement, not an estimate. Two passes, min reported. Not part
  * of the driver contract.
  *
  * Usage: `sbt "runMain graft.tools.ProfileSweep"`; set
  * SPARK_GRAFT_SF_DIR to change scale (default sf0.1). */
object ProfileSweep {
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
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
    e.count() // warm footers
    val q80 = e.filter(col("vec_id") < 80)
    def time(name: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
      val times = (1 to 2).map { _ =>
        val t0 = System.nanoTime(); df.count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[sweep] $name%-14s ${times.min}%8.2f s " +
        f"(passes: ${times.map(t => f"$t%.2f").mkString(", ")})")
    }
    time("exact-80") {
      Similarity.ivfRecallSweep(e, "vec_id", "embedding", q80,
        "vec_id", "embedding", k = 5, numCells = 16, kmeansIters = 1)
    }
    time("sampled-17") {
      Similarity.ivfRecallSweepSampled(e, "vec_id", "embedding", q80,
        "vec_id", "embedding", k = 5, numCells = 16, kmeansIters = 1)
    }
    spark.stop()
  }
}
