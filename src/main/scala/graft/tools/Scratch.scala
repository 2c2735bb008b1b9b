package graft.tools
import org.apache.spark.sql.SparkSession
object Scratch {
  def run(spark: SparkSession, tag: String): Unit = {
    val d = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
      .selectExpr("doc_id % 100 as g", "n_chars").distinct().cache()
    d.count()
    println(s"$tag cached-distinct partitions = " + d.rdd.getNumPartitions)
    d.unpersist(true)
    val e = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
      .selectExpr("doc_id % 100 as g", "n_chars").distinct()
    println(s"$tag uncached-distinct partitions = " + e.rdd.getNumPartitions)
  }
  def main(args: Array[String]): Unit = {
    val s1 = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    s1.sparkContext.setLogLevel("ERROR")
    run(s1, "default:")
    s1.conf.set("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
    run(s1, "canChange=true:")
    s1.stop()
  }
}
