package graft.tools

import graft.Tables
import graft.functions.TextFunctions
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only stage bisection for q150 (see Profile.scala). */
object ProfileQ150 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = Runtime.getRuntime.availableProcessors().toString
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

    import org.apache.spark.sql.expressions.Window
    val g = (col("doc_id") % 400).cast("string")
    val dm = ((col("doc_id") % 400) % 20).cast("string")
    val url = when(col("doc_id") % 3 === 0,
        concat(lit("https://site"), dm, lit(".example.com/page/"), g))
      .when(col("doc_id") % 3 === 1,
        concat(lit("HTTPS://SITE"), dm, lit(".EXAMPLE.COM:443/page/"), g))
      .otherwise(concat(lit("https://www.site"), dm,
        lit(".example.com/page/"), g, lit("?utm_source=x")))
    val page = concat(lit("<html><body><p>"), col("text"),
      lit("</p> <a href=\""), col("url"), lit("\">x</a></body></html>"))
    def b = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text"), url.as("url"))
      .select(explode(array(struct(col("doc_id"),
        TextFunctions.canonicalizeUrl(col("url")).as("canon"),
        TextFunctions.stripMarkup(page).as("clean")))).as("r"))
      .select(col("r.doc_id").as("doc_id"), col("r.canon").as("canon"),
        col("r.clean").as("clean"))
      .select(col("doc_id"), col("canon"),
        TextFunctions.urlHost(col("canon")).as("domain"),
        TextFunctions.heuristicKeep(col("clean")).as("gate_keep"))
    def w = b.withColumn("url_keep",
      col("gate_keep") && row_number().over(
        Window.partitionBy(col("canon"))
          .orderBy(when(col("gate_keep"), 0).otherwise(1),
            col("doc_id"))) === 1)
    for (p <- 1 to 2) {
      println(s"--- pass $p ---")
      time("b (gate only)")(b.count())
      time("w (b + url window)")(w.count())
      val quota = graft.operators.Sampling.reservoirPerGroup(
        w.filter(col("url_keep")).select(col("doc_id"), col("domain")),
        Seq("domain"), "doc_id", 3)
      time("quota (w + reservoir)")(quota.count())
      time("survivors only")(w.filter(col("url_keep")).count())
      val surv = w.filter(col("url_keep"))
        .select(col("doc_id"), col("domain")).localCheckpoint(true)
      time("quota on materialized")(graft.operators.Sampling
        .reservoirPerGroup(surv, Seq("domain"), "doc_id", 3).count())
      time("quota salts=1")(graft.operators.Sampling.reservoirPerGroup(
        w.filter(col("url_keep")).select(col("doc_id"), col("domain")),
        Seq("domain"), "doc_id", 3, salts = 1).count())
      time("full q150")(graft.Queries.byName("q150_curation_pipeline")
        .run(spark, sfDir).count())
    }
    spark.stop()
  }
}
