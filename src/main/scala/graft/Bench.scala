package graft
import org.apache.spark.sql.SparkSession
object Bench {
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
    spark.sparkContext.setLogLevel("WARN")
    // Warm the JVM/codegen/parquet-footer paths once so per-query times
    // measure the plans, not first-query JIT (names stay stable).
    try {
      spark.read.parquet(s"$sfDir/lineitem.parquet").count()
      SparkEntry.queries.headOption.foreach(_._2(spark, sfDir).count())
    } catch { case _: Throwable => () }
    // two timed passes, per-query minimum: the host is multi-tenant and
    // a single pass can catch a 10x noisy-neighbor stall on any query.
    // A crashing query is recorded in `errors`, never as a fast time.
    val errors = scala.collection.mutable.Map[String, String]()
    def pass(): Map[String, Double] = SparkEntry.queries.map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok = try { fn(spark, sfDir).count(); true } catch {
        case e: Throwable =>
          // strip every JSON-illegal char (controls incl. \t\r\n, quote,
          // backslash) — one survivor makes the whole artifact unparseable
          errors(name) = (e.getClass.getSimpleName + ": " +
            Option(e.getMessage).getOrElse("").take(200))
            .replaceAll("[\\x00-\\x1F\"\\\\]", " ")
          false
      }
      name -> (if (ok) (System.nanoTime() - t0) / 1e9 else -1.0)
    }
    val (p1, p2) = (pass(), pass())
    val results = p1.map { case (k, v) =>
      k -> (if (v < 0 || p2(k) < 0) -1.0 else math.min(v, p2(k)))
    }
    val qs = results.toSeq.sortBy(_._1).map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val errJson = errors.toSeq.sortBy(_._1)
      .map { case (k, m) => s"\"" + k + "\":\"" + m + "\"" }
      .mkString("{", ",", "}")
    val total = results.values.filter(_ >= 0).sum
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errJson,"sf":"$sfDir"}"""
    // the driver parses this artifact from a file first, stdout second:
    // sbt interleaves its own log lines into stdout, which broke the
    // round-1 machine extraction (BENCH_r01 "parsed": null)
    val out = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "target/bench.json")
    val p = java.nio.file.Paths.get(out)
    Option(p.getParent).foreach(java.nio.file.Files.createDirectories(_))
    java.nio.file.Files.write(p, line.getBytes("UTF-8"))
    spark.stop()
    // final stdout line, after spark shutdown so nothing prints below it
    println(line)
  }
}
