package graft

import graft.operators.Quantize
import org.apache.spark.sql.functions._

/** Quantization must be lossy in a BOUNDED way: codes in [0, 255],
  * every element reconstructed within half a quantization step, and
  * degenerate (constant) vectors handled. The exact code vectors are
  * oracle-pinned by q83; this spec carries the numeric contract. */
class QuantizeSpec extends SparkSpecBase {
  import spark.implicits._

  test("codes are int8-range and reconstruction error ≤ scale/2") {
    val q = Quantize.int8(Tables.embeddings(spark, sf), "embedding")
    val errCols = q
      .withColumn("deq",
        Quantize.dequantize(col("codes"), col("vmin"), col("scale")))
      .withColumn("maxerr", array_max(zip_with(
        transform(col("embedding"), _.cast("double")), col("deq"),
        (a, b) => abs(a - b))))
      .agg(
        min(array_min(col("codes"))).as("cmin"),
        max(array_max(col("codes"))).as("cmax"),
        // worst element error, in units of that row's half-step
        max(col("maxerr") / (col("scale") / 2)).as("relerr"))
      .head()
    assert(errCols.getAs[Int]("cmin") >= 0)
    assert(errCols.getAs[Int]("cmax") <= 255)
    assert(errCols.getAs[Double]("relerr") <= 1.0 + 1e-9,
      s"reconstruction off by ${errCols.getAs[Double]("relerr")} half-steps")
  }

  test("a constant vector quantizes to all-zero codes, not NaN") {
    val df = Seq((1L, Array(0.5f, 0.5f, 0.5f))).toDF("vec_id", "embedding")
    val row = Quantize.int8(df, "embedding")
      .select(col("codes"), col("scale")).head()
    assert(row.getSeq[Int](0) == Seq(0, 0, 0))
    assert(row.getDouble(1) == 0.0)
  }

  test("quantized cosine preserves neighbor ranking well enough to shortlist") {
    // candidate tiers run on codes; this pins that dequantized cosine
    // against one probe ranks the true top neighbor into the top 3
    val e = Tables.embeddings(spark, sf).filter(col("vec_id") < 200)
    val deq = Quantize.int8(e, "embedding")
      .withColumn("v",
        Quantize.dequantize(col("codes"), col("vmin"), col("scale")))
      .select(col("vec_id"), col("v"))
    val exact = e.select(col("vec_id"),
      transform(col("embedding"), _.cast("double")).as("v"))
    def top(df: org.apache.spark.sql.DataFrame, k: Int): Seq[Long] = {
      val probe = df.filter(col("vec_id") === 0)
        .select(col("v").as("pv")).head().getSeq[Double](0)
      df.filter(col("vec_id") =!= 0)
        .select(col("vec_id"),
          graft.plans.CosineSimilarity(col("v"), lit(probe.toArray)).as("cs"))
        .orderBy(col("cs").desc, col("vec_id"))
        .limit(k).collect().map(_.getLong(0)).toSeq
    }
    val trueTop = top(exact, 1).head
    assert(top(deq, 3).contains(trueTop),
      "true nearest neighbor fell out of the quantized top-3")
  }

  test("channelInt8: calibrated ranges shrug off a value outlier that " +
    "would crush per-vector resolution") {
    import spark.implicits._
    // 300 well-behaved 4-dim vectors in [0,1]; vector 0 carries a
    // single 1000.0 spike in dim 1. Per-vector scaling of vector 0
    // would quantize its other dims to ~0 resolution; per-CHANNEL
    // p99 calibration clips the spike and keeps everyone's error tiny
    val rows = (0 until 300).map { i =>
      val base = Seq(i % 7 / 7.0, i % 11 / 11.0, i % 13 / 13.0,
        i % 17 / 17.0)
      (i.toLong, if (i == 0) Seq(1000.0) ++ base.tail else base)
    }.toDF("id", "v")
    val r = Quantize.channelInt8(rows, "id", "v", dim = 4, k = 128)
      .collect().map(x => x.getLong(0) -> x.getAs[Double]("recon_err"))
      .toMap
    val errsOthers = r.filterNot(_._1 == 0L).values
    assert(errsOthers.max < 0.01,
      s"calibrated channel error should be tiny: max ${errsOthers.max}")
    // the spiked vector pays clipping error in dim 1 ONLY — bounded
    // by ~spike/dim, not by destroying the other dims
    assert(r(0L) > errsOthers.max, "the outlier must pay, not the corpus")
  }

  test("channelInt8 is deterministic under repartitioning") {
    val e = Tables.embeddings(spark, sf)
    val a = Quantize.channelInt8(e, "vec_id", "embedding")
      .collect().map(_.toSeq).toSet
    val b = Quantize.channelInt8(e.repartition(13), "vec_id", "embedding")
      .collect().map(_.toSeq).toSet
    assert(a === b)
  }

  test("channelInt8 plans a broadcast of the cut arrays — the corpus " +
    "never shuffles") {
    val e = Tables.embeddings(spark, sf)
    val plan = Quantize.channelInt8(e, "vec_id", "embedding")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("SortMergeJoin"),
      s"corpus shuffles against the cuts:\n$plan")
  }
}
