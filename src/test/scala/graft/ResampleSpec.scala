package graft

import graft.operators.Resample
import org.apache.spark.sql.functions._

/** The grid contract: every (bucket, key) cell exists, gaps carry
  * n=0, fill repairs values, and nothing real is invented. */
class ResampleSpec extends SparkSpecBase {
  import spark.implicits._

  private val df = Seq(
    ("2024-01-01 10:00:00", "a", 10.0),
    ("2024-01-01 11:00:00", "a", 20.0),
    ("2024-01-04 09:00:00", "a", 40.0), // 2-day gap for key a
    ("2024-01-02 09:00:00", "b", 5.0))  // b absent on 01, 03, 04
    .toDF("ts", "k", "v")
    .select(to_timestamp(col("ts")).as("ts"), col("k"), col("v"))

  test("grid is complete: |days| × |keys| rows, gaps at n=0") {
    val got = Resample.resample(df, "ts", "day", Seq("k"), "v")
    assert(got.count() == 4 * 2, "4 days × 2 keys")
    assert(got.filter(col("vcount") === 0).count() == 5,
      "a misses 2 days, b misses 3")
  }

  test("fill carries the last sum forward but leaves leading gaps null") {
    val got = Resample.resample(df, "ts", "day", Seq("k"), "v", fill = true)
      .select(col("bucket").cast("string"), col("k"),
        col("vsum").cast("double"))
      .collect().map(r => (r.getString(0).take(10), r.getString(1)) ->
        Option(r.get(2)).map(_.asInstanceOf[Double])).toMap
    assert(got(("2024-01-02", "a")).contains(30.0), "gap filled from day 1")
    assert(got(("2024-01-03", "a")).contains(30.0))
    assert(got(("2024-01-04", "a")).contains(40.0), "real data wins")
    assert(got(("2024-01-01", "b")).isEmpty, "leading gap has no history")
    assert(got(("2024-01-04", "b")).contains(5.0))
  }

  test("unfilled totals preserve the input mass exactly") {
    val got = Resample.resample(df, "ts", "day", Seq("k"), "v")
    assert(got.agg(sum(col("vsum").cast("double"))).head().getDouble(0)
      == 75.0)
    assert(got.agg(sum(col("vcount"))).head().getLong(0) == 4L)
  }

  test("holt matches a hand-rolled fold, drops length-1 series, and " +
    "is partitioning-invariant") {
    val ys = Seq(1.0, 3.0, 5.0, 10.0, 4.0)
    val rows = ys.zipWithIndex.map { case (v, i) => ("s", i, v) } :+
      (("lone", 0, 9.0))
    val df = rows.toDF("k", "t", "v")
    val out = Resample.holt(df, "k", "t", "v", 0.5, 0.25).collect()
    assert(out.length == 1, "a 1-observation series must be dropped")
    val r = out.head
    // replay the exact operator sequence
    var (l, b) = (ys(0), ys(1) - ys(0))
    ys.drop(2).foreach { y =>
      val nl = 0.5 * y + (1.0 - 0.5) * (l + b)
      val nb = 0.25 * (0.5 * (y - l) + (1.0 - 0.5) * b) + (1.0 - 0.25) * b
      l = nl; b = nb
    }
    def r6(v: Double) = math.round(v * 1e6) / 1e6
    assert(r.getAs[Double]("level") === r6(l) + 0.0)
    assert(r.getAs[Double]("trend") === r6(b) + 0.0)
    assert(r.getAs[Double]("fc2") === r6(l + 2 * b) + 0.0)
    val again = Resample.holt(df.repartition(5), "k", "t", "v", 0.5, 0.25)
      .collect().head
    assert(again.getAs[Double]("level") === r.getAs[Double]("level") &&
      again.getAs[Double]("trend") === r.getAs[Double]("trend"))
  }

  test("holtWinters matches a hand-rolled seasonal fold, drops " +
    "sub-2m series, and is partitioning-invariant") {
    val m = 3
    // period-3 sawtooth with drift: two init seasons + 4 folded obs
    val ys = Seq(10.0, 2.0, 6.0, 13.0, 5.0, 9.0, 16.0, 8.0, 12.0, 19.0)
    val rows = ys.zipWithIndex.map { case (v, i) => ("s", i, v) } :+
      (("short", 0, 9.0)) :+ (("short", 1, 8.0))
    val df = rows.toDF("k", "t", "v")
    val out = Resample.holtWinters(df, "k", "t", "v",
      0.5, 0.25, 0.3, m, horizons = 3).collect()
    assert(out.length == 1, "a sub-2m series must be dropped")
    val r = out.head
    // replay the exact operator sequence
    val l0 = ys.take(m).foldLeft(0.0)(_ + _) / m
    val b0 = (ys.slice(m, 2 * m).foldLeft(0.0)(_ + _) / m -
      ys.take(m).foldLeft(0.0)(_ + _) / m) / m
    var (l, b) = (l0, b0)
    var sq = ys.take(m).map(_ - l0)
    ys.drop(2 * m).foreach { y =>
      val sU = sq.head
      val nl = 0.5 * (y - sU) + (1.0 - 0.5) * (l + b)
      val nb = 0.25 * (0.5 * (y - sU - l) + (1.0 - 0.5) * b) +
        (1.0 - 0.25) * b
      val ns = 0.3 * (y - l - b) + (1.0 - 0.3) * sU
      l = nl; b = nb; sq = sq.tail :+ ns
    }
    def r6(v: Double) = math.round(v * 1e6) / 1e6
    assert(r.getAs[Double]("level") === r6(l) + 0.0)
    assert(r.getAs[Double]("trend") === r6(b) + 0.0)
    assert(r.getAs[Double]("s_range") === r6(sq.max - sq.min) + 0.0)
    assert(r.getAs[Double]("fc1") === r6(l + 1 * b + sq(0)) + 0.0)
    assert(r.getAs[Double]("fc3") === r6(l + 3 * b + sq(2)) + 0.0)
    val again = Resample.holtWinters(df.repartition(5), "k", "t", "v",
      0.5, 0.25, 0.3, m, horizons = 3).collect().head
    assert(again.getAs[Double]("level") === r.getAs[Double]("level") &&
      again.getAs[Double]("fc3") === r.getAs[Double]("fc3"))
  }
}
