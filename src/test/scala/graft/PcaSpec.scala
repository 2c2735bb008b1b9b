package graft

import graft.operators.Pca
import org.apache.spark.sql.functions._

/** Power-iteration PCA: recovery of a known dominant direction,
  * unit-norm and explained-variance contracts, determinism under
  * repartitioning, and the guards. */
class PcaSpec extends SparkSpecBase {

  test("recovers a planted dominant direction") {
    import spark.implicits._
    // points spread along (1, 1)/sqrt(2) with tiny orthogonal noise:
    // pc1 must align with the diagonal (either sign)
    val pts = (-20 to 20).map { i =>
      val t = i.toDouble
      val eps = (i % 3 - 1) * 0.01
      Seq(t + eps, t - eps)
    }.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "v")
    val r = Pca.topComponent(pts, "id", "v", dim = 2, iters = 15).collect()
    val (p1, p2) = (r(0).getAs[Double]("pc1"), r(1).getAs[Double]("pc1"))
    val s = math.sqrt(0.5)
    assert(math.abs(math.abs(p1) - s) < 0.01 &&
      math.abs(math.abs(p2) - s) < 0.01,
      s"pc1 = ($p1, $p2), expected ±($s, $s)")
    assert(math.signum(p1) === math.signum(p2), "diagonal has equal signs")
    val expl = r(0).getAs[Double]("explained")
    assert(expl > 0.99, s"explained = $expl for a 1-D cloud")
  }

  test("pc1 is unit-norm and explained lies in (0, 1]") {
    val emb = Tables.embeddings(spark, sf)
    val rows = Pca.topComponent(emb, "vec_id", "embedding", 64, 10).collect()
    assert(rows.length === 64)
    val norm = math.sqrt(rows.map(r => {
      val x = r.getAs[Double]("pc1"); x * x
    }).sum)
    assert(math.abs(norm - 1.0) < 1e-4, s"||pc1|| = $norm")
    val expl = rows.head.getAs[Double]("explained")
    assert(expl > 0.0 && expl <= 1.0, s"explained = $expl")
    assert(rows.head.getAs[Double]("eigenvalue") > 0.0)
  }

  test("deterministic under repartitioning (decimal sums + driver fold)") {
    val emb = Tables.embeddings(spark, sf)
    val a = Pca.topComponent(emb, "vec_id", "embedding", 64, 5)
      .collect().map(_.toSeq)
    val b = Pca.topComponent(emb.repartition(17), "vec_id", "embedding", 64, 5)
      .collect().map(_.toSeq)
    assert(a.toSeq === b.toSeq)
  }

  test("guards: dim and iteration bounds") {
    val emb = Tables.embeddings(spark, sf)
    intercept[IllegalArgumentException] {
      Pca.topComponent(emb, "vec_id", "embedding", dim = 1)
    }
    intercept[IllegalArgumentException] {
      Pca.topComponent(emb, "vec_id", "embedding", dim = 300)
    }
    intercept[IllegalArgumentException] {
      Pca.topComponent(emb, "vec_id", "embedding", dim = 64, iters = 0)
    }
    intercept[IllegalArgumentException] {
      Pca.topComponent(emb, "vec_id", "embedding", dim = 64,
        samplePermille = 0)
    }
  }

  test("estimation sample: a permille cap still recovers a PLANTED " +
    "dominant direction (random data has none to stabilize on)") {
    import spark.implicits._
    // 400 points along the (1, 1)/sqrt(2) diagonal + noise: any
    // reasonable subsample sees the same dominant direction
    val pts = (1 to 400).map { i =>
      val t = (i % 41 - 20).toDouble
      val eps = (i % 7 - 3) * 0.02
      (i.toLong, Seq(t + eps, t - eps))
    }.toDF("id", "v")
    def pc(perm: Int): Array[Double] = {
      val a = Array.ofDim[Double](2)
      Pca.topComponent(pts, "id", "v", 2, 15, perm)
        .collect().foreach(r => a(r.getInt(0) - 1) = r.getAs[Double]("pc1"))
      a
    }
    val full = pc(1000)
    val samp = pc(300)
    val dot = math.abs(full.zip(samp).map { case (a, b) => a * b }.sum)
    assert(dot > 0.999, s"|pc1_full . pc1_sample| = $dot")
  }
}
