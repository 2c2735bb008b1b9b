package graft

import graft.operators.Pq
import org.apache.spark.sql.functions._

/** Product quantization: code assignment, Lloyd refinement direction,
  * and partitioning invariance. */
class PqSpec extends SparkSpecBase {

  private def mkVecs(n: Int, dim: Int) = {
    import spark.implicits._
    (0L until n.toLong).map { i =>
      (i, (0 until dim).map(j =>
        math.sin(i * 31 + j * 7).toFloat).toArray)
    }.toDF("vec_id", "embedding")
  }

  test("every vector gets one code per subspace; seeds quantize losslessly at iters=0") {
    val vecs = mkVecs(40, 8)
    val got = Pq.codebook(vecs, "vec_id", "embedding",
      dim = 8, numSub = 2, ks = 4, kmeansIters = 0)
    assert(got.count() == 40)
    val seeds = got.filter(col("vec_id") < 4).collect()
    // with no refinement a seed's nearest sub-centroid is itself:
    // codes = own id, reconstruction error ~0 (float→double cast only)
    seeds.foreach { r =>
      assert(r.getLong(1) == r.getLong(0) && r.getLong(2) == r.getLong(0))
      assert(r.getDouble(3) < 1e-6, s"seed qerr ${r.getDouble(3)}")
    }
  }

  test("a Lloyd pass never increases total reconstruction error") {
    val vecs = mkVecs(60, 8)
    def tot(iters: Int): Double =
      Pq.codebook(vecs, "vec_id", "embedding", 8, 2, 4, iters)
        .agg(sum(col("qerr"))).collect()(0).getDouble(0)
    // k-means monotonically reduces within-cell variance; rounding
    // gives a hair of slack
    assert(tot(1) <= tot(0) + 1e-3, s"${tot(1)} vs ${tot(0)}")
  }

  test("codes and qerr invariant under repartitioning") {
    val vecs = mkVecs(50, 8)
    assertBagEqual(
      Pq.codebook(vecs, "vec_id", "embedding", 8, 2, 4),
      Pq.codebook(vecs.repartition(13), "vec_id", "embedding", 8, 2, 4))
  }

  test("guards: indivisible dim and oversized codebook rejected") {
    val vecs = mkVecs(4, 8)
    intercept[IllegalArgumentException] {
      Pq.codebook(vecs, "vec_id", "embedding", 8, 3, 4)
    }
    intercept[IllegalArgumentException] {
      Pq.codebook(vecs, "vec_id", "embedding", 8, 2, 4096)
    }
  }
}
