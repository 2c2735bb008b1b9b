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

  test("ADC: k ascending results per query, no self-match; a seed " +
      "vector's ADC distance is its exact L2 at iters=0") {
    val vecs = mkVecs(40, 8)
    val got = Pq.adcTopK(vecs, "vec_id", "embedding",
      dim = 8, numSub = 2, ks = 4, k = 6, numQueries = 2, kmeansIters = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.count(_._1 == 0L) == 6 && got.count(_._1 == 1L) == 6)
    assert(got.forall { case (q, c, _) => q != c })
    got.groupBy(_._1).values.foreach { rows =>
      val ds = rows.map(_._3).toSeq
      assert(ds == ds.sorted, s"distances not ascending: $ds")
    }
    // at iters=0 a seed (id < ks) codes as ITSELF, so its ADC distance
    // from any query is the true L2 distance — check against a direct
    // computation for every (query, seed) pair in the result
    val raw = vecs.collect().map(r => r.getLong(0) ->
      r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def l2(a: Array[Double], b: Array[Double]): Double =
      math.sqrt(a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum)
    val checked = got.filter { case (_, c, _) => c < 4L }
    assert(checked.nonEmpty, "no seed vectors reached the top-k")
    checked.foreach { case (q, c, d) =>
      assert(math.abs(d - l2(raw(q), raw(c))) < 1e-5,
        s"ADC($q,$c)=$d != exact ${l2(raw(q), raw(c))}")
    }
  }

  test("ADC results invariant under repartitioning") {
    val vecs = mkVecs(50, 8)
    assertBagEqual(
      Pq.adcTopK(vecs, "vec_id", "embedding", 8, 2, 4, 3, 4),
      Pq.adcTopK(vecs.repartition(11), "vec_id", "embedding", 8, 2, 4, 3, 4))
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

  test("ivfAdcTopK with nprobe = numCells equals brute ADC exactly") {
    val vecs = Tables.embeddings(spark, sf)
    val brute = Pq.adcTopK(vecs, "vec_id", "embedding",
        dim = 64, numSub = 4, ks = 8, k = 5, numQueries = 4)
      .collect().map(_.toSeq).toSet
    val full = Pq.ivfAdcTopK(vecs, "vec_id", "embedding",
        dim = 64, numSub = 4, ks = 8, k = 5, numQueries = 4,
        numCells = 8, nprobe = 8)
      .collect().map(_.toSeq).toSet
    assert(full === brute,
      "probing every cell must reproduce the brute ADC answer")
  }

  test("ivfAdcTopK results are a subset of brute ADC candidates with " +
    "matching distances, and recall is substantial at nprobe 3/8") {
    val vecs = Tables.embeddings(spark, sf)
    val brute = Pq.adcTopK(vecs, "vec_id", "embedding",
        64, 4, 8, 5, 4)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
      .toMap
    val probed = Pq.ivfAdcTopK(vecs, "vec_id", "embedding",
        64, 4, 8, 5, 4, numCells = 8, nprobe = 3)
      .collect()
    // every probed pair's ADC distance equals the brute computation
    // (same codes, same LUT — probing only prunes candidates); recall
    // = overlap with the brute top-5 set
    val bruteAll = Pq.adcTopK(vecs, "vec_id", "embedding",
        64, 4, 8, 1000000, 4)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
      .toMap
    probed.foreach { r =>
      val key = (r.getLong(0), r.getLong(1))
      assert(bruteAll.contains(key) && bruteAll(key) === r.getDouble(2),
        s"probed pair $key distance drifted from the brute ADC")
    }
    val hit = probed.count(r => brute.contains((r.getLong(0), r.getLong(1))))
    assert(hit >= probed.length / 2,
      s"recall collapsed: $hit of ${probed.length} probed pairs in brute top-5")
  }

  test("ivfAdcTopK guards") {
    val vecs = Tables.embeddings(spark, sf)
    intercept[IllegalArgumentException] {
      Pq.ivfAdcTopK(vecs, "vec_id", "embedding", 64, 4, 8, 5, 4,
        numCells = 8, nprobe = 9)
    }
    intercept[IllegalArgumentException] {
      Pq.ivfAdcTopK(vecs, "vec_id", "embedding", 64, 4, 8, 5, 100,
        numCells = 8, nprobe = 2)
    }
  }
}
