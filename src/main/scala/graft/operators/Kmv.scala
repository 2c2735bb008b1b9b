package graft.operators

import graft.functions.Scalars
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** KMV (k-minimum-values) distinct-count sketch — the mergeable
  * cardinality summary that, unlike HyperLogLog, is exactly
  * reproducible cross-engine: the sketch is literally the k smallest
  * [[Scalars.portableHash64]] values of the key set, so DuckDB can
  * replay sketch, merge, AND estimate bit-for-bit (the md5-based hash
  * is the same function on both engines). The estimator is the
  * classic Beyer et al. 2007 unbiased form: with h_k the k-th
  * smallest of n distinct uniform hashes in [0, 2^60),
  * E[n] ≈ (k-1) · 2^60 / h_k; when a group holds fewer than k
  * distinct values the sketch IS the value set and the count is
  * exact.
  *
  * Scale shape: one distinct-project to (group, hash) — map-side
  * combined — then a per-group top-k under the hash order (the TopK
  * window pattern: hash-partitioned sort, k-bounded output). Sketches
  * are `array<long>` columns of length ≤ k: rollup-merge is a
  * distinct-union + re-take-k, associative and commutative, so
  * monthly sketches fold into yearly ones without touching the base
  * data again (the q84/q92 incremental-rollup posture with an
  * oracle-verifiable estimator).
  */
object Kmv {

  val HashSpace: Double = 1152921504606846976.0 // 2^60, exact in double

  /** Per-group sketch: `(groupCols*, kmins array<long> sorted asc,
    * n_distinct_capped = size(kmins))`. */
  def sketch(df: DataFrame, groupCols: Seq[String], valueCol: String,
             k: Int): DataFrame = {
    require(k >= 2, s"k=$k — the estimator needs at least 2 minima")
    val hashed = df
      .select(groupCols.map(col) :+
        Scalars.portableHash64(col(valueCol)).as("h"): _*)
      .distinct()
    val w = Window.partitionBy(groupCols.map(col): _*).orderBy(col("h"))
    hashed.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .groupBy(groupCols.map(col): _*)
      .agg(array_sort(collect_list(col("h"))).as("kmins"))
      .withColumn("n_distinct_capped", size(col("kmins")).cast("long"))
  }

  /** Distinct-count estimate from a sketch column: exact when the
    * group never filled its k slots, (k-1)·2^60/h_k otherwise. */
  def estimate(sk: DataFrame, k: Int): DataFrame =
    sk.withColumn("est",
      when(size(col("kmins")) < k, size(col("kmins")).cast("double"))
        .otherwise(
          round(lit((k - 1).toDouble) * lit(HashSpace)
            / element_at(col("kmins"), k).cast("double"), 6)))

  /** Merge sketches upward (e.g. month → year): distinct-union the
    * k-min sets, re-take the k smallest. Exactly the sketch that
    * would have been built from the concatenated base data, because
    * min-k of a union is min-k of the union of min-k's. */
  def merge(sk: DataFrame, mergeTo: Seq[String], k: Int): DataFrame =
    sk.select(mergeTo.map(col) :+ explode(col("kmins")).as("h"): _*)
      .distinct()
      .groupBy(mergeTo.map(col): _*)
      .agg(slice(array_sort(collect_list(col("h"))), 1, k).as("kmins"))
      .withColumn("n_distinct_capped", size(col("kmins")).cast("long"))

  /** Sketch-algebra set overlap: given two k-min columns `aCol`/`bCol`
    * on the same row, estimate Jaccard, |A∩B|, and |A∪B| WITHOUT
    * touching base data (Beyer et al. §5): the union's k smallest
    * hashes are a uniform sample of A∪B, so the fraction also present
    * in BOTH sketches estimates J, and |A∩B| ≈ J·|A∪B|. Pure array
    * arithmetic on two ≤k-element columns — the month-over-month
    * retention / audience-overlap query answered from stored
    * sketches. Adds `j_est`, `union_est`, `inter_est`. */
  def overlapEstimate(pairs: DataFrame, aCol: String, bCol: String,
                      k: Int): DataFrame = {
    val u = slice(array_sort(array_union(col(aCol), col(bCol))), 1, k)
    val common = size(array_intersect(array_intersect(u, col(aCol)),
      col(bCol))).cast("double")
    val unionEst = when(size(u) < k, size(u).cast("double"))
      .otherwise(round(lit((k - 1).toDouble) * lit(HashSpace)
        / element_at(u, k).cast("double"), 6))
    pairs
      .withColumn("j_est", round(common / size(u).cast("double"), 6))
      .withColumn("union_est", unionEst)
      .withColumn("inter_est",
        round((common / size(u).cast("double")) * unionEst, 6))
  }
}
