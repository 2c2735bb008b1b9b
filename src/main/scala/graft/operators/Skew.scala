package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation (SURVEY §4 / builder scale checklist): when one
  * join key carries a disproportionate share of the large side, a
  * plain shuffle join puts that key's entire volume on one task.
  * Salting splits each key into `saltBuckets` sub-keys: the large side
  * takes a deterministic per-row salt, the small side is replicated
  * across all salts, and the join key becomes (key, salt) — the hot
  * key's rows spread over `saltBuckets` tasks.
  *
  * AQE's skew-join handling (`spark.sql.adaptive.skewJoin`) covers
  * sort-merge cases automatically; explicit salting remains the tool
  * when the build side must stay a hash join or the skew is known
  * up front.
  */
object Skew {

  /** Inner equi-join of `large` (skewed) with `small`, salted
    * `saltBuckets` ways. Salt is derived from the large row's full
    * content hash — deterministic, no RNG, uniform. Result equals the
    * plain join bag-for-bag (SkewSpec asserts it). */
  def saltedJoin(large: DataFrame, small: DataFrame, keys: Seq[String],
                 saltBuckets: Int = 8): DataFrame = {
    val largeSalted = large.withColumn("_salt",
      pmod(xxhash64(large.columns.map(col): _*), lit(saltBuckets)).cast("int"))
    val smallExploded = small.withColumn("_salt",
      explode(sequence(lit(0), lit(saltBuckets - 1))))
    largeSalted.join(smallExploded, keys :+ "_salt").drop("_salt")
  }
}
