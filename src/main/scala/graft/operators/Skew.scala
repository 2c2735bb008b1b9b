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

  /** Key-skew diagnosis report — the measurement [[saltedJoin]] (or an
    * AQE skew threshold) is tuned FROM: the top-`topK` heaviest keys
    * of a prospective shuffle key, each with its share of the total
    * and the running cumulative share, plus the global statistics a
    * capacity plan needs on every row — distinct-key count, row count,
    * and the recommended salt factor ceil(max_share · `partitions`)
    * (the bucket count that spreads the single heaviest key across
    * tasks no fuller than the average one).
    *
    * Scale shape: ONE keyed aggregate over the frame (the same
    * shuffle the diagnosed join would pay), a TakeOrdered top-k (no
    * global sort), a topK-row cumulative window, and a 1-row stats
    * cross (the q76 shape). Shares are exact-int ratios rounded to 6.
    *
    * Output: (rank, key, cnt, share, cum_share, n_keys, n_rows,
    * salt_reco), ranked by (cnt desc, key asc). */
  def skewReport(df: DataFrame, keyCol: String, topK: Int,
                 partitions: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(topK >= 1 && topK <= 1000, s"topK=$topK outside [1, 1000]")
    require(partitions >= 1 && partitions <= (1 << 20),
      s"partitions=$partitions outside [1, 2^20]")
    val counts = df.groupBy(col(keyCol).as("key"))
      .agg(count(lit(1)).as("cnt"))
    val stats = counts.agg(count(lit(1)).as("n_keys"),
      sum(col("cnt")).as("n_rows"), max(col("cnt")).as("max_cnt"))
    val top = counts.orderBy(col("cnt").desc, col("key")).limit(topK)
    val w = Window.orderBy(col("cnt").desc, col("key"))
    val cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    top.crossJoin(broadcast(stats))
      .select(row_number().over(w).cast("long").as("rank"),
        col("key"), col("cnt"),
        round(col("cnt").cast("double") / col("n_rows").cast("double"), 6)
          .as("share"),
        round(sum(col("cnt")).over(cum).cast("double") /
          col("n_rows").cast("double"), 6).as("cum_share"),
        col("n_keys"), col("n_rows"),
        ceil(col("max_cnt").cast("double") * partitions /
          col("n_rows").cast("double")).cast("long").as("salt_reco"))
  }
}
