package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout operators (SURVEY §4 / 100 TB checklist): at scale the
  * cheapest predicate is the one that never reads a file. Parquet
  * footers carry per-row-group min/max; they only prune when the data
  * is CLUSTERED on the predicate columns. `writeClustered` range-
  * partitions and sorts on the cluster keys so every file owns a
  * disjoint key range — range predicates then skip whole files
  * (footer min/max) instead of scanning and discarding.
  */
object Layout {

  /** Write `df` range-clustered on `cols` into `numFiles` files:
    * repartitionByRange gives each output file a disjoint range of the
    * cluster key (equal keys never straddle files), sortWithinPartitions
    * orders row groups inside each file so row-group-level stats prune
    * too. LayoutSpec asserts the disjointness that makes pruning real. */
  def writeClustered(df: DataFrame, path: String, cols: Seq[String],
                     numFiles: Int): Unit = {
    require(cols.nonEmpty, "clustering needs at least one column")
    require(numFiles >= 1 && numFiles <= 1000000,
      s"numFiles=$numFiles out of range")
    df.repartitionByRange(numFiles, cols.map(col): _*)
      .sortWithinPartitions(cols.map(col): _*)
      .write.mode("overwrite").parquet(path)
  }

  /** Z-ORDER clustering: multi-dimensional layout. [[writeClustered]]
    * prunes on its leading column only — a predicate on the second
    * column alone touches every file, because each file spans that
    * column's full range. Interleaving the bits of all cluster keys
    * into one Morton (Z) value and range-partitioning on IT gives
    * every file a bounded box in ALL dimensions at once, so footer
    * min/max prune on any subset of the keys (LayoutSpec measures
    * exactly this against the linear layout).
    *
    * Each key is first normalized to a `bits`-wide integer rank by
    * linear min/max scaling — one metadata-sized aggregate per call
    * (2·N scalars to the driver, same bounded-collect contract as the
    * IVF centroid step). Linear scaling keeps the map order-preserving
    * and pure-Column; skewed axes can pre-transform (log, rank) before
    * calling. The z-value itself is pure bit arithmetic — shift/and/or
    * Columns, fully codegen'd, no UDF.
    */
  def writeZOrdered(df: DataFrame, path: String, cols: Seq[String],
                    numFiles: Int, bits: Int = 16): Unit = {
    require(cols.size >= 2, "z-order needs at least two columns " +
      "(use writeClustered for one)")
    require(bits * cols.size <= 62,
      s"bits=$bits * ${cols.size} cols overflows a signed 64-bit z-value")
    require(numFiles >= 1 && numFiles <= 1000000,
      s"numFiles=$numFiles out of range")
    val aggCols = cols.flatMap(c => Seq(
      min(col(c)).cast("double").as(s"mn_$c"),
      max(col(c)).cast("double").as(s"mx_$c")))
    val bounds = df.agg(aggCols.head, aggCols.tail: _*).head()
    val maxRank = (1L << bits) - 1
    val scaled: Seq[Column] = cols.map { c =>
      val mn = bounds.getAs[Double](s"mn_$c")
      val mx = bounds.getAs[Double](s"mx_$c")
      val span = if (mx > mn) mx - mn else 1.0
      least(lit(maxRank), greatest(lit(0L),
        ((col(c).cast("double") - lit(mn)) / lit(span) * lit(maxRank.toDouble))
          .cast("long")))
    }
    val z = (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      scaled.zipWithIndex.foldLeft(acc) { case (a, (v, j)) =>
        a.bitwiseOR(shiftleft(
          shiftright(v, i).bitwiseAND(lit(1L)), i * cols.size + j))
      }
    }
    df.withColumn("__z", z)
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }
}
