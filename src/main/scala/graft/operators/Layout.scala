package graft.operators

import org.apache.spark.sql.DataFrame
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
}
