package graft

import graft.operators.Layout
import org.apache.spark.sql.functions._

/** Clustered layout must actually produce the disjoint per-file key
  * ranges that make footer min/max pruning work at scale. */
class LayoutSpec extends SparkSpecBase {

  test("writeClustered gives every file a disjoint key range") {
    val dir = java.nio.file.Files.createTempDirectory("graft_layout").toString
    Layout.writeClustered(
      Tables.orders(spark, sf), dir, Seq("o_orderdate"), numFiles = 4)
    val ranges = spark.read.parquet(dir)
      .groupBy(input_file_name().as("f"))
      .agg(min(col("o_orderdate")).as("lo"), max(col("o_orderdate")).as("hi"))
      .collect()
      .map(r => (r.getAs[java.time.LocalDateTime](1),
        r.getAs[java.time.LocalDateTime](2)))
      .sortBy(_._1.toString)
    assert(ranges.length == 4, s"expected 4 files, got ${ranges.length}")
    ranges.sliding(2).foreach {
      case Array((_, hi), (lo, _)) =>
        assert(!hi.isAfter(lo),
          s"file ranges overlap: [$hi] vs [$lo] — clustering broken")
      case _ =>
    }
    // and nothing was lost in the rewrite
    assert(spark.read.parquet(dir).count() ==
      Tables.orders(spark, sf).count())
  }

  test("snapshotDiff classifies added/removed/changed/unchanged") {
    import spark.implicits._
    val oldDf = Seq((1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0),
      (4, null.asInstanceOf[String], 40.0))
      .toDF("k", "s", "v")
    val newDf = Seq((2, "b", 20.0), (3, "c", 31.0),
      (4, "now-set", 40.0), (5, "e", 50.0))
      .toDF("k", "s", "v")
    val diff = graft.operators.Relational.snapshotDiff(oldDf, newDf, Seq("k"))
      .collect().map(r => r.getInt(0) -> r.getString(1)).toMap
    assert(diff == Map(1 -> "removed", 2 -> "unchanged", 3 -> "changed",
      4 -> "changed", 5 -> "added"))
  }
}
