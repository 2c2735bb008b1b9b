package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed managed tables — the shuffle-elimination tier the 100 TB
  * checklist asks for on repeatedly-joined fact tables (SURVEY §4):
  * both sides written with `bucketBy(n, keys)` hash-place their rows
  * identically, so an equi-join on the bucket keys reads co-located
  * buckets with NO Exchange on either side (sort-merge runs directly
  * on the bucket files; `spark.sql.sources.bucketing.enabled` is on
  * by default). Salting (Skew.saltedJoin) handles hot keys at join
  * time; bucketing removes the join shuffle entirely for stable key
  * columns — the two compose.
  *
  * Uses the session catalog's managed-table storage (parquet under
  * spark.sql.warehouse.dir) — the open-source stand-in for the
  * reference's warehouse-native tables (`weekly_dag.py` DDL blocks).
  */
object Bucketing {

  /** Write `df` as a bucketed, bucket-sorted managed parquet table
    * (overwriting any previous version). `numBuckets` sizes a bucket
    * to one task's worth of rows at the target scale. */
  def writeBucketed(df: DataFrame, table: String, keys: Seq[String],
                    numBuckets: Int): Unit = {
    require(keys.nonEmpty, "bucketing needs at least one key column")
    require(numBuckets >= 1 && numBuckets <= 100000,
      s"numBuckets=$numBuckets out of range")
    // unqualified identifier chars only: the name feeds a filesystem
    // delete below — anything traversal-shaped must not get near it
    require(table.matches("[A-Za-z0-9_]+"),
      s"table name '$table' must match [A-Za-z0-9_]+")
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    // an in-memory catalog forgets tables across JVMs but their
    // managed locations persist — clear any orphan so overwrite
    // doesn't trip LOCATION_ALREADY_EXISTS (the metastore lowercases
    // identifiers, so the location uses the lowercased name). Resolved
    // through the Hadoop FileSystem API so a non-local warehouse
    // (hdfs://, s3a://) gets cleaned too, not silently skipped. After
    // the DROP above no catalog table can own this managed location —
    // only a dead-JVM leftover can.
    val loc = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"),
      table.toLowerCase(java.util.Locale.ROOT))
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    df.write.mode("overwrite").format("parquet")
      .bucketBy(numBuckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .saveAsTable(table)
  }

  /** Equi-join two same-bucketed tables on their bucket keys. When
    * both were written with identical (keys, numBuckets) this plans
    * with zero Exchange operators (BucketingSpec asserts it). The
    * MERGE hint pins sort-merge regardless of the session's broadcast
    * threshold: a broadcast would make the planner drop the bucketed
    * scan and the zero-shuffle property with it — and at the scale
    * bucketing targets, neither side is broadcast-able anyway. */
  def cocatedJoin(spark: SparkSession, leftTable: String,
                  rightTable: String, keys: Seq[String]): DataFrame =
    spark.table(leftTable).hint("merge")
      .join(spark.table(rightTable).hint("merge"), keys)
}
