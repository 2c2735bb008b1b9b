package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Warehouse write protocols (SURVEY §2.1 K1–K3, §2.10, §3.3).
  *
  * The reference implements three load disciplines against BigQuery:
  * unconditional append (`daily_dag.py:117`), insert-if-absent via a
  * row-at-a-time probe loop (`weekly_dag.py:420-427` — "This is super
  * slow"), and delete+reinsert partition upsert
  * (`weekly_dag.py:132-147`). Here each is one distributed plan over
  * partitioned parquet:
  *
  *  - append: plain partitioned append;
  *  - dedupAppend: ONE left-anti join against the existing key set
  *    replaces N warehouse round-trips;
  *  - upsertPartitions: dynamic partition overwrite, writing only the
  *    partitions whose content actually changed (the reference's
  *    *intent* per SURVEY §7.5.3: absent→append, changed→replace,
  *    identical→no-op — not its buggy observed behavior).
  *
  * Partition layout is the engine's date-part key (year, month[, day])
  * so the reference's `WHERE year= AND month=` probes become partition
  * pruning (SURVEY §1.2).
  */
object Sinks {

  def append(df: DataFrame, path: String, partitionCols: Seq[String]): Unit =
    df.write.mode(SaveMode.Append).partitionBy(partitionCols: _*).parquet(path)

  private def tableExists(spark: SparkSession, path: String): Boolean =
    try { spark.read.parquet(path).schema; true }
    catch { case _: Exception => false }

  /** Insert-if-absent (J2/J3): append only candidate rows whose key is
    * not already present. The existing side is pruned to the key
    * columns before the anti-join, so only the key set shuffles (and
    * broadcasts when small). Idempotent: running twice == once. */
  def dedupAppend(spark: SparkSession, candidates: DataFrame, path: String,
                  keys: Seq[String], partitionCols: Seq[String]): Unit = {
    val fresh =
      if (!tableExists(spark, path)) candidates
      else Relational.newKeysOnly(candidates, spark.read.parquet(path), keys)
    val staged = fresh.cache()
    try {
      if (!staged.isEmpty) append(staged, path, partitionCols)
    } finally staged.unpersist()
  }

  /** Order-insensitive per-partition content digest: sum of row hashes
    * plus row count. Used for change detection without a full
    * exceptAll both ways per partition. */
  private def partitionDigest(df: DataFrame, partitionCols: Seq[String]) = {
    val dataCols = df.columns.filterNot(partitionCols.contains).sorted
    // hashes summed in DECIMAL(38,0): exact, associative (order-
    // insensitive), and immune to ANSI long-overflow
    df.groupBy(partitionCols.map(col): _*)
      .agg(sum(xxhash64(dataCols.map(col): _*).cast("decimal(38,0)"))
        .as("_digest"),
        count(lit(1)).as("_n"))
  }

  /** Small-file compaction (the production hygiene pass every
    * partitioned append sink eventually needs: a year of daily
    * dedupAppends leaves hundreds of row-group-sized files per
    * partition, and at 100 TB the scan's task-scheduling overhead and
    * footer reads start to dominate). Rewrites ONLY the partitions
    * whose file count exceeds `maxFiles`,
    * via dynamic partition overwrite — untouched partitions keep their
    * files byte-identical. The rewrite hash-partitions on the partition
    * key, so each compacted partition lands as ONE file (`rewriteTasks`
    * only spreads concurrent partition rewrites across tasks; a
    * partition too big for one file shouldn't be fragmented into
    * row-group-sized pieces in the first place). Content is preserved
    * bag-for-bag (SinksSpec asserts both properties). */
  def compactPartitions(spark: SparkSession, path: String,
                        partitionCols: Seq[String], maxFiles: Int = 8,
                        rewriteTasks: Int = 32): Unit = {
    require(maxFiles >= 1 && rewriteTasks >= 1)
    val df = spark.read.parquet(path)
    // input_file_name() is non-deterministic to the analyzer — project
    // it out first, then aggregate the materialized column
    val fragmented = df
      .select(partitionCols.map(col) :+ input_file_name().as("_f"): _*)
      .groupBy(partitionCols.map(col): _*)
      .agg(countDistinct(col("_f")).as("_nf"))
      .filter(col("_nf") > maxFiles)
      .select(partitionCols.map(col): _*)
    val toRewrite = df.join(fragmented, partitionCols, "left_semi")
      .repartition(rewriteTasks, partitionCols.map(col): _*)
      .cache()
    try {
      // count() (not isEmpty's take(1)) FULLY materializes the cache
      // before the overwrite below: the write must never re-read the
      // source files it is replacing mid-commit
      if (toRewrite.count() > 0) {
        val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try toRewrite.write.mode(SaveMode.Overwrite)
          .partitionBy(partitionCols: _*).parquet(path)
        finally prev match {
          case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
          case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
        }
      }
    } finally toRewrite.unpersist()
  }

  /** Replace-partition upsert with change detection (§3.3 intent):
    * write exactly the partitions that are new or whose digest
    * changed, via dynamic partition overwrite; identical partitions
    * are untouched (no-op). */
  def upsertPartitions(spark: SparkSession, batch: DataFrame, path: String,
                       partitionCols: Seq[String]): Unit = {
    val toWrite =
      if (!tableExists(spark, path)) batch
      else {
        val existing = spark.read.parquet(path)
        val changedKeys = partitionDigest(batch, partitionCols)
          .join(partitionDigest(existing, partitionCols)
              .withColumnRenamed("_digest", "_d2").withColumnRenamed("_n", "_n2"),
            partitionCols, "left")
          .filter(col("_d2").isNull || col("_digest") =!= col("_d2")
            || col("_n") =!= col("_n2"))
          .select(partitionCols.map(col): _*)
        batch.join(changedKeys, partitionCols, "left_semi")
      }
    val staged = toWrite.cache()
    try {
      if (!staged.isEmpty) {
        val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try staged.write.mode(SaveMode.Overwrite)
          .partitionBy(partitionCols: _*).parquet(path)
        finally prev match {
          case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
          case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
        }
      }
    } finally staged.unpersist()
  }
}
