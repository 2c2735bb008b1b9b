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

  /** "No table yet" detection for the create-on-first-write branch.
    * Only ANALYSIS failures (absent path, schemaless empty/crashed-
    * first-append dir) read as "absent" — a TRANSIENT read error
    * (an IOException surfacing mid-listing) must propagate instead:
    * swallowing it would make [[dedupAppend]] treat the whole
    * warehouse as new and append every candidate, DUPLICATING every
    * already-present key. Absence errs loud, never toward
    * duplication. */
  private def tableExists(spark: SparkSession, path: String): Boolean =
    try { spark.read.parquet(path).schema; true }
    catch { case _: org.apache.spark.sql.AnalysisException => false }

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

  /** NULL-SAFE left-semi on the partition key tuple. Plain-equality
    * semi-joins silently DROP rows whose key tuple carries a NULL
    * (NULL = NULL is not true): in [[upsertPartitions]] a
    * NULL-partition batch row would reach the changed-key set but
    * then vanish from the write — data loss, not just a skipped
    * no-op. `groupBy` and `partitionBy` both treat NULL as a value
    * (one group; one `__HIVE_DEFAULT_PARTITION__` dir), so the joins
    * in between must too. EqualNullSafe still extracts as hash-join
    * keys — no nested-loop regression. */
  private def semiOnKeys(left: DataFrame, keys: DataFrame,
                         partitionCols: Seq[String]): DataFrame = {
    val k = keys.toDF(partitionCols.map("__k_" + _): _*)
    left.join(k,
      partitionCols.map(c => left(c) <=> k(s"__k_$c")).reduce(_ && _),
      "left_semi")
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
    // null-safe semi (semiOnKeys): a fragmented NULL partition
    // (`__HIVE_DEFAULT_PARTITION__`) must be compactable like any
    // other — under plain equality it was silently never rewritten
    val toRewrite = semiOnKeys(df, fragmented, partitionCols)
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
        // NULL-SAFE digest compare (the semiOnKeys rationale): a NULL
        // partition value is one group to groupBy and one dir to
        // partitionBy, so it must be one key here too — under plain
        // equality its digest rows never match and the partition
        // reads "changed" forever (and the old plain-equality semi
        // below then DROPPED its rows from the write entirely)
        val bd = partitionDigest(batch, partitionCols)
        val ed = partitionDigest(existing, partitionCols)
          .toDF(partitionCols.map("__e_" + _) ++ Seq("_d2", "_n2"): _*)
        val changedKeys = bd.join(ed,
            partitionCols.map(c => bd(c) <=> ed(s"__e_$c")).reduce(_ && _),
            "left")
          .filter(col("_d2").isNull || col("_digest") =!= col("_d2")
            || col("_n") =!= col("_n2"))
          .select(partitionCols.map(col): _*)
        semiOnKeys(batch, changedKeys, partitionCols)
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
