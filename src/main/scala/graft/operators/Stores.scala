package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Replay idempotence for the persisted sketch stores
  * ([[CountMin.foldIntoStore]], [[QuantileSketch.foldIntoStore]],
  * [[Audit.histogramFoldIntoStore]]).
  *
  * Structured Streaming's `foreachBatch` is at-least-once: a
  * micro-batch that fails between the store overwrite and the
  * checkpoint commit is re-executed, and a plain counter fold would
  * apply it twice. The guard here stamps the foreachBatch `batchId`
  * into the store's MAIN parquet write as a constant `applied`
  * column — the id commits in the same job as the data it describes,
  * so there is no second write whose failure could desynchronize
  * them. A replayed batch (id ≤ the stamp read back from the store)
  * is skipped; a batch that failed BEFORE its overwrite committed
  * left the old stamp in place and re-folds normally. Store readers
  * project their payload columns explicitly, so the stamp never
  * reaches query plans.
  *
  * For the two-dir stores (payload + params manifest) the stamp is
  * only half the contract; write ORDER is the other half. Creation
  * writes params FIRST and the stamped payload SECOND, so the payload
  * write is the single commit point: a crash in between leaves no
  * payload — the store reads as absent and the creation batch
  * re-folds. Merge folds rewrite ONLY the payload (the manifest is
  * immutable after creation), so no later write can desync the pair.
  * Net invariant: payload-present ⇒ params-present ⇒ the stamp read
  * back describes a fully committed store. StreamingSpec exercises
  * both crash windows (params-without-payload, and a checkpoint
  * rewound past a committed fold).
  */
object Stores {

  /** Highest foreachBatch id already folded into the parquet dir's
    * `applied` stamp; -1 when the dir is absent or pre-dates the
    * idempotence column (e.g. a store created by a batch caller). */
  def lastApplied(spark: SparkSession, dir: String): Long = {
    val hp = new org.apache.hadoop.fs.Path(dir)
    val exists =
      hp.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(hp)
    if (!exists) -1L
    else {
      val df = spark.read.parquet(dir)
      if (!df.columns.contains("applied")) -1L
      else df.agg(coalesce(max(col("applied")), lit(-1L))).head.getLong(0)
    }
  }

  /** Stamp the store payload with the id it reflects (constant
    * column; kilobyte stores, so the duplication is nil). */
  def stamp(df: DataFrame, applied: Long): DataFrame =
    df.withColumn("applied", lit(applied))
}
