package graft.operators

import java.nio.charset.StandardCharsets
import java.util.EnumSet

import org.apache.hadoop.fs.{CreateFlag, FileContext, Options, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Commit protocol for the persisted sketch stores
  * ([[CountMin.foldIntoStore]], [[QuantileSketch.foldIntoStore]],
  * [[Audit.histogramFoldIntoStore]]): replay idempotence plus an
  * atomic payload replace.
  *
  * '''Replay idempotence.''' Structured Streaming's `foreachBatch` is
  * at-least-once: a micro-batch that fails between the store write
  * and the checkpoint commit is re-executed, and a plain counter fold
  * would apply it twice. The guard stamps the foreachBatch `batchId`
  * into the payload as a constant `applied` column — the id commits
  * in the same parquet dataset as the data it describes, so there is
  * no second write whose failure could desynchronize them. A replayed
  * batch (id ≤ the stamp read back) is skipped; a batch that failed
  * before its payload committed left the old stamp in place and
  * re-folds normally. Store readers project their payload columns
  * explicitly, so the stamp never reaches query plans.
  *
  * '''Atomic replace.''' A merge fold must REPLACE the payload, and a
  * plain `mode("overwrite")` is delete-then-write: a crash mid-
  * overwrite leaves no payload at all, the next fold takes the
  * creation branch, and all previously folded history is silently
  * lost. So payloads here are generation dirs `<root>/g<N>` selected
  * by a one-line pointer file `<root>/PTR`, and the commit point is
  * the pointer flip — a single-file `FileContext` rename with
  * `Options.Rename.OVERWRITE`, the same atomic primitive Spark's own
  * streaming checkpoint manager rests on (HDFS rename is atomic;
  * local rename is a filesystem move). A fold writes the merged
  * payload to the NEXT generation while the current one stays
  * committed, then flips the pointer, then best-effort deletes the
  * superseded generation. Every crash window now degrades to
  * "re-fold", never to "forget":
  *  - crash while writing `g<N+1>`: pointer still names `g<N>`; the
  *    garbage dir is overwritten by the next attempt at that number;
  *  - crash between payload write and pointer flip: pointer still
  *    names `g<N>` with the OLD stamp, so the re-delivered batch
  *    folds again — onto the intact history;
  *  - crash after the flip: the stamp in `g<N+1>` marks the batch
  *    committed and the replay is a no-op;
  *  - crash before the superseded `g<N>` is deleted: an unreferenced
  *    dir lingers until the next fold's sweep — garbage, never
  *    corruption.
  *
  * For the two-dir stores (payload + params manifest) write ORDER
  * still matters at creation: params first, committed payload second,
  * so the pointer flip remains the single commit point. Merge folds
  * rewrite ONLY the payload (the manifest is immutable after
  * creation). Net invariant: pointer-present ⇒ a fully written
  * generation and the params manifest, and the stamp read back
  * describes exactly what that generation folded. StreamingSpec
  * exercises all three crash windows (params-without-payload,
  * generation-without-pointer-flip, and a checkpoint rewound past a
  * committed fold).
  */
object Stores {

  private val PtrName = "PTR"

  private def fc(spark: SparkSession, p: Path): FileContext =
    FileContext.getFileContext(p.toUri,
      spark.sparkContext.hadoopConfiguration)

  /** Generation the pointer currently commits, if any. */
  private def currentGen(spark: SparkSession, root: String): Option[Long] = {
    val pp = new Path(root, PtrName)
    val ctx = fc(spark, pp)
    if (!ctx.util().exists(pp)) None
    else {
      val in = ctx.open(pp)
      try Some(scala.io.Source.fromInputStream(in, "UTF-8")
        .mkString.trim.toLong)
      finally in.close()
    }
  }

  /** The committed payload dir under `root`: the generation the
    * pointer names, or (for a store written by a pre-generation
    * caller) `root` itself when it holds a plain parquet dataset.
    * None ⇒ the store is absent or uncommitted. */
  def resolvePayload(spark: SparkSession, root: String): Option[String] =
    currentGen(spark, root) match {
      case Some(g) => Some(s"$root/g$g")
      case None =>
        val rp = new Path(root)
        val ctx = fc(spark, rp)
        val legacy = ctx.util().exists(rp) &&
          ctx.util().listStatus(rp).exists { st =>
            val n = st.getPath.getName
            st.isFile && (n == "_SUCCESS" || n.endsWith(".parquet"))
          }
        if (legacy) Some(root) else None
    }

  /** True when `root` holds a committed payload. */
  def payloadExists(spark: SparkSession, root: String): Boolean =
    resolvePayload(spark, root).isDefined

  /** Read the committed payload (stamp column included — callers
    * project what they need). */
  def readPayload(spark: SparkSession, root: String): DataFrame =
    spark.read.parquet(resolvePayload(spark, root).getOrElse(
      throw new IllegalStateException(
        s"no committed payload under $root")))

  /** Atomically replace the payload under `root`: `write` receives
    * the next generation dir (it must write with `mode("overwrite")`
    * so a garbage dir from a crashed prior attempt at the same
    * number is clobbered), then the pointer flips, then superseded
    * generations are best-effort swept. The flip is the commit
    * point; everything before it leaves the current generation
    * committed and everything after it is garbage collection. */
  def commitPayload(spark: SparkSession, root: String)
                   (write: String => Unit): Unit = {
    val next = currentGen(spark, root).getOrElse(-1L) + 1L
    write(s"$root/g$next")
    flipPointer(spark, root, next)
    val rp = new Path(root)
    val ctx = fc(spark, rp)
    ctx.util().listStatus(rp).foreach { st =>
      val n = st.getPath.getName
      val stale = st.isDirectory && n.length > 1 && n.head == 'g' &&
        n.tail.forall(_.isDigit) && n != s"g$next"
      if (stale)
        try ctx.delete(st.getPath, true)
        catch { case _: java.io.IOException => () }
    }
  }

  /** Single-file atomic pointer flip: write `PTR.tmp`, rename onto
    * `PTR` with OVERWRITE. All pointer I/O goes through
    * `FileContext` (the raw, checksum-free local FS), so no stale
    * `.crc` sibling can poison a later read. */
  private def flipPointer(spark: SparkSession, root: String,
                          gen: Long): Unit = {
    val pp = new Path(root, PtrName)
    val tmp = new Path(root, PtrName + ".tmp")
    val ctx = fc(spark, pp)
    val out = ctx.create(tmp,
      EnumSet.of(CreateFlag.CREATE, CreateFlag.OVERWRITE),
      Options.CreateOpts.createParent())
    try out.write(gen.toString.getBytes(StandardCharsets.UTF_8))
    finally out.close()
    ctx.rename(tmp, pp, Options.Rename.OVERWRITE)
  }

  /** Highest foreachBatch id already folded into the committed
    * payload's `applied` stamp; -1 when the store is absent or
    * pre-dates the idempotence column (e.g. created by a batch
    * caller). */
  def lastApplied(spark: SparkSession, root: String): Long =
    resolvePayload(spark, root) match {
      case None => -1L
      case Some(dir) =>
        val df = spark.read.parquet(dir)
        if (!df.columns.contains("applied")) -1L
        else df.agg(coalesce(max(col("applied")), lit(-1L)))
          .head.getLong(0)
    }

  /** Stamp the store payload with the id it reflects (constant
    * column; kilobyte stores, so the duplication is nil). */
  def stamp(df: DataFrame, applied: Long): DataFrame =
    df.withColumn("applied", lit(applied))
}
