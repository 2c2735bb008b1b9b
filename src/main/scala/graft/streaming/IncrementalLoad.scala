package graft.streaming

import graft.operators.{Relational, Sinks}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** The reference's scheduled incremental loads (SURVEY §2.10, §3.1-3.3:
  * Airflow cron + probe-then-append/upsert) as idempotent engine jobs.
  *
  * Batch form: one call per scheduled run — derive the date-part
  * partition key, then dedup-append (exactly-once per key across
  * re-runs) or partition-upsert (restatements). Streaming form: the
  * same sink protocol applied per micro-batch via foreachBatch with
  * Trigger.AvailableNow — the modern spelling of "cron a batch job"
  * that also absorbs continuous arrivals unchanged.
  */
object IncrementalLoad {

  /** Stage a frame as TWO single-file parquet datasets split by the
    * `firstHalf` predicate under a fresh temp root, and return the
    * file-source stream over them (`maxFilesPerTrigger = 1` → exactly
    * two micro-batches) plus the root for store/checkpoint paths —
    * the q216 wire's staging, shared by every end-to-end streaming
    * query so the split/glob/trigger plumbing has one source.
    * `firstHalf` must be a predicate over non-null columns (a null
    * evaluation would drop the row from BOTH halves). */
  def stageTwoFileStream(df: DataFrame, firstHalf: org.apache.spark.sql.Column,
                         tag: String): (DataFrame, java.nio.file.Path) = {
    // crash hygiene first: a prior run of this wire killed mid-drain
    // (JVM death — beyond any try/finally) left its staging and
    // per-run index behind; retire such roots before creating ours
    sweepAgedRoots(tag)
    val root = java.nio.file.Files.createTempDirectory(tag)
    df.filter(firstHalf).coalesce(1)
      .write.parquet(root.resolve("in/a").toString)
    df.filter(!firstHalf).coalesce(1)
      .write.parquet(root.resolve("in/b").toString)
    val stream = df.sparkSession.readStream.schema(df.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(root.toString + "/in/*/")
    (stream, root)
  }

  /** Delete temp roots of a prior `tag` run older than `maxAgeMs`
    * (default 1 h) — the crash half of the wires' temp hygiene. The
    * normal path sweeps its own root after the drain (and the gate
    * wires do so in a `finally`, covering exceptions), but a run
    * killed outright — OOM, SIGKILL, driver loss — leaves its staging
    * plus per-run signature index (megabytes) behind until the OS tmp
    * cleaner runs; the NEXT invocation of the same wire retires them
    * here. The age guard keeps concurrent LIVE runs (bench
    * parallelism, test suites on the same host) untouched: a root is
    * aged only when EVERY file under it is older than the cutoff —
    * the root directory's own mtime is frozen near creation, but a
    * live run's staging/checkpoint writes keep refreshing file
    * mtimes inside, so a long-lived active stream (paused JVM, slow
    * drain) is never judged by its birth time. */
  def sweepAgedRoots(tag: String, maxAgeMs: Long = 3600000L): Unit = {
    import scala.jdk.CollectionConverters._
    val tmp = java.nio.file.Paths.get(
      System.getProperty("java.io.tmpdir"))
    val cutoff = System.currentTimeMillis() - maxAgeMs
    // short-circuits at the first fresh file (the common case for a
    // live root); any walk/stat failure — including the
    // UncheckedIOException Files.walk throws when a concurrent run
    // deletes entries mid-iteration — reads as "live", never as a
    // crash and never as a sweep
    def isAged(p: java.nio.file.Path): Boolean =
      try scala.util.Using.resource(java.nio.file.Files.walk(p)) {
        !_.iterator().asScala.exists(q =>
          (try java.nio.file.Files.getLastModifiedTime(q).toMillis
           catch { case _: java.io.IOException => Long.MaxValue })
            >= cutoff)
      } catch {
        case _: java.io.IOException => false
        case _: java.io.UncheckedIOException => false
      }
    if (java.nio.file.Files.isDirectory(tmp)) {
      val aged = scala.util.Using.resource(
          java.nio.file.Files.list(tmp)) {
        _.iterator().asScala
          .filter(_.getFileName.toString.startsWith(tag))
          .filter(isAged)
          .toSeq
      }
      aged.foreach { p =>
        try {
          val paths = scala.util.Using.resource(
            java.nio.file.Files.walk(p))(_.iterator().asScala.toSeq)
          paths.sortBy(-_.getNameCount).foreach(q =>
            try java.nio.file.Files.deleteIfExists(q)
            catch { case _: java.io.IOException => () })
        } catch { case _: java.io.IOException => () }
      }
    }
  }

  /** Delete a drained wire's STAGING and CHECKPOINT dirs (the store
    * stays — the query's returned plan reads it), bounding the temp
    * footprint to the kilobyte store instead of leaking a table copy
    * per invocation (bench runs each wire 3+ times per session).
    * Gate wires whose returned plan reads only the ADMITTED rows pass
    * `dirs = Seq("in", "ckpt", "store")` to also drop their per-run
    * signature index (megabytes, not kilobytes — it must not leak
    * per invocation). */
  def cleanStaging(root: java.nio.file.Path,
                   dirs: Seq[String] = Seq("in", "ckpt")): Unit =
    dirs.foreach { d =>
      val p = root.resolve(d)
      if (java.nio.file.Files.exists(p)) {
        import scala.jdk.CollectionConverters._
        // materialize under Using so the walk's directory handles are
        // closed even when the traversal throws mid-stream
        val paths = scala.util.Using.resource(java.nio.file.Files.walk(p)) {
          _.iterator().asScala.toSeq
        }
        paths.sortBy(-_.getNameCount)
          .foreach(java.nio.file.Files.deleteIfExists(_))
      }
    }

  /** Daily fact load (`daily_dag.py:89-117` semantics, plus the J2
    * dedup the reference forgot on this path — SURVEY §7.5.5):
    * date-part derivation + key-deduped partitioned append. */
  def loadFacts(spark: SparkSession, batch: DataFrame, dateCol: String,
                keys: Seq[String], warehousePath: String): Unit = {
    val withParts = Relational.withDateParts(batch, dateCol)
    Sinks.dedupAppend(spark, withParts, warehousePath,
      keys ++ Seq("year", "month", "day"), Seq("year", "month"))
  }

  /** Weekly snapshot load (`weekly_dag.py:55-147` intent): replace
    * changed partitions, append new, no-op identical. */
  def loadSnapshot(spark: SparkSession, batch: DataFrame, dateCol: String,
                   warehousePath: String): Unit = {
    val withParts = Relational.withDateParts(batch, dateCol)
    Sinks.upsertPartitions(spark, withParts, warehousePath,
      Seq("year", "month"))
  }

  /** Streaming dedup-append: every micro-batch runs the J2 protocol
    * against the warehouse, so the sink is exactly-once-per-key even
    * if the source replays (at-least-once upstream is fine). With
    * Trigger.AvailableNow the query drains what exists and stops —
    * a scheduled incremental run. */
  def streamingDedupAppend(spark: SparkSession, stream: DataFrame,
                           dateCol: String, keys: Seq[String],
                           warehousePath: String,
                           checkpoint: String): StreamingQuery =
    stream.writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val withParts = Relational.withDateParts(batch, dateCol)
        Sinks.dedupAppend(spark, withParts, warehousePath,
          keys, Seq("year", "month"))
      }
      .start()

  /** Map a gate incarnation's foreachBatch ids into the store's
    * gatelog generation space. foreachBatch ids restart at 0 with
    * every FRESH checkpoint, but the gatelog counter is a property of
    * the STORE: batch appends ([[graft.operators.Dedup
    * .appendToMinhashStore]] / [[graft.operators.Similarity
    * .appendToIvfStore]]) advance it too, and a prior stream
    * incarnation may have left it anywhere. Without the mapping, a
    * fresh-checkpoint gate attached to a store whose gatelog sits at
    * N would judge its first N+1 micro-batches "already committed"
    * and SKIP them silently — data loss with no error. The offset
    * (gatelog horizon + 1 at incarnation start) is computed once and
    * persisted INSIDE the checkpoint dir, so it shares the
    * checkpoint's fate: replays of this incarnation read the same
    * mapping (decide-once semantics preserved — the offset file is
    * written before any batch commits, so every crash window replays
    * to the same generation ids), while a fresh checkpoint computes a
    * fresh offset aligned past the store's current horizon. A fresh
    * store (no gatelog) resolves to offset 0, i.e. generation ids
    * equal batch ids — the pre-offset layout, so existing stores,
    * oracles, and fixtures read identically. The fold wires
    * (Count-Min / quantile / drift) share the protocol against their
    * stores' own stamp markers — batch folds never advance the stamp,
    * but a prior stream incarnation does, which is the same trap.
    *
    * Two further cases the marker covers:
    *  - A checkpoint written by the PRE-offset protocol (commits
    *    exist, no marker) resolves to offset 0 — the exact legacy
    *    mapping — so upgrading never renumbers a half-drained
    *    incarnation's replayed batch (a fresh offset there would map
    *    a committed batch to a NEW generation above the stamp and
    *    double-fold it).
    *  - The marker also records the incarnation's INTENT high-water:
    *    the largest batch id this incarnation has STARTED, written
    *    (atomically) at the top of every foreachBatch, BEFORE any
    *    store commit. Intent-before-commit makes the ownership test
    *    exact: every generation this incarnation can ever have
    *    stamped is ≤ `offset + intentThrough`, so at wire start a
    *    store stamp beyond that bound proves ANOTHER WRITER grew the
    *    store while this checkpoint was live — batch appends between
    *    incarnation runs, or a second stream — and
    *    [[requireHorizonOwned]] fails the wire LOUDLY instead of
    *    letting the shadowed generations silently swallow batches.
    *    Crash windows replay cleanly: intent-written-but-uncommitted
    *    re-runs the batch (its generation is still above the stamp),
    *    committed-but-checkpoint-uncommitted re-delivers and skips
    *    (its generation equals the stamp). Recovery from the loud
    *    failure: hand off with a fresh checkpoint (and a compacted
    *    root — [[graft.operators.Dedup.compactMinhashStore]]). */
  private final case class Incarnation(offset: Long,
                                       committedThrough: Long) {
    def gen(batchId: Long): Long = offset + batchId
  }

  /** `adoptBound` is the store stamp observed when a markerless
    * (pre-upgrade) checkpoint was adopted, CLAMPED to one slot past
    * the committed horizon — the pre-upgrade protocol's maximal crash
    * window (it flips exactly one stamp per lost commit). The clamp
    * matters: recording the raw stamp would make the adoption-time
    * horizon check tautological, silently tolerating a store another
    * writer had grown arbitrarily far before the upgrade. Recorded in
    * the marker at adoption so it survives restarts. −1 for
    * token-carrying incarnations (their intent bound is exact) and
    * for markers written before the field existed. */
  private final case class IncarnationId(inc: Incarnation,
                                         writer: String,
                                         adoptBound: Long)

  private def markerPath(checkpoint: String): org.apache.hadoop.fs.Path =
    new org.apache.hadoop.fs.Path(checkpoint, "graft-gate-offset")

  /** Marker file layout: `offset intent writer [adoptBound]`,
    * positional; an empty writer is written as `-` when a field
    * follows it (and omitted, with the trailing space trimmed, when
    * none does — the pre-adoptBound legacy form, still parsed). */
  private[graft] def markerContent(offset: Long, intent: Long, writer: String,
                            adoptBound: Long): String =
    if (adoptBound >= 0L)
      s"$offset $intent ${if (writer.isEmpty) "-" else writer} $adoptBound"
    else s"$offset $intent $writer".trim

  /** Deterministic writer identity for an incarnation: md5 of the
    * checkpoint path PLUS the store horizon the incarnation started
    * from (its initial offset). The path alone is not an identity —
    * deleting and recreating a checkpoint dir at the same path starts
    * a NEW life, and a path-only token would let a slot stamped by
    * the previous life (a zombie stream's late commit) read as this
    * incarnation's own at the gen == stamp boundary. Mixing in the
    * creation-time offset separates two lives whenever the store
    * moved between them; the token is minted ONCE and persisted in
    * the marker, so restarts of the same life read it back rather
    * than re-derive it. Residue: two lives of the same path starting
    * from an UNMOVED store horizon still collide — but then the
    * previous life committed nothing, so the slot a zombie could
    * stamp carries the same mapping this life would commit there.
    * Deterministic by design (the repo's no-ambient-randomness
    * discipline; the prior UUID.randomUUID did this job
    * non-deterministically). */
  private def writerToken(checkpoint: String, offset: Long): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s"$checkpoint@$offset".getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString

  /** Parse a marker file's positional fields (see [[markerContent]]):
    * (offset, intent, writer — empty for `-` or absent, adoptBound —
    * −1 when absent). The ONE parser for every marker reader
    * ([[incarnation]], [[migrateLegacyCheckpoint]]) so a layout
    * change cannot drift between them. */
  private[graft] def parseMarker(content: String): (Long, Long, String, Long) = {
    val parts = content.split("\\s+")
    (parts(0).toLong, parts.lift(1).map(_.toLong).getOrElse(-1L),
      parts.lift(2).filter(_ != "-").getOrElse(""),
      parts.lift(3).map(_.toLong).getOrElse(-1L))
  }

  /** Batch ids Spark's checkpoint has COMMITTED — the legacy
    * checkpoint's own horizon evidence, shared by [[incarnation]]'s
    * adoption path and [[migrateLegacyCheckpoint]]'s validation. */
  private def listCommittedIds(spark: SparkSession,
                               checkpoint: String): Seq[Long] = {
    val commits = new org.apache.hadoop.fs.Path(checkpoint, "commits")
    val fs = commits.getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(commits)) Seq.empty[Long]
    else fs.listStatus(commits).toSeq.map(_.getPath.getName)
      .filter(n => n.nonEmpty && n.forall(_.isDigit)).map(_.toLong)
  }

  private def incarnation(spark: SparkSession, checkpoint: String,
                          markerRoot: String): IncarnationId = {
    val S = graft.operators.Stores
    S.readMarkerFile(spark, markerPath(checkpoint)) match {
      case Some(content) =>
        val (offset, intent, writer, adoptBound) = parseMarker(content)
        IncarnationId(Incarnation(offset, intent), writer, adoptBound)
      case None =>
        val last = S.lastApplied(spark, markerRoot)
        // a checkpoint with committed batches but no marker predates
        // the offset protocol: keep its legacy identity mapping —
        // intent bounded by the checkpoint's OWN committed batch ids,
        // so a store grown past them by another writer still fails
        // loudly at requireHorizonOwned rather than silently
        // shadowing the next batch. The store stamp observed NOW,
        // clamped to one slot past the committed horizon (the
        // pre-upgrade protocol's MAXIMAL crash window — see
        // [[IncarnationId]]), is recorded as the adoption bound:
        // anything at or below it is the pre-upgrade protocol's
        // doing, anything beyond it must be covered by this
        // incarnation's own intent-before-commit marker — so the
        // pre-upgrade tolerance is confined to the adoption-time
        // crash window instead of leaking one slot of slack into
        // every later restart, and a store grown ≥2 past the
        // committed horizon fails loudly AT adoption
        // ([[migrateLegacyCheckpoint]] then closes the remaining
        // one-slot tokenless ambiguity for good).
        val committedIds = listCommittedIds(spark, checkpoint)
        // the writer token lets requireOwnSlot distinguish "my own
        // crash-window commit" from "another writer took my slot" at
        // the gen == stamp boundary; legacy incarnations keep an
        // empty token (their pre-upgrade commits carry none — the
        // tolerant skip) until migrated.
        val id =
          if (committedIds.nonEmpty)
            IncarnationId(Incarnation(0L, committedIds.max), "",
              math.min(last, committedIds.max + 1L))
          else {
            val inc = Incarnation(last + 1L, -1L)
            IncarnationId(inc, writerToken(checkpoint, inc.offset), -1L)
          }
        S.writeMarkerFile(spark, markerPath(checkpoint),
          markerContent(id.inc.offset, id.inc.committedThrough,
            id.writer, id.adoptBound))
        id
    }
  }

  /** Stamp a writer token onto an adopted pre-upgrade (markerless-era)
    * checkpoint, closing the one ambiguity the adoption tolerance
    * must otherwise carry: without a token, a store stamp landing
    * exactly on this checkpoint's next generation slot during a crash
    * window cannot be told apart from the checkpoint's own lost
    * commit, so [[requireOwnSlot]] skips it tolerantly — and a
    * foreign append that took the slot would be skipped too, silently
    * losing that batch's admissions. Once migrated, the incarnation's
    * commits carry the token: its own crash-window commits skip
    * (token matches) and a foreign append at the slot fails LOUDLY.
    *
    * Call with the wire STOPPED, in a drained state — the helper
    * refuses anything else, because stamping a token while an
    * UNTAGGED own commit is still pending at the gen == stamp slot
    * would make the routine replay read as a foreign writer:
    *  - every started batch must be checkpoint-committed (a pending
    *    intent means a crash window is mid-recovery);
    *  - the store stamp must not exceed the checkpoint's horizon (one
    *    past = the pre-upgrade crash window not yet drained, or a
    *    foreign append — run the wire once; if it refuses, hand off
    *    with [[handoffCompacted]]).
    * A checkpoint whose marker already carries a token is a no-op
    * (idempotent); a fresh checkpoint (no marker, no commits) is
    * refused — the first wire start mints its token itself.
    *
    * Scope: the GATE wires only (the helper validates against the
    * store's `gatelog`). The fold wires' checkpoints
    * ([[streamingCountMinFold]] / [[streamingQuantileFold]] /
    * [[streamingDriftFold]]) need no migration: their batch-fold path
    * never ADVANCES the store stamp (a batch fold re-records the
    * committed id — [[graft.operators.CountMin.foldIntoStore]]), so
    * the tokenless slot-steal interleave this helper closes cannot
    * arise there, and a second post-upgrade STREAM at the slot is
    * already caught by its own token under `tolerateUntagged`. */
  def migrateLegacyCheckpoint(spark: SparkSession, checkpoint: String,
                              storePath: String): Unit = {
    val S = graft.operators.Stores
    val gatelog = s"$storePath/gatelog"
    val mp = markerPath(checkpoint)
    val committedIds = listCommittedIds(spark, checkpoint)
    val committedMax =
      if (committedIds.isEmpty) -1L else committedIds.max
    // the adoptBound field (if any) is deliberately dropped by the
    // migration: the token it stamps makes the intent bound exact,
    // superseding the adoption-window tolerance
    val parsed = S.readMarkerFile(spark, mp).map(parseMarker)
    if (parsed.exists(_._3.nonEmpty)) return // already token-carrying
    require(parsed.isDefined || committedIds.nonEmpty,
      s"checkpoint $checkpoint has no marker and no committed " +
        "batches — nothing to migrate; a fresh wire start mints its " +
        "writer token itself")
    val (offset, intent) = parsed
      .map(p => (p._1, p._2)).getOrElse((0L, committedMax))
    require(intent <= committedMax,
      s"checkpoint $checkpoint has started batch $intent but only " +
        s"committed through $committedMax — a crash window is " +
        "mid-recovery; run the wire once to drain it, then migrate")
    val last = S.lastApplied(spark, gatelog)
    // a checkpoint with committed batches implies the store it gated
    // carries their gatelog stamps — an absent/unstamped gatelog
    // means a wrong store path or a store rebuilt/compacted since
    // (either way the validation below would pass VACUOUSLY and the
    // token would be stamped against the wrong horizon)
    require(intent < 0L || last >= 0L,
      s"store at $storePath has no gatelog stamp but checkpoint " +
        s"$checkpoint has committed batches — wrong store path, or " +
        "the store was rebuilt/compacted since; a handed-off store " +
        "needs a FRESH checkpoint (handoffCompacted), not a migrated " +
        "one")
    require(last <= offset + intent,
      s"store marker at $gatelog sits at $last, past this " +
        s"checkpoint's horizon (offset=$offset, intent through batch " +
        s"$intent): either the pre-upgrade crash window has not been " +
        "drained yet (run the wire once on this checkpoint first — " +
        "the replay skips as a no-op) or another writer grew the " +
        "store (hand off with IncrementalLoad.handoffCompacted " +
        "instead of migrating)")
    S.writeMarkerFile(spark, mp,
      markerContent(offset, intent, writerToken(checkpoint, offset),
        -1L))
  }

  /** The incarnation-start ownership check (see [[incarnation]]):
    * refuse to run a wire whose store was grown by another writer
    * while this checkpoint was live — the shadowed generations would
    * otherwise be skipped silently. Exact under the
    * intent-before-commit marker discipline: this incarnation's
    * stamps never exceed `offset + intentThrough`. */
  private def requireHorizonOwned(spark: SparkSession, id: IncarnationId,
                                  markerRoot: String): Unit = {
    val inc = id.inc
    val last = graft.operators.Stores.lastApplied(spark, markerRoot)
    // a LEGACY incarnation (empty writer token — adopted from a
    // pre-marker checkpoint) bounds intent by its own COMMITTED batch
    // ids, but the pre-upgrade protocol's normal crash window — store
    // stamp flipped to N, Spark's commit for N lost — leaves the
    // stamp ONE slot past the committed horizon. The tolerance for
    // that window is the ADOPTION BOUND: the stamp observed when the
    // markerless checkpoint was adopted, recorded in the marker.
    // Anything at or below it is the pre-upgrade protocol's own doing
    // (the replay of N then skips at gen == stamp under the
    // legacy-tolerant requireOwnSlot — the routine crash recovery);
    // anything beyond it happened under the marker's
    // intent-before-commit discipline, so it must be intent-covered —
    // a single foreign append on any LATER restart now fails loudly
    // here instead of being silently skipped (the pre-r14 one-slot
    // slack keyed on the empty writer token and so leaked into every
    // restart of an adopted checkpoint). The adoption-time state
    // itself stays inherently ambiguous for a tokenless checkpoint (a
    // single foreign append sitting there looks identical to the
    // crash window and is tolerated exactly as the pre-upgrade
    // protocol would); migrateLegacyCheckpoint stamps a token once
    // drained and closes that too. Markers from before the adoption
    // bound existed parse to −1 — no tolerance, strictly safer.
    require(last <= math.max(inc.offset + inc.committedThrough,
        id.adoptBound),
      s"store marker at $markerRoot sits at $last, past this " +
        s"checkpoint's horizon (offset=${inc.offset}, committed " +
        s"through batch ${inc.committedThrough}): another writer " +
        "(a batch append between incarnation runs, or a second " +
        "stream) grew the store while this checkpoint was live. " +
        "Hand off with a FRESH checkpoint — for the dedup gates, " +
        "IncrementalLoad.handoffCompacted(storePath, newPath, " +
        "newCheckpoint) performs the compact-and-handoff in one " +
        "call — so the new incarnation starts from a clean horizon.")
  }

  /** Pre-batch intent update: record that this incarnation is about
    * to run `batchId`, BEFORE any store commit — the ownership
    * check's exactness depends on this ordering (a commit can never
    * outrun the recorded intent). Atomic rename; idempotent across
    * replays. */
  private def recordIntent(spark: SparkSession, checkpoint: String,
                           id: IncarnationId,
                           intent: java.util.concurrent.atomic.AtomicLong,
                           batchId: Long): Unit =
    if (batchId > intent.get()) {
      graft.operators.Stores.writeMarkerFile(spark,
        markerPath(checkpoint),
        markerContent(id.inc.offset, batchId, id.writer, id.adoptBound))
      intent.set(batchId)
    }

  /** The gen == stamp boundary disambiguator: a slot exactly AT the
    * store's stamp is either this checkpoint's own crash-window
    * commit (gatelog flipped, Spark's checkpoint commit lost — the
    * replay must skip, a no-op) or another writer's append that took
    * the intended slot during the crash window — the ONE interleave
    * the intent arithmetic cannot see (intent already covers the
    * batch, and one append advances the stamp exactly into its
    * slot). The writer token in the pointer stamp tells them apart:
    * own commit ⇒ token matches ⇒ skip; foreign append ⇒ no token ⇒
    * fail loudly (processing would silently drop the batch). A
    * legacy incarnation (empty token — its pre-upgrade commits carry
    * none) keeps the tolerant skip.
    *
    * `tolerateUntagged` is the FOLD-store variant: batch folds never
    * advance those stores' stamps (only streams with incarnations
    * do), so an untagged stamp at this slot can only be this wire's
    * own pre-token-protocol commit — tolerate it, or a routine
    * upgrade-then-crash recovery would fail loudly blaming a foreign
    * writer. The GATE stores pass false: their batch-append path
    * (appendToMinhashStore / appendToIvfStore) advances the stamp
    * without a token, so an untagged slot there really is the
    * foreign interleave the check exists to catch. */
  private def requireOwnSlot(spark: SparkSession, id: IncarnationId,
                             markerRoot: String, gen: Long,
                             tolerateUntagged: Boolean = false): Unit = {
    val lastWriter = graft.operators.Stores.lastWriter(spark, markerRoot)
    require(id.writer.isEmpty || lastWriter.contains(id.writer) ||
        (tolerateUntagged && lastWriter.isEmpty),
      s"generation $gen at $markerRoot is the store's latest stamp " +
        "but was not committed by this checkpoint: another writer " +
        "(a batch append between incarnation runs) took this " +
        "checkpoint's next generation slot during a crash window. " +
        "Hand off with a FRESH checkpoint — for the dedup gates, " +
        "IncrementalLoad.handoffCompacted(storePath, newPath, " +
        "newCheckpoint) performs the compact-and-handoff in one " +
        "call — so the new incarnation starts from a clean horizon.")
  }

  /** The gate-store families [[handoffCompacted]] services — each
    * kind registered BESIDE its compactor, so the dispatch list and
    * the family list cannot drift apart. */
  private val gateStoreKinds: Seq[graft.operators.Stores.GateStoreKind] =
    Seq(graft.operators.Dedup.gateStoreKind,
      graft.operators.Similarity.gateStoreKind)

  /** The compact-and-handoff maintenance move as ONE operation — the
    * remedy every loud ownership failure (and the gates' generation-
    * accumulation KNOWN BOUND) prescribes, previously a four-step
    * manual procedure (stop wire → compact → fresh checkpoint → new
    * incarnation):
    *
    *  1. refuses a non-fresh `newCheckpoint` (reusing a live
    *     checkpoint would replay its batch ids against the compacted
    *     store's renumbered horizon — the very trap the incarnation
    *     protocol exists to catch);
    *  2. folds the QUIESCED store's committed generations into a
    *     fresh base at `newStorePath` (store family resolved from the
    *     manifest through the [[gateStoreKinds]] registry —
    *     compaction scans only index artifacts, never corpus text);
    *  3. pins the new incarnation's marker INSIDE `newCheckpoint`
    *     (offset past the compacted root's horizon — 0 on a fresh
    *     root — intent −1, a checkpoint-derived writer token), so the
    *     next gate start adopts the mapping instead of computing it.
    *
    * Call only after the old wire has STOPPED (single-writer
    * discipline); then start the gate with (`newStorePath`,
    * `newCheckpoint`) and any batch the old incarnation had staged
    * but not committed re-arrives through the source. "When do I
    * compact?" is [[graft.operators.Stores.generationCount]] /
    * [[graft.operators.Stores.shouldCompact]] — one filesystem
    * listing, no Spark job; SCALING.md's round-14 section prices the
    * default threshold. */
  def handoffCompacted(spark: SparkSession, storePath: String,
                       newStorePath: String,
                       newCheckpoint: String): Unit = {
    val S = graft.operators.Stores
    val cp = new org.apache.hadoop.fs.Path(newCheckpoint)
    val fs = cp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(!fs.exists(cp) || fs.listStatus(cp).isEmpty,
      s"handoff checkpoint $newCheckpoint is not fresh: a used " +
        "checkpoint's batch ids would replay against the compacted " +
        "store's renumbered horizon — hand off to a NEW checkpoint " +
        "dir")
    val fields = spark.read.parquet(s"$storePath/params")
      .schema.fieldNames.toSet
    val kinds = gateStoreKinds.filter(k =>
      fields.contains(k.manifestField))
    require(kinds.size == 1,
      s"store at $storePath matches " +
        (if (kinds.isEmpty) "none" else "more than one") +
        " of the registered gate store kinds (" +
        gateStoreKinds.map(k => s"${k.name} via ${k.manifestField}")
          .mkString(", ") +
        ") — handoffCompacted only services the gate stores")
    kinds.head.compact(spark, storePath, newStorePath)
    val offset =
      S.lastApplied(spark, s"$newStorePath/gatelog") + 1L
    S.writeMarkerFile(spark, markerPath(newCheckpoint),
      markerContent(offset, -1L, writerToken(newCheckpoint, offset),
        -1L))
  }

  /** The two gates' shared foreachBatch protocol shell — the
    * structural twin the gate wires re-rolled, factored once:
    * incarnation pin + horizon ownership at wire start, then per
    * micro-batch intent-before-commit, slot ownership at the
    * gen == stamp boundary, decide-once skip of committed
    * generations, and the atomic gatelog commit carrying the stamp,
    * the writer token, and the running admitted stamp the body
    * returns. `admit(batch, gen)` performs the store-type-specific
    * middle — probe, admitted-rows write, generation writes — and
    * returns the NEW running admitted (count, checksum) total to
    * commit. */
  private def runGateWire(spark: SparkSession, stream: DataFrame,
                          storePath: String, checkpoint: String)
                         (admit: (DataFrame, Long) => (Long, Long))
      : StreamingQuery = {
    val gatelog = s"$storePath/gatelog"
    val id = incarnation(spark, checkpoint, gatelog)
    requireHorizonOwned(spark, id, gatelog)
    val inc = id.inc
    val seen = new java.util.concurrent.atomic.AtomicLong(
      inc.committedThrough)
    stream.writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // job labels (thread-local, set on the micro-batch thread) make
        // the gate's many small jobs attributable in profiles/the UI
        val sc = spark.sparkContext
        recordIntent(spark, checkpoint, id, seen, batchId)
        val gen = inc.gen(batchId)
        val last = graft.operators.Stores.lastApplied(spark, gatelog)
        if (gen == last) requireOwnSlot(spark, id, gatelog, gen)
        if (gen > last) {
          sc.setJobDescription(s"gate admit gen=$gen")
          val total = admit(batch, gen)
          sc.setJobDescription(s"gate commit gen=$gen")
          // the stamp rides the pointer flip, atomic with the running
          // admitted total; the one-row payload stays for readers
          // that predate the pointer-stamp protocol
          graft.operators.Stores.commitPayload(spark, gatelog,
              Some(gen),
              Option(id.writer).filter(_.nonEmpty),
              Some(total)) { dir =>
            import org.apache.spark.sql.functions.lit
            spark.range(1).select(lit(gen).as("applied"))
              .write.mode("overwrite").parquet(dir)
          }
          sc.setJobDescription(null)
        }
      }
      .start()
  }

  /** Streaming NEAR-dup gate (★ — the nightly-ingest posture run as a
    * stream): every micro-batch first self-probes for WITHIN-batch
    * near-dups (keep the min key —
    * [[graft.operators.Dedup.minhashIntraBatchFlags]], so two
    * near-dups arriving in one micro-batch cannot both admit), then
    * probes the survivors against the persisted MinHash signature
    * index ([[graft.operators.Dedup.writeMinhashStore]]'s layout),
    * appends the ADMITTED rows to `admittedPath`, and admits their
    * signatures into the index — so a near-dup arriving in a LATER
    * micro-batch of the same stream is rejected against the grown
    * index, exactly like a later nightly batch would be. Net
    * contract: the admitted set is near-dup-free regardless of how
    * batch boundaries fall.
    *
    * Scale shape per micro-batch = the q139 probe: only the batch is
    * signed (fused expression), candidates from the batch⋈store
    * bucket equi-join with the batch side broadcast, exact Jaccard on
    * candidates only. The store parquet is re-read per batch — at
    * 100 TB that's the point (the corpus is never re-signed), and the
    * probe plan reads only the store's (band, bucket) / (key, shingle)
    * columns. Micro-batches serialize through the sink (standard
    * foreachBatch semantics), so index append and next-batch probe
    * cannot race.
    *
    * EXACTLY-ONCE under foreachBatch's at-least-once replay, by
    * decide-once + idempotent rewrites (no plain append anywhere):
    *  - the probe composes the BASE index with gate generations from
    *    batches STRICTLY BEFORE this id, so a replay — with its own
    *    partial writes present, or later generations present after a
    *    checkpoint rewind — recomputes the identical admit set;
    *  - admitted rows, their band buckets, and their shingles each
    *    OVERWRITE a per-batch generation dir (`.../batch=<id>`), so a
    *    replayed batch rewrites rather than duplicates, and the
    *    buckets/shingles pair can never desync (a crash between the
    *    two writes is healed by the rewrite);
    *  - a committed batch is recorded in the `gatelog` marker (the
    *    [[graft.operators.Stores]] pointer protocol) and replays of
    *    it are skipped outright; losing the marker mid-flip merely
    *    degrades to one idempotent re-fold.
    *
    * KNOWN BOUND: each admitting micro-batch adds one generation dir
    * per dataset (`batch=<id>`), so a long-running continuous stream
    * accumulates directories whose LISTING cost eventually shows in
    * the per-batch probe (thousands of batches ⇒ thousands of parquet
    * leaf dirs). The idempotent-rewrite protocol deliberately has no
    * in-place compaction (any partial rewrite of a generation would
    * reopen the duplicate-admission window the protocol closes);
    * the production remedy is [[handoffCompacted]] (one call: fold
    * base ∪ committed generations into a FRESH root with no
    * re-signing — the generations already hold the admitted
    * signatures; measured 2.9–4.4× cheaper than a corpus re-sign and
    * sub-linear across a decade, SCALING.md — then pin the next
    * incarnation's checkpoint marker), triggered when
    * [[graft.operators.Stores.shouldCompact]] says the generation
    * count crossed the deployment's threshold. The same pair services
    * [[streamingSemanticGate]]. */
  def streamingNearDupGate(spark: SparkSession, stream: DataFrame,
                           textCol: String, storePath: String,
                           admittedPath: String, checkpoint: String,
                           threshold: Double = 0.5): StreamingQuery =
    runGateWire(spark, stream, storePath, checkpoint) { (batch, gen) =>
      import org.apache.spark.sql.functions.col
      val D = graft.operators.Dedup
      val base = D.readMinhashStoreBase(spark, storePath)
      def upTo(ds: String, b: DataFrame): DataFrame =
        graft.operators.Stores.withGenerations(spark, storePath,
          ds, b, gen, strict = true)
      // the batch is signed exactly ONCE per micro-batch: these two
      // CACHED frames feed the intra pass, the store probe, AND the
      // admission append (re-deriving them per consumer signs the
      // batch three times). cache(), not localCheckpoint: the
      // shingle frame is the batch × shingles row explosion, and
      // checkpointing it writes gigabytes to the block store at
      // scale where memory-speed reuse is the whole point. The
      // distinct() INSIDE the cached node is the set-semantics guard
      // (the appendToMinhashStore rule): a doc delivered twice in
      // one micro-batch — even with non-signed metadata columns
      // differing — would otherwise double its bucket/shingle rows
      // and skew every later Jaccard against it; on the derived
      // frames (only the signed columns) it is deterministic, and
      // being inside the cache it costs one batch-sized exchange per
      // micro-batch, paid once.
      val bb = D.minhashBandBuckets(batch, base.keyCol, textCol,
        base.k, base.numHashes, base.bands).distinct().cache()
      val bsh = D.portableShingleHashes(batch, base.keyCol, textCol,
        base.k).distinct().cache()
      // intra-batch pass FIRST: two near-dups arriving in the SAME
      // micro-batch are invisible to the store probe (neither is
      // in the index yet) and would both admit — self-probe the
      // batch and keep the min key (the q32 within-corpus rule),
      // exactly the within-batch dedup a nightly-batch posture
      // composes before its store probe. Deterministic, so replays
      // recompute the identical survivor set.
      val sc = spark.sparkContext
      sc.setJobDescription(s"neardup gate gen=$gen: intra self-probe")
      val intra = D.intraFlagsCore(bb, bsh, base.keyCol, threshold)
        .localCheckpoint(true)
      val survBB = bb.join(intra, Seq(base.keyCol), "left_anti")
      val survSH = bsh.join(intra, Seq(base.keyCol), "left_anti")
      val flagged = D.nearDupProbeCore(survBB, survSH, base.keyCol,
          upTo("buckets", base.buckets),
          upTo("shingles", base.shingles), threshold)
        .select(col("b").as(base.keyCol))
      sc.setJobDescription(s"neardup gate gen=$gen: store probe + admit")
      val admitted = batch
        .join(intra, Seq(base.keyCol), "left_anti")
        .join(flagged, Seq(base.keyCol), "left_anti")
        .localCheckpoint(true)
      // ALWAYS overwrite this generation — an empty admit set
      // still writes empty datasets, so an orphan generation left
      // at this id by a crashed prior incarnation (fresh-
      // checkpoint handoff: new offset = old stamp + 1 lands
      // exactly on the orphan's slot) is clobbered rather than
      // silently adopted when the stamp advances past it
      sc.setJobDescription(s"neardup gate gen=$gen: admitted write")
      admitted.write.mode("overwrite")
        .parquet(s"$admittedPath/batch=$gen")
      val keys = admitted.select(col(base.keyCol))
      sc.setJobDescription(s"neardup gate gen=$gen: generation writes")
      D.writeGateAppend(
        bb.join(keys, Seq(base.keyCol), "left_semi"),
        storePath, "buckets", gen)
      D.writeGateAppend(
        bsh.join(keys, Seq(base.keyCol), "left_semi"),
        storePath, "shingles", gen)
      // running admitted stamp = prior total (a pointer read on
      // stamped gatelogs) + this batch's admitted keys, DISTINCT-ed
      // within the batch so the accumulation and the pre-stamp
      // fallback (distinct (batch, key) over generations) count a
      // duplicated key identically — committed atomically with the
      // generation by the shell, so minhashStoreIsCurrent stays a
      // marker read
      sc.setJobDescription(s"neardup gate gen=$gen: admitted stamp")
      val total = graft.operators.Stores.addStamp(
        D.minhashAdmittedStamp(spark, storePath, base.keyCol),
        graft.operators.Stores.keyStamp(
          admitted.select(col(base.keyCol)).distinct(), base.keyCol))
      bb.unpersist(blocking = false)
      bsh.unpersist(blocking = false)
      Seq(intra, admitted).foreach(df =>
        graft.operators.Graph.checkpointRdd(df)
          .foreach(_.unpersist(false)))
      total
    }

  /** Streaming SEMANTIC gate — the [[streamingNearDupGate]] posture
    * for the embedding tier: every micro-batch first self-probes for
    * within-batch semantic near-dups (keep the min id —
    * [[graft.operators.Similarity.semanticIntraBatchFlags]], under
    * the index's frozen centroids), then probes the survivors against
    * the persisted IVF vector index
    * ([[graft.operators.Similarity.writeIvfStore]]'s layout), appends
    * ADMITTED rows to `admittedPath`, and admits their vectors into
    * the index (cells assigned by the index's own frozen centroids),
    * so a semantic near-dup arriving in a later micro-batch is
    * rejected against the grown index — and the admitted set is
    * near-dup-free regardless of batch boundaries.
    *
    * Scale shape per micro-batch = the q147 probe: the batch assigns
    * against the broadcast-bounded centroid set and broadcasts into
    * the cell join, so the store vectors stream in place (PlanAuditSpec
    * pins this); the store parquet is re-read per batch — the corpus
    * is never re-assigned. Micro-batches serialize through
    * foreachBatch, so index append and next-batch probe cannot race.
    *
    * EXACTLY-ONCE under replay by the [[streamingNearDupGate]]
    * protocol: decide-once probes (base index + generations strictly
    * before this batch id), per-batch OVERWRITE generations for both
    * the admitted sink and the index vectors, and the `gatelog`
    * committed-batch marker. */
  def streamingSemanticGate(spark: SparkSession, stream: DataFrame,
                            vecCol: String, storePath: String,
                            admittedPath: String, checkpoint: String,
                            threshold: Double = 0.999): StreamingQuery =
    runGateWire(spark, stream, storePath, checkpoint) { (batch, gen) =>
      import org.apache.spark.sql.functions.col
      val S = graft.operators.Similarity
      val base = S.readIvfStoreBase(spark, storePath)
      val vectors = graft.operators.Stores.withGenerations(spark,
        storePath, "vectors", base.vectors, gen, strict = true)
      // the batch is assigned exactly ONCE per micro-batch: this
      // CACHED frame feeds the intra pass, the store probe, AND
      // the admission append (the near-dup gate's sign-once rule);
      // the distinct() inside the cached node is the set-semantics
      // guard (the near-dup gate's rule — see that wire)
      val rows = S.ivfStoreRows(batch, base.idCol, vecCol,
        base.centroids).distinct().cache()
      // intra-batch pass FIRST (the near-dup gate's rule for the
      // embedding tier): two semantic near-dups arriving in one
      // micro-batch would both admit against an index containing
      // neither — self-probe the batch within the index's own
      // cells and keep the min id before the store probe.
      val intra = S.semanticIntraFlagsCore(rows, base.idCol,
        threshold).localCheckpoint(true)
      val survRows = rows.join(intra, Seq(base.idCol), "left_anti")
      val flagged = S.semanticProbeCore(survRows, vectors,
          base.idCol, threshold)
        .select(col("b").as(base.idCol))
      val admitted = batch
        .join(intra, Seq(base.idCol), "left_anti")
        .join(flagged, Seq(base.idCol), "left_anti")
        .localCheckpoint(true)
      // always overwrite this generation (the near-dup gate's
      // orphan-clobber rule)
      admitted.write.mode("overwrite")
        .parquet(s"$admittedPath/batch=$gen")
      S.writeGateVectors(
        rows.join(admitted.select(col(base.idCol)),
          Seq(base.idCol), "left_semi"),
        storePath, gen)
      // running admitted stamp, committed with the generation by the
      // shell (the near-dup gate's rule, including its per-batch
      // DISTINCT — see that wire's stamp note)
      val total = graft.operators.Stores.addStamp(
        S.ivfAdmittedStamp(spark, storePath, base.idCol),
        graft.operators.Stores.keyStamp(
          admitted.select(col(base.idCol)).distinct(), base.idCol))
      rows.unpersist(blocking = false)
      Seq(intra, admitted).foreach(df =>
        graft.operators.Graph.checkpointRdd(df)
          .foreach(_.unpersist(false)))
      total
    }

  /** Streaming Count-Min fold — the sketch-store posture of the gate
    * above: every micro-batch's increments fold into the persisted
    * grid by counter addition ([[graft.operators.CountMin
    * .foldIntoStore]]), so the store always summarizes the stream so
    * far and point estimates come from reading the kilobyte grid, not
    * from any reprocessing. Because the fold is exactly the batch
    * merge algebra, the drained store equals the grid a single batch
    * build over the concatenated stream would produce (StreamingSpec
    * pins this) — the streaming and batch answers cannot drift.
    * Micro-batches serialize through foreachBatch, so read-merge-write
    * on the store cannot race, and the foreachBatch id is stamped
    * into the store write itself, so foreachBatch's at-least-once
    * replay of a committed batch is a no-op (the fold stays exact
    * across failure recovery — see [[graft.operators.Stores]]). */
  def streamingCountMinFold(spark: SparkSession, stream: DataFrame,
                            valueCol: String, storePath: String,
                            checkpoint: String, depth: Int,
                            width: Int): StreamingQuery = {
    // the gate wires' incarnation protocol (see incarnation): a fresh
    // checkpoint restarts foreachBatch ids at 0, but the store's
    // stamp horizon survives from prior incarnations — without the
    // mapping, the new stream's first batches would read as replays
    val id = incarnation(spark, checkpoint, s"$storePath/cells")
    requireHorizonOwned(spark, id, s"$storePath/cells")
    val inc = id.inc
    val seen = new java.util.concurrent.atomic.AtomicLong(
      inc.committedThrough)
    stream.writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        recordIntent(spark, checkpoint, id, seen, batchId)
        val gen = inc.gen(batchId)
        // the gates' gen == stamp disambiguation, fold-store variant:
        // own crash-window commit (token matches, or untagged
        // pre-token commit) replays as foldIntoStore's no-op skip; a
        // foreign post-token stream's commit fails loudly here
        // instead of silently dropping the batch
        if (gen == graft.operators.Stores.lastApplied(
            spark, s"$storePath/cells"))
          requireOwnSlot(spark, id, s"$storePath/cells", gen,
            tolerateUntagged = true)
        graft.operators.CountMin.foldIntoStore(batch, valueCol,
          storePath, depth, width, batchId = Some(gen),
          writer = Option(id.writer).filter(_.nonEmpty))
      }
      .start()
  }

  /** Fold every micro-batch into a persisted bottom-k quantile sketch
    * (the [[streamingCountMinFold]] posture for the rank summary).
    * The fold algebra — union, collapse re-folded keys, re-take
    * bottom-k under the manifest's k — is associative, so for a
    * stream whose keys are unique the drained store equals the
    * batch-built sketch of the concatenated stream regardless of
    * micro-batch boundaries (StreamingSpec pins it); a key arriving
    * twice — within one batch or across batches — collapses under
    * the store's deterministic min-value policy rather than being
    * double-sampled. Replay-idempotent via the stamped foreachBatch
    * id ([[graft.operators.Stores]]). */
  def streamingQuantileFold(spark: SparkSession, stream: DataFrame,
                            keyCol: String, valueCol: String,
                            storePath: String, checkpoint: String,
                            k: Int): StreamingQuery = {
    val id = incarnation(spark, checkpoint, s"$storePath/rows")
    requireHorizonOwned(spark, id, s"$storePath/rows")
    val inc = id.inc
    val seen = new java.util.concurrent.atomic.AtomicLong(
      inc.committedThrough)
    stream.writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        recordIntent(spark, checkpoint, id, seen, batchId)
        val gen = inc.gen(batchId)
        // gen == stamp ownership, fold-store variant (see the
        // Count-Min wire)
        if (gen == graft.operators.Stores.lastApplied(
            spark, s"$storePath/rows"))
          requireOwnSlot(spark, id, s"$storePath/rows", gen,
            tolerateUntagged = true)
        graft.operators.QuantileSketch.foldIntoStore(batch, keyCol,
          valueCol, storePath, k, batchId = Some(gen),
          writer = Option(id.writer).filter(_.nonEmpty))
      }
      .start()
  }

  /** Streaming drift monitor (★ — the q183 PSI monitor run as an
    * ingestion stream would run it: every micro-batch's length
    * buckets fold into a persisted exact histogram
    * ([[graft.operators.Audit.histogramFoldIntoStore]]), and the
    * alert path reads the KILOBYTE store against the reference
    * histogram through [[graft.operators.Audit.psiTerms]] — the
    * arriving corpus is never reprocessed. The fold is counter
    * addition, so the drained store's PSI equals the batch PSI over
    * the concatenated stream regardless of micro-batch boundaries
    * (StreamingSpec pins it), including across foreachBatch's
    * at-least-once replays (the foreachBatch id is stamped into the
    * store write — [[graft.operators.Stores]]). */
  def streamingDriftFold(spark: SparkSession, stream: DataFrame,
                         bucketCol: String, storePath: String,
                         checkpoint: String): StreamingQuery = {
    val id = incarnation(spark, checkpoint, storePath)
    requireHorizonOwned(spark, id, storePath)
    val inc = id.inc
    val seen = new java.util.concurrent.atomic.AtomicLong(
      inc.committedThrough)
    stream.writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        recordIntent(spark, checkpoint, id, seen, batchId)
        val gen = inc.gen(batchId)
        // gen == stamp ownership, fold-store variant (see the
        // Count-Min wire)
        if (gen == graft.operators.Stores.lastApplied(spark, storePath))
          requireOwnSlot(spark, id, storePath, gen,
            tolerateUntagged = true)
        graft.operators.Audit.histogramFoldIntoStore(batch, bucketCol,
          storePath, batchId = Some(gen),
          writer = Option(id.writer).filter(_.nonEmpty))
      }
      .start()
  }
}
