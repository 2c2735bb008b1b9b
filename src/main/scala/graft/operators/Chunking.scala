package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Token-window document chunking (LLM training-data pipeline ★): the
  * pass that turns a cleaned corpus into model-sized training pieces.
  * Each document's token stream is cut into windows of `chunkSize`
  * tokens whose starts advance by `stride` (stride < chunkSize gives
  * overlapping windows — the standard context-preserving shape).
  *
  * One `transform` + `posexplode` per document — embarrassingly
  * parallel, no shuffle at all until the caller aggregates; the last
  * window is the (possibly shorter) tail so every token appears in at
  * least one chunk. Contract (mirrored in the q72 oracle): starts are
  * 1, 1+stride, … while start ≤ token count.
  */
object Chunking {

  def chunkTokenWindows(df: DataFrame, keyCol: String, textCol: String,
                        chunkSize: Int, stride: Int): DataFrame = {
    require(chunkSize >= 1, s"chunkSize=$chunkSize must be positive")
    require(stride >= 1 && stride <= chunkSize,
      s"stride=$stride must be in [1, chunkSize=$chunkSize]")
    val toks = split(col(textCol), " ")
    val n = size(toks)
    df.select(col(keyCol), n.as("_n"),
        posexplode(transform(
          sequence(lit(1), n, lit(stride)),
          st => array_join(slice(toks, st, lit(chunkSize)), " "))))
      .select(col(keyCol),
        col("pos").cast("long").as("chunk_id"),
        (col("pos") * stride + 1).cast("long").as("start_tok"),
        least(lit(chunkSize), col("_n") - col("pos") * stride).cast("long")
          .as("n_tok"),
        col("col").as("chunk"))
  }

  /** Sequence packing (concat-and-chunk — the GPT-style pretraining
    * layout): within each `groupCol` stream, documents ordered by
    * `keyCol` form one concatenated token stream that is cut into
    * fixed `seqLen`-token training sequences; a document that straddles
    * a boundary contributes its tokens to BOTH sequences. Output is
    * the (document × sequence) contribution map — one row per training
    * sequence a document feeds, with the token count it contributes —
    * which is what a loader needs to materialize sequences and what an
    * attribution audit needs to trace a sequence back to its sources.
    *
    * Scale shape: token offsets are a running sum over ONE window sort
    * per group (groups — language, source shard — keep the sort
    * partition-parallel; there is deliberately no global-order
    * variant), then a narrow `sequence()` explode. All arithmetic in
    * exact longs, so the map is hash-verifiable cross-engine. */
  def packSequences(df: DataFrame, groupCol: String, keyCol: String,
                    textCol: String, seqLen: Int): DataFrame = {
    require(seqLen >= 1, s"seqLen=$seqLen must be positive")
    val n = size(split(col(textCol), " ")).cast("long")
    val w = Window.partitionBy(col(groupCol)).orderBy(col(keyCol))
    val endTok = sum(n).over(w) // cumulative, inclusive of this doc
    df.select(col(groupCol), col(keyCol), n.as("_n"), endTok.as("_end"))
      .withColumn("_start", col("_end") - col("_n")) // 0-based offset
      .select(col(groupCol), col(keyCol), col("_start"), col("_end"),
        explode(sequence(
          expr("_start div " + seqLen.toLong),
          expr("(_end - 1) div " + seqLen.toLong))).as("seq_id"))
      .select(col(groupCol), col(keyCol), col("seq_id"),
        (least(col("_end"), (col("seq_id") + 1) * seqLen) -
          greatest(col("_start"), col("seq_id") * seqLen)).as("n_tok"))
  }

  /** Content-defined chunking (the FastCDC/rolling-hash idea at token
    * granularity): cut AFTER every "anchor" token — one whose
    * portable hash ≡ 0 (mod `gate`) — so boundaries are a pure
    * function of CONTENT, not position. Insert or delete a paragraph
    * and every chunk outside the edited region keeps its identity
    * (same tokens ⇒ same anchors ⇒ same md5), which is what makes
    * chunk-level dedup/caching survive document edits; fixed windows
    * ([[chunkTokenWindows]]) shift everything downstream of an edit.
    * Expected chunk length = `gate` tokens.
    *
    * Output per chunk: `(keyCol, chunk_id, n_tokens, chunk_md5)`.
    * Scale shape: one narrow posexplode, ONE per-document window
    * (hash-partitioned prefix count of anchors), one groupBy — the
    * same budget as the fixed-window pass plus the boundary window. */
  def contentDefinedChunks(df: DataFrame, keyCol: String, textCol: String,
                           gate: Int = 16): DataFrame = {
    require(gate >= 2, s"gate=$gate — every token an anchor is no chunking")
    val t = df
      .select(col(keyCol), posexplode(split(col(textCol), " "))
        .as(Seq("pos", "tok")))
      .withColumn("anchor",
        (pmod(graft.functions.Scalars.portableHash64(col("tok")),
          lit(gate)) === 0).cast("long"))
    val before = Window.partitionBy(col(keyCol)).orderBy(col("pos"))
      .rowsBetween(Window.unboundedPreceding, -1)
    t.withColumn("chunk_id",
        coalesce(sum(col("anchor")).over(before), lit(0L)))
      .groupBy(col(keyCol), col("chunk_id"))
      .agg(count(lit(1)).as("n_tokens"),
        md5(array_join(transform(
          array_sort(collect_list(struct(col("pos"), col("tok")))),
          x => x("tok")), " ")).as("chunk_md5"))
  }
}
