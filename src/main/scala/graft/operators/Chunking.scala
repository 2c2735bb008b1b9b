package graft.operators

import org.apache.spark.sql.DataFrame
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
}
