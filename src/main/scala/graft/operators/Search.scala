package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Batch retrieval scoring (training-data pipeline ★): BM25 over a
  * fixed query-term set — the lexical ranking a curation pipeline uses
  * to pull topic-relevant documents out of a crawl (and the classical
  * baseline the ANN tiers are compared against; Robertson & Zaragoza
  * 2009 is the public reference).
  *
  * Scale shape: the query terms are a LITERAL list, so per-document
  * term frequencies are per-row `filter` counts — no explode of the
  * corpus, no (doc, term) shuffle. Corpus statistics (N, total length,
  * per-term document frequency) are ONE scan collapsing to a single
  * row that broadcasts back onto the corpus (the q76/q100 pattern:
  * a metadata-sized cross, exactly the plan wanted at 100 TB). Scores
  * are a fixed-order sum over terms, rounded to 6 decimals (the cosine
  * rule) so ln's last-ulp divergence between engines is absorbed and
  * the ranking is hash-verifiable cross-engine.
  */
object Search {

  /** `(keyCol, score)` for every document with a positive score —
    * docs matching no term are dropped (their score is exactly 0).
    * `k1` saturates term frequency; `b` is length normalization. */
  def bm25(docs: DataFrame, keyCol: String, textCol: String,
           terms: Seq[String], k1: Double = 1.2,
           b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty && terms.size <= 64,
      s"terms.size=${terms.size} outside [1, 64]")
    require(terms.distinct.size == terms.size, "duplicate query terms")
    val toks = split(col(textCol), " ")
    def tf(t: String): Column =
      size(filter(toks, x => x === lit(t))).cast("double")
    // one corpus scan: N, Σ dl, and every term's document frequency
    val aggs: Seq[Column] =
      count(lit(1)).cast("double").as("n_docs") ::
        sum(size(split(col(textCol), " ")).cast("long")).cast("double")
          .as("tot_len") ::
        terms.zipWithIndex.map { case (t, i) =>
          sum(when(tf(t) > 0, 1L).otherwise(0L)).cast("double").as(s"df_$i")
        }.toList
    val stats = docs.agg(aggs.head, aggs.tail: _*)
    val dl = size(toks).cast("double")
    val avgdl = col("tot_len") / col("n_docs")
    val score = terms.zipWithIndex.map { case (t, i) =>
      val idf = log(lit(1.0) +
        (col("n_docs") - col(s"df_$i") + 0.5) / (col(s"df_$i") + 0.5))
      idf * (tf(t) * lit(k1 + 1.0)) /
        (tf(t) + lit(k1) * (lit(1.0 - b) + lit(b) * dl / avgdl))
    }.reduce(_ + _)
    docs.crossJoin(broadcast(stats))
      .select(col(keyCol), round(score, 6).as("score"))
      .filter(col("score") > 0.0)
  }
}
