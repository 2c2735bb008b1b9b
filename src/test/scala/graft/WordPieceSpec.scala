package graft

import graft.operators.WordPiece
import org.apache.spark.sql.functions._

/** WordPiece likelihood-driven merges: hand-computed score argmax
  * (diverging from BPE's frequency argmax on the same corpus), the
  * `##` continuation convention, and partitioning invariance. */
class WordPieceSpec extends SparkSpecBase {

  test("hand-computed: likelihood beats frequency — WordPiece merges " +
      "the rarer, higher-score pair first") {
    import spark.implicits._
    // words: "ab" x10, "cd" x2, "a" x50, "b" x50. Round-1 unigram
    // counts: a=60, ##b=10, b=50, c=2, ##d=2. Pair (a,##b): c=10,
    // score=round(ln 10 - ln 60 - ln 10, 6)=ln(1/60)=-4.094345;
    // pair (c,##d): c=2, score=ln(2/(2*2))=ln 0.5=-0.693147.
    // BPE would take (a,##b) (count 10 > 2); WordPiece takes (c,##d).
    // Round 2: only (a,##b) remains -> merged "ab", same score.
    val docs = (Seq.fill(10)("ab") ++ Seq.fill(2)("cd") ++
      Seq.fill(50)("a") ++ Seq.fill(50)("b")).toDF("text")
    val out = WordPiece.learnMerges(docs, "text", 8)
      .orderBy(col("merge_rank")).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4), r.getDouble(5)))
    assert(out.toSeq === Seq(
      (1, "c", "##d", "cd", 2L, -0.693147),
      (2, "a", "##b", "ab", 10L, -4.094345)))
  }

  test("## convention: internal chars are distinct symbols and merged " +
      "pieces inherit the left prefix status") {
    import spark.implicits._
    // "aba" x4: toks [a, ##b, ##a]. Unigram: a=4, ##b=4, ##a=4.
    // Pairs (a,##b) c=4 and (##b,##a) c=4 tie on score
    // ln(4/16)=-1.386294; tie-break (l,r) asc picks (##b,##a) ->
    // "##ba" (continuation piece). Round 2: (a,##ba) -> "aba".
    val docs = Seq.fill(4)("aba").toDF("text")
    val out = WordPiece.learnMerges(docs, "text", 8)
      .orderBy(col("merge_rank")).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4)))
    assert(out.toSeq === Seq(
      (1, "##b", "##a", "##ba", 4L),
      (2, "a", "##ba", "aba", 4L)))
  }

  test("merges invariant under repartitioning; charset filter holds") {
    import spark.implicits._
    val docs = (0L until 60L).map(i =>
      (i, (0 to 8).map(j => s"tok${(i + j) % 7}").mkString(" ") +
        " Bad-Word!"))
      .toDF("doc_id", "text")
    val a = WordPiece.learnMerges(docs, "text", 6)
    val b = WordPiece.learnMerges(docs.repartition(13), "text", 6)
    assertBagEqual(a, b)
    val pieces = a.select("merged").collect().map(_.getString(0))
    assert(!pieces.exists(p => p.contains("!") || p.contains("B")))
  }
}
