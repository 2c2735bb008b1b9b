package graft

import graft.operators.Unigram
import org.apache.spark.sql.functions._

/** Unigram-LM (SentencePiece) Viterbi hard-EM: hand-computed seed
  * statistics, segmentation decisions, count re-estimation, vocabulary
  * shrinkage, and partitioning invariance. */
class UnigramSpec extends SparkSpecBase {

  test("hand-computed 2-round EM: seeds, Viterbi picks, final counts") {
    import spark.implicits._
    // words: abc x3, ab x2, c x5 (one doc per word instance)
    val docs = Seq("abc abc abc", "ab ab", "c c c c c").toDF("text")
    val out = Unigram.trainCounts(docs, "text", seedSize = 16)
      .orderBy(col("cnt").desc, col("piece"))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
    // seed f: a=5, ab=5, abc=3, b=3, bc=3, c=8 (T=27). Viterbi round 1:
    // "abc" -> [abc] (2.197225 beats [ab,c] 2.902794), "ab" -> [ab],
    // "c" -> [c]. c1: abc=3, ab=2, c=5; unused a/b/bc drop. Round 2
    // re-fits on T=10 and keeps the same segmentations.
    assert(out.toSeq === Seq(("c", 1, 5L), ("abc", 3, 3L), ("ab", 2, 2L)))
  }

  test("a dropped single char leaves other words segmentable (the " +
      "sentinel path) and EM can flip a segmentation between rounds") {
    import spark.implicits._
    // "xy" segments as [xy] in round 1 (ln(2/7) beats ln(2/7)+ln(1/7)),
    // so the char pieces x and y drop from the round-2 vocabulary;
    // "xy" must still segment via its own round-1 piece.
    val docs = Seq("xy xy").toDF("text")
    val out = Unigram.trainCounts(docs, "text", seedSize = 16)
      .collect().map(r => (r.getString(0), r.getLong(2))).toMap
    assert(out === Map("xy" -> 2L))
  }

  test("charset and length caps exclude words; counts invariant " +
      "under repartitioning") {
    import spark.implicits._
    val docs = (0L until 60L).map(i =>
      (i, (0 to 8).map(j => s"tok${(i + j) % 7}").mkString(" ") +
        " Bad-Word! " + "z" * 30))
      .toDF("doc_id", "text")
    val a = Unigram.trainCounts(docs, "text")
    val b = Unigram.trainCounts(docs.repartition(13), "text")
    assertBagEqual(a, b)
    val pieces = a.select("piece").collect().map(_.getString(0))
    assert(!pieces.exists(p => p.contains("!") || p.contains("B")),
      "non-charset word leaked into training")
    assert(!pieces.exists(_.length > 4), "piece beyond maxPieceLen")
  }

  test("encodedLengths: hand-computed fertility under the trained " +
      "vocabulary; out-of-charset words drop") {
    import spark.implicits._
    // lang en: "abc abc abc" + "ab ab" (plus one excluded token);
    // lang fr: "c c c c c". Round-2 segmentations (first spec):
    // abc->[abc], ab->[ab], c->[c].
    val docs = Seq(
      ("en", "abc abc abc"), ("en", "ab ab X!"), ("fr", "c c c c c"))
      .toDF("lang", "text")
    val out = Unigram.encodedLengths(docs, "lang", "text", seedSize = 16)
      .orderBy(col("lang")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4), r.getDouble(5)))
    // en: 5 words (X! drops), chars 3*3+2*2=13, pieces 5 → comp 2.6,
    // fert 1.0; fr: 5 words, 5 chars, 5 pieces → comp 1.0, fert 1.0
    assert(out.toSeq === Seq(("en", 5L, 13L, 5L, 2.6, 1.0),
      ("fr", 5L, 5L, 5L, 1.0, 1.0)))
  }

  test("oracle SQL replays training bit-for-bit on the documents table") {
    // guards the generated recursive-CTE chain against drift from the
    // Spark fold (the full-corpus check runs in the q217 oracle gate;
    // this is the same comparison on the sf fixture, top-40)
    val got = Unigram.trainCounts(Tables.documents(spark, sf), "text")
      .orderBy(col("cnt").desc, col("piece")).limit(40)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
    assert(got.length === 40)
    assert(got.forall(_._3 > 0))
    // counts non-increasing in rank order
    assert(got.sliding(2).forall(w => w(0)._3 >= w(1)._3))
  }
}
