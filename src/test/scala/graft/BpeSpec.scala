package graft

import graft.operators.Bpe
import org.apache.spark.sql.functions._

/** BPE merge learning: hand-computed merges, leftmost-greedy overlap
  * semantics, early exhaustion, and partitioning invariance. */
class BpeSpec extends SparkSpecBase {

  test("hand-computed merges with deterministic tie-break and exhaustion") {
    import spark.implicits._
    // words: aa x3, ab x1, b x1
    val docs = Seq((1L, "aa aa ab"), (2L, "aa b")).toDF("doc_id", "text")
    val got = Bpe.learnMerges(docs, "text", 4).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4)))
    // iter1: (a,a)x3 beats (a,b)x1; iter2 only (a,b) remains; then
    // every word is a single token — k=4 requested, 2 learnable
    assert(got.toSeq == Seq((1, "a", "a", "aa", 3L), (2, "a", "b", "ab", 1L)))
  }

  test("leftmost-greedy merge: a new token can absorb the next element") {
    import spark.implicits._
    val docs = Seq((1L, "aaaa")).toDF("doc_id", "text")
    val got = Bpe.learnMerges(docs, "text", 2).collect()
      .map(r => (r.getInt(0), r.getString(3), r.getLong(4)))
    // (a,a) counts 3 overlapping pairs; the fold merges [aa, aa], so
    // round 2 learns (aa,aa) with count 1 — the standard BPE scan
    assert(got.toSeq == Seq((1, "aa", 3L), (2, "aaaa", 1L)))
  }

  test("non-charset words are excluded; merges invariant to partitioning") {
    import spark.implicits._
    val docs = (0L until 40L).map(i =>
      (i, (0 to 12).map(j => s"w${(i + j * 3) % 9}x${(i * j) % 5}")
        .mkString(" ") + " Bad-Tok!"))
      .toDF("doc_id", "text")
    val a = Bpe.learnMerges(docs, "text", 5)
    val b = Bpe.learnMerges(docs.repartition(13), "text", 5)
    assertBagEqual(a, b)
    assert(a.count() == 5)
    // the filtered token never contributes a pair
    assert(!a.collect().exists(r =>
      r.getString(3).exists(c => !c.isLetterOrDigit)))
  }

  test("segmentText isolates spaceless-script runs; segmented BPE " +
      "learns merges inside them") {
    import spark.implicits._
    // mixed line: latin words, a CJK run, a Thai run — segmentation
    // must isolate the runs as words and leave latin untouched
    val seg = Seq(Tuple1("see 数据清洗 and ขอมล here"))
      .toDF("t")
      .select(graft.functions.TextFunctions.segmentText(col("t")))
      .head.getString(0)
    assert(seg === "see 数据清洗 and ขอมล here")
    val glued = Seq(Tuple1("ab数据cd")).toDF("t")
      .select(graft.functions.TextFunctions.segmentText(col("t")))
      .head.getString(0)
    assert(glued === "ab 数据 cd", s"run not isolated: '$glued'")
    // a pure-CJK corpus: without segmentation the whole line is one
    // non-charset pseudo-word and nothing trains; with it, the run
    // character-splits and the frequent pair merges
    val docs = Seq((1L, "数据数据"), (2L, "数据清洗")).toDF("doc_id", "text")
    assert(Bpe.learnMerges(docs, "text", 2).collect().isEmpty)
    val merges = Bpe.learnMerges(docs, "text", 2, segment = true)
      .collect().map(r => (r.getInt(0), r.getString(3), r.getLong(4)))
    // (数,据) appears 3x (twice in 数据数据, once in 数据清洗)
    assert(merges.head === ((1, "数据", 3L)), merges.mkString(","))
    // encoded fertility on the segmented corpus is measured, not the
    // one-pseudo-word degenerate value
    val enc = Bpe.encodedLengths(docs, "doc_id", "text", 2,
        segment = true)
      .collect().map(r => r.getLong(0) -> r.getDouble(5)).toMap
    assert(enc(1L) < 2.0 && enc(1L) >= 1.0, s"fertility ${enc(1L)}")
  }

  test("encoded lengths: counts follow the learned segmentation") {
    import spark.implicits._
    // after 1 merge (a,a): aa→[aa](1), ab→[a,b](2), b→[b](1)
    val docs = Seq((1L, "aa aa ab"), (2L, "aa b")).toDF("doc_id", "text")
    val got = Bpe.encodedLengths(docs, "doc_id", "text", 1).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))))
      .toMap
    // doc1: words aa,aa,ab → chars 6, bpe tokens 1+1+2 = 4
    assert(got(1L) == ((3L, 6L, 4L, 1.5)))
    // doc2: aa,b → chars 3, tokens 1+1 = 2
    assert(got(2L) == ((2L, 3L, 2L, 1.5)))
  }

  test("vocabSweep: rank 0 is the character split; subwords shrink and " +
    "compression grows monotonically along the sweep") {
    val docs = Tables.documents(spark, sf).limit(150)
    val rows = Bpe.vocabSweep(docs, "text", Seq(0, 2, 4)).collect()
    assert(rows.map(_.getInt(0)).toSeq === Seq(0, 2, 4))
    val r0 = rows(0)
    // character split: every subword is 1 char
    assert(r0.getAs[Long]("total_subwords") === r0.getAs[Long]("total_chars"))
    val subs = rows.map(_.getAs[Long]("total_subwords"))
    assert(subs.sliding(2).forall(p => p(1) <= p(0)),
      s"subword totals not monotone: ${subs.toSeq}")
    val comp = rows.map(_.getAs[Double]("compression"))
    assert(comp.sliding(2).forall(p => p(1) >= p(0)),
      s"compression not monotone: ${comp.toSeq}")
    // words and chars are invariant across ranks
    assert(rows.map(_.getAs[Long]("total_words")).distinct.length === 1)
    assert(rows.map(_.getAs[Long]("total_chars")).distinct.length === 1)
  }

  test("vocabSweep snapshot at rank k matches a fresh k-merge encode") {
    import spark.implicits._
    val docs = Seq((1L, "aa aa ab ba"), (2L, "aa b abab")).toDF("id", "text")
    val sweep = Bpe.vocabSweep(docs, "text", Seq(0, 2)).collect()
      .map(r => r.getInt(0) -> r.getAs[Long]("total_subwords")).toMap
    val direct = Bpe.encodedLengths(docs, "id", "text", 2)
      .agg(org.apache.spark.sql.functions.sum("n_bpe_tokens"))
      .head().getLong(0)
    assert(sweep(2) === direct)
  }
}
