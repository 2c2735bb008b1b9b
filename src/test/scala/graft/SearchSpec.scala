package graft

import graft.operators.Search
import org.apache.spark.sql.functions._

/** BM25 semantics: idf ordering, tf saturation, length normalization. */
class SearchSpec extends SparkSpecBase {

  private lazy val corpus = {
    import spark.implicits._
    Seq(
      (1L, "rare common common filler filler filler"),
      (2L, "common filler filler filler filler filler"),
      (3L, "common common common common filler filler"),
      (4L, "filler filler filler filler filler filler")
    ).toDF("doc_id", "text")
  }

  test("rare terms outscore common terms at equal tf") {
    val s = Search.bm25(corpus, "doc_id", "text", Seq("rare", "common"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // doc 4 matches nothing → absent (score exactly 0 is filtered)
    assert(!s.contains(4L))
    // doc 1 holds the only 'rare' hit plus 'common'; it must beat the
    // common-only docs
    assert(s(1L) > s(2L) && s(1L) > s(3L))
    // tf saturation: doc 3 has 4x the 'common' tf of doc 2 at equal
    // length — more, but nowhere near 4x more
    assert(s(3L) > s(2L) && s(3L) < 4.0 * s(2L))
  }

  test("length normalization: same tf, longer doc scores lower") {
    import spark.implicits._
    val docs = Seq(
      (1L, "hit pad pad pad"),
      (2L, "hit pad pad pad pad pad pad pad pad pad pad pad")
    ).toDF("doc_id", "text")
    val s = Search.bm25(docs, "doc_id", "text", Seq("hit"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(s(1L) > s(2L))
  }

  test("bm25 guards: empty and duplicate term sets rejected") {
    intercept[IllegalArgumentException] {
      Search.bm25(corpus, "doc_id", "text", Seq.empty)
    }
    intercept[IllegalArgumentException] {
      Search.bm25(corpus, "doc_id", "text", Seq("a", "a"))
    }
  }

  test("bigram cross-entropy: hand-computed MLE values, 1-token docs dropped") {
    import spark.implicits._
    // corpus bigrams: (a,b)x2, (a,c)x1, (b,a)x1, (c,a)x1
    //   P(b|a)=2/3, P(c|a)=1/3, P(a|b)=1, P(a|c)=1
    val docs = Seq(
      (1L, "a b"),       // -log2(2/3) = log2(3)-1
      (2L, "a c a b"),   // (-log2(1/3) - log2(1) - log2(2/3)) / 3
      (3L, "solo")       // no bigrams → dropped
    ).toDF("doc_id", "text")
    val got = Search.bigramCrossEntropy(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    assert(!got.contains(3L))
    val l23 = math.log(3.0) / math.log(2.0) - 1.0 // -log2(2/3)
    val l13 = math.log(3.0) / math.log(2.0)       // -log2(1/3)
    assert(got(1L)._1 == 1L)
    assert(math.abs(got(1L)._2 - l23) < 1e-6)
    assert(got(2L)._1 == 3L)
    assert(math.abs(got(2L)._2 - (l13 + 0.0 + l23) / 3.0) < 1e-6)
  }

  test("bigram cross-entropy is invariant under repartitioning") {
    import spark.implicits._
    val docs = (0L until 40L).map(i =>
      (i, (0 to 30).map(j => s"w${(i * 7 + j * j) % 11}").mkString(" ")))
      .toDF("doc_id", "text")
    val a = Search.bigramCrossEntropy(docs, "doc_id", "text")
    val b = Search.bigramCrossEntropy(docs.repartition(7), "doc_id", "text")
    assertBagEqual(a, b)
  }

  test("phrase search: overlaps, repeated tokens, adjacency, no false hits") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a a a b"),        // "a a" overlaps: starts 1 and 2
      (2L, "x a y a z"),      // both tokens present but never adjacent
      (3L, "key scan key scan"), // two disjoint occurrences
      (4L, "scan key"),       // reversed order is not the phrase
      (5L, "a a")             // exact-length doc
    ).toDF("doc_id", "text")
    val postings = Search.positionalPostings(docs, "doc_id", "text")
    val got = Search.phraseSearch(postings, "doc_id",
        Seq("a a", "key scan", "never here"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    assert(got(("a a", 1L)) == (2L, 1L), s"overlap miscount: $got")
    assert(got(("a a", 5L)) == (1L, 1L))
    assert(!got.contains(("a a", 2L)), "non-adjacent tokens matched")
    assert(got(("key scan", 3L)) == (2L, 1L))
    assert(!got.contains(("key scan", 4L)), "reversed order matched")
    assert(!got.keys.exists(_._1 == "never here"))
  }

  test("phrase search is invariant under postings repartitioning") {
    import spark.implicits._
    val docs = (0L until 60L).map(i =>
      (i, (0 to 40).map(j => s"w${(i * 3 + j * 5) % 7}").mkString(" ")))
      .toDF("doc_id", "text")
    val p1 = Search.positionalPostings(docs, "doc_id", "text")
    val p2 = Search.positionalPostings(docs.repartition(11), "doc_id", "text")
      .repartition(5)
    val q = Seq("w0 w5", "w1 w6 w4")
    assertBagEqual(Search.phraseSearch(p1, "doc_id", q),
      Search.phraseSearch(p2, "doc_id", q))
  }

  test("KN cross-entropy: smoothing, backoff, and OOV accounting") {
    import spark.implicits._
    val train = Seq(
      (1L, "a b a b a c"),
      (2L, "a b c a b")
    ).toDF("doc_id", "text")
    val sc = Seq(
      (10L, "a b a b"),   // all bigrams seen
      (11L, "a c x y"),   // (c,x) unseen pair, (x,y) unseen CONTEXT
      (12L, "q")          // < 2 tokens: dropped
    ).toDF("doc_id", "text")
    val got = Search.knCrossEntropy(train, sc, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))))
      .toMap
    assert(!got.contains(12L), "single-token doc must be dropped")
    val (n10, un10, oov10, x10) = got(10L)
    assert(n10 == 3 && un10 == 0 && oov10 == 0.0)
    val (n11, un11, oov11, x11) = got(11L)
    assert(n11 == 3 && un11 == 2 && math.abs(oov11 - 2.0 / 3.0) < 1e-12)
    // unseen transitions must cost more bits than all-seen text
    assert(x11 > x10 && x10 > 0.0)
    // hand-check doc 10 against the published formula (D = 0.75):
    // train bigrams: (a,b)x4 (b,a)x2 (a,c)x1 (b,c)x1 (c,a)x1; B=5, V=3
    // ctx a: tot 5, n1f 2; ctx b: tot 3, n1f 2
    // pcont(b) = (1+1)/(5+3+1) = 2/9 ; pcont(a) = (2+1)/9 = 3/9
    val pab = (4 - 0.75) / 5 + (0.75 * 2 / 5) * (2.0 / 9)
    val pba = (2 - 0.75) / 3 + (0.75 * 2 / 3) * (3.0 / 9)
    val want = -(2 * (math.log(pab) / math.log(2.0)) +
      math.log(pba) / math.log(2.0)) / 3.0
    assert(math.abs(x10 - (math.rint(want * 1e6) / 1e6)) < 1e-9,
      s"got $x10 want $want")
  }

  test("KN scores are invariant under repartitioning") {
    import spark.implicits._
    val docs = (0L until 80L).map(i =>
      (i, (0 to 30).map(j => s"t${(i * 7 + j * 11) % 13}").mkString(" ")))
      .toDF("doc_id", "text")
    val tr = docs.filter(col("doc_id") % 3 =!= 0)
    assertBagEqual(
      Search.knCrossEntropy(tr, docs, "doc_id", "text"),
      Search.knCrossEntropy(tr.repartition(7), docs.repartition(13),
        "doc_id", "text"))
  }

  test("domainExcessWeights: the domain the weak model never saw " +
      "gets the excess, weights normalize to 1") {
    import spark.implicits._
    // ref train (id % 3 != 0) covers both domains; weak train
    // (id % 9 = 1) sees ONLY domain a's bigrams -> on held-out
    // (id % 3 = 0) the weak model is lossier on b than on a
    val docs = Seq(
      (1L, "a", "x y x y"), (2L, "b", "u v u v"), (4L, "a", "x y x"),
      (5L, "b", "u v u"), (7L, "a", "y x y"), (8L, "b", "v u v"),
      (0L, "a", "x y x y"), (3L, "b", "u v u v"), (6L, "a", "x y"),
      (9L, "b", "u v")).toDF("doc_id", "src", "text")
    val out = Search.domainExcessWeights(docs, "src", "doc_id", "text",
        refTrain = col("doc_id") % 3 =!= 0,
        weakTrain = col("doc_id") % 9 === 1,
        scorePred = col("doc_id") % 3 === 0)
      .orderBy(col("grp")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(4),
        r.getDouble(5)))
    assert(out.map(_._1).toSeq === Seq("a", "b"))
    val (exA, exB) = (out(0)._3, out(1)._3)
    assert(exB > exA, s"unseen domain must carry the excess: $exA $exB")
    assert(out(1)._4 > out(0)._4, "higher excess -> higher weight")
    val wsum = out.map(_._4).sum
    assert(math.abs(wsum - 1.0) < 1e-5, s"weights must normalize: $wsum")
    // all held-out docs of each domain counted
    assert(out.map(_._2).toSeq === Seq(2L, 2L))
  }
}
