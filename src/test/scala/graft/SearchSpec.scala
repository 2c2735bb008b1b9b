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
}
