package graft

import graft.operators.LineFilter

/** C4 line-filter rules (Raffel et al. 2020 §2.2) pinned on
  * hand-computed documents: each line rule independently, the
  * doc-level gates, the empty-survivor md5 contract, and the
  * independence of the per-rule failure counts. */
class LineFilterSpec extends SparkSpecBase {

  private def run(docs: Seq[(Long, String)]) = {
    import spark.implicits._
    LineFilter.c4Filter(docs.toDF("id", "text"), "id", "text")
      .collect().map(r => r.getLong(0) -> r).toMap
  }

  test("line rules: terminal punctuation, min words, javascript tell") {
    val good = "this line has plenty of words here."
    val doc = Seq(
      good,                                     // kept
      "no terminal punctuation on this line",   // fails punct only
      "too short.",                             // fails words only
      "please enable javascript on this site.", // fails js only
      "another perfectly fine sentence line!",  // kept (bang terminal)
      "a third keeper line ends with quote\""   // kept (quote terminal)
    ).mkString("\n")
    val r = run(Seq((1L, doc)))(1L)
    assert(r.getAs[Long]("n_lines") === 6)
    assert(r.getAs[Long]("n_kept") === 3)
    assert(r.getAs[Long]("n_fail_punct") === 1)
    assert(r.getAs[Long]("n_fail_words") === 1)
    assert(r.getAs[Long]("n_fail_js") === 1)
    assert(r.getAs[Boolean]("doc_keep"))
  }

  test("failure counts are independent: one line can fail several rules") {
    // 2 words, no terminal punct, contains javascript: fails all three
    val r = run(Seq((1L, "javascript disabled")))(1L)
    assert(r.getAs[Long]("n_fail_punct") === 1)
    assert(r.getAs[Long]("n_fail_words") === 1)
    assert(r.getAs[Long]("n_fail_js") === 1)
    assert(r.getAs[Long]("n_kept") === 0)
  }

  test("doc gates: kept-line floor, lorem ipsum, brace tell") {
    val keeper = "this is a perfectly good sentence line."
    val three = Seq(keeper, keeper, keeper).mkString("\n")
    val two = Seq(keeper, keeper).mkString("\n")
    val r = run(Seq(
      (1L, three),                                    // keeps: 3 lines
      (2L, two),                                      // floor: only 2
      (3L, three + "\nsome lorem ipsum filler here."),// placeholder
      (4L, three + "\nvar x = { y }")))               // code tell
    assert(r(1L).getAs[Boolean]("doc_keep"))
    assert(!r(2L).getAs[Boolean]("doc_keep"))
    assert(!r(3L).getAs[Boolean]("doc_keep"))
    assert(!r(4L).getAs[Boolean]("doc_keep"))
  }

  test("empty survivor set digests the empty string (q164 contract)") {
    val r = run(Seq((1L, "nothing survives here")))(1L)
    assert(r.getAs[Long]("n_kept") === 0)
    assert(r.getAs[String]("clean_md5") ===
      "d41d8cd98f00b204e9800998ecf8427e")
  }

  test("clean_md5 digests kept lines rejoined with newline, in order") {
    val a = "first keeper line with enough words."
    val b = "second keeper line with enough words."
    val r = run(Seq((1L, Seq(a, "drop me", b).mkString("\n"))))(1L)
    val expect = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$a\n$b".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    assert(r.getAs[String]("clean_md5") === expect)
  }
}
