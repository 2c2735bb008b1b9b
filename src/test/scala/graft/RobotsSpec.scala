package graft

import graft.operators.Robots
import org.apache.spark.sql.functions._

/** RFC 9309 semantics: longest-match-wins, allow-wins ties, default
  * allow, and the literal-frame guards. */
class RobotsSpec extends SparkSpecBase {

  private val rules = Seq(
    ("a.test", "/", false),
    ("a.test", "/pub", true),
    ("a.test", "/pub/priv", false),
    ("b.test", "/x", false),
    ("b.test", "/x", true))

  private def verdicts(us: String*) = {
    import spark.implicits._
    Robots.evaluate(us.toDF("url"), "url", rules)
      .collect().map(r => r.getString(0) ->
        ((r.getBoolean(3), Option(r.getString(4))))).toMap
  }

  test("longest matching prefix wins, recursively overridable") {
    val v = verdicts("https://a.test/secret", "https://a.test/pub/ok",
      "https://a.test/pub/priv/x")
    assert(v("https://a.test/secret") == ((false, Some("/"))))
    assert(v("https://a.test/pub/ok") == ((true, Some("/pub"))))
    assert(v("https://a.test/pub/priv/x") == ((false, Some("/pub/priv"))))
  }

  test("equal-length allow and disallow resolve to allow") {
    assert(verdicts("https://b.test/x/1")("https://b.test/x/1") ==
      ((true, Some("/x"))))
  }

  test("no matching rule or unknown host defaults to allowed") {
    val v = verdicts("https://c.test/anything", "https://b.test/y")
    assert(v("https://c.test/anything") == ((true, None)))
    assert(v("https://b.test/y") == ((true, None)))
  }

  test("verdicts invariant under repartitioning; guards hold") {
    import spark.implicits._
    val urls = (0 until 200).map(i =>
      s"https://${Seq("a", "b", "c")(i % 3)}.test/p$i/${i % 7}")
      .toDF("url")
    assertBagEqual(
      Robots.evaluate(urls, "url", rules),
      Robots.evaluate(urls.repartition(17), "url", rules))
    intercept[IllegalArgumentException] {
      Robots.evaluate(urls, "url", Seq(("a.test", "no-slash", true)))
    }
  }
}
