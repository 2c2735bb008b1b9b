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

  test("frontier: robots gate, max-priority collapse, politeness cap, " +
    "global budget") {
    import spark.implicits._
    val cands = Seq(
      ("https://a.test/p/1", 10L),
      ("https://a.test/p/1", 90L),   // re-discovered: max wins
      ("https://a.test/p/2", 80L),
      ("https://a.test/p/3", 70L),
      ("https://a.test/p/4", 60L),   // 4th of host a: cut by cap 3
      ("https://b.test/x", 50L),
      ("https://c.test/bad/1", 99L)  // disallowed host: robots cut
    ).toDF("url", "priority")
    val rules = Seq(("c.test", "/", false))
    val wave = Robots.frontier(cands, "url", "priority", rules,
        perHostCap = 3, budget = 4)
      .collect().map(r => (r.getString(0), r.getLong(2), r.getInt(3)))
    assert(wave.toSeq === Seq(
      ("https://a.test/p/1", 90L, 1),
      ("https://a.test/p/2", 80L, 2),
      ("https://a.test/p/3", 70L, 3),
      ("https://b.test/x", 50L, 1)))
    // budget tighter than survivors: top-N by (priority desc, url)
    val tight = Robots.frontier(cands, "url", "priority", rules,
        perHostCap = 3, budget = 2)
      .collect().map(_.getString(0))
    assert(tight.toSeq ===
      Seq("https://a.test/p/1", "https://a.test/p/2"))
  }

  test("frontier plans TakeOrdered for the budget and no " +
    "single-partition window") {
    import spark.implicits._
    val cands = (1 to 200).map(i =>
      (s"https://h${i % 20}.test/p/$i", i.toLong)).toDF("url", "priority")
    val plan = Robots.frontier(cands, "url", "priority",
        Seq(("h0.test", "/", false)), 3, 50)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"budget is not TakeOrdered:\n$plan")
    // the politeness window partitions by host — a global empty
    // partition spec would serialize the frontier through one task
    assert(!plan.contains("Window [") ||
      plan.contains("windowspecdefinition(host"),
      s"window lost its host partitioning:\n$plan")
  }
}
