package graft

import graft.operators.BloomJoin
import graft.plans.BloomMightContain
import org.apache.spark.sql.functions._

/** The Bloom pre-filter must move work without moving the answer:
  * semi/anti results identical to the plain joins, the pre-filter
  * genuinely selective, and the predicate codegen'd into the scan. */
class BloomJoinSpec extends SparkSpecBase {
  import spark.implicits._

  private def probe = Tables.orders(spark, sf)
    .select(col("o_orderkey"), col("o_custkey"))
  private def build = Tables.customer(spark, sf)
    .filter(col("c_custkey") % 10 === 3)
    .select(col("c_custkey"))

  test("bloomSemiJoin equals the plain left-semi join") {
    // exceptAll compares positionally and a USING join fronts the key —
    // re-project the plain twin to probe's column order
    val plain = probe.join(
      build.select(col("c_custkey").as("o_custkey")), Seq("o_custkey"),
      "left_semi").select(col("o_orderkey"), col("o_custkey"))
    val bloomed = BloomJoin.bloomSemiJoin(probe, build,
      "o_custkey", "c_custkey", expectedItems = 10000)
    assertBagEqual(bloomed, plain)
  }

  test("bloomAntiJoin equals the plain left-anti join") {
    val plain = probe.join(
      build.select(col("c_custkey").as("o_custkey")), Seq("o_custkey"),
      "left_anti").select(col("o_orderkey"), col("o_custkey"))
    val bloomed = BloomJoin.bloomAntiJoin(probe, build,
      "o_custkey", "c_custkey", expectedItems = 10000)
    assertBagEqual(bloomed, plain)
  }

  test("the pre-filter is selective: survivors ≈ matches, not |probe|") {
    val bloom = BloomJoin.buildFilter(build, "c_custkey",
      expectedItems = 10000, fpp = 0.01)
    val survivors = probe
      .filter(BloomMightContain.column(col("o_custkey"), bloom)).count()
    val matches = probe.join(
      build.select(col("c_custkey").as("o_custkey")), Seq("o_custkey"),
      "left_semi").count()
    val total = probe.count()
    // ~10% of customers are in the build side; survivors must be the
    // matching rows plus at most an fpp-sized sliver of the rest
    assert(survivors >= matches, "bloom dropped a true match")
    assert(survivors <= matches + (0.05 * total).toLong,
      s"bloom pruned nothing: $survivors survivors of $total for $matches matches")
  }

  test("string keys and null keys behave like the exact join") {
    val p = Seq(("a", 1), ("b", 2), (null.asInstanceOf[String], 3), ("d", 4))
      .toDF("k", "v")
    val b = Seq("a", "d", "e").toDF("bk")
    val plain = p.join(b.select(col("bk").as("k")), Seq("k"), "left_semi")
    val bloomed = BloomJoin.bloomSemiJoin(p, b, "k", "bk", expectedItems = 100)
    assertBagEqual(bloomed, plain)
    // null key never matches (semi-join semantics), and never crashes
    assert(!bloomed.select("v").as[Int].collect().contains(3))
  }

  test("bloomAntiJoin keeps null-key rows, like the plain left-anti join") {
    val p = Seq(("a", 1), ("b", 2), (null.asInstanceOf[String], 3), ("d", 4))
      .toDF("k", "v")
    val b = Seq("a", "d", "e").toDF("bk")
    val plain = p.join(b.select(col("bk").as("k")), Seq("k"), "left_anti")
    val bloomed = BloomJoin.bloomAntiJoin(p, b, "k", "bk", expectedItems = 100)
    assertBagEqual(bloomed.select("k", "v"), plain.select("k", "v"))
    // the null-key row is a definite non-match: anti-join KEEPS it
    assert(bloomed.select("v").as[Int].collect().contains(3))
  }

  test("the predicate participates in whole-stage codegen at the scan") {
    val bloom = BloomJoin.buildFilter(build, "c_custkey",
      expectedItems = 1000, fpp = 0.01)
    val plan = probe
      .filter(BloomMightContain.column(col("o_custkey"), bloom))
      .queryExecution.executedPlan.toString
    // executedPlan.toString marks whole-stage codegen spans with "*(n)"
    assert(plan.linesIterator.exists(l =>
        l.contains("Filter bloom_might_contain") && l.trim.startsWith("*")),
      s"bloom filter not inside a codegen span:\n$plan")
  }
}
