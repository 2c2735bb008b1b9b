package graft

import graft.operators.Skipgram
import org.apache.spark.sql.functions._

/** Skip-gram pair extraction (Mikolov et al. 2013): exact window
  * pairing with the subsample off, the compaction-widens-context
  * property, determinism under repartitioning, and the plan's
  * broadcast/TakeOrdered shape. */
class SkipgramSpec extends SparkSpecBase {

  test("window pairs with subsample off are the exact ±w cross product") {
    import spark.implicits._
    // t large => p_keep = 1 everywhere: pure windowing
    val df = Seq((1L, "a b c d")).toDF("id", "text")
    val got = Skipgram.pairs(df, "id", "text", window = 2, t = 1e9)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .toSet
    val expect = Set(
      ("a", "b", 1L), ("a", "c", 1L),
      ("b", "a", 1L), ("b", "c", 1L), ("b", "d", 1L),
      ("c", "a", 1L), ("c", "b", 1L), ("c", "d", 1L),
      ("d", "b", 1L), ("d", "c", 1L))
    assert(got === expect)
  }

  test("pair counts aggregate across documents") {
    import spark.implicits._
    val df = Seq((1L, "x y"), (2L, "x y"), (3L, "y x")).toDF("id", "text")
    val got = Skipgram.pairs(df, "id", "text", window = 1, t = 1e9)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    assert(got(("x", "y")) === 3L)
    assert(got(("y", "x")) === 3L)
  }

  test("subsampled tokens compact the sequence: survivors pair across " +
      "dropped neighbors") {
    import spark.implicits._
    // craft a corpus where 'the' is overwhelmingly frequent and the
    // rare words a/b are separated by it: with the subsample ON, some
    // (a, b) pairs can only exist via compaction (window=1 and a, b
    // are 2 apart in the raw stream)
    val noisy = (1 to 60).map(i => (i.toLong, "a the b")).toDF("id", "text")
    val got = Skipgram.pairs(noisy, "id", "text", window = 1, t = 0.02)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    // f(the) = 1/3 => p = sqrt(.02/.333) ~ 0.245: most 'the's drop;
    // a and b survive (f = 1/3 each... all three words are equally
    // frequent here, so ALL are thinned — the assertion is just that
    // compaction produced at least one direct (a, b) adjacency)
    assert(got.contains(("a", "b")) || got.contains(("b", "a")),
      s"no compacted pair surfaced: $got")
  }

  test("deterministic under repartitioning") {
    val docs = Tables.documents(spark, sf).limit(120)
    def run(df: org.apache.spark.sql.DataFrame) =
      Skipgram.pairs(df, "doc_id", "text", window = 2, t = 0.01, topK = 50)
        .collect().map(_.toSeq).toSeq
    assert(run(docs) === run(docs.repartition(13)))
  }

  test("plan: vocab frames broadcast; top-k is TakeOrdered; no " +
      "sort-merge join touches the corpus") {
    val docs = Tables.documents(spark, sf)
    val plan = Skipgram.pairs(docs, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") ||
      plan.contains("BroadcastNestedLoopJoin"),
      s"frequency/total frames are not broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"corpus-sized shuffle join crept in:\n$plan")
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-k is not TakeOrdered:\n$plan")
  }
}
