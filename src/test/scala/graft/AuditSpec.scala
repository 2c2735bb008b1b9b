package graft

import graft.operators.Audit
import org.apache.spark.sql.functions._

/** The constraint gate must count violations exactly — including the
  * ANSI trap where a NULL predicate result would silently pass. */
class AuditSpec extends SparkSpecBase {
  import spark.implicits._

  private lazy val rows = Seq(
    (1L, Some(10.0), "ok"),
    (2L, Some(-5.0), "ok"),      // range violation
    (3L, None, "ok"),            // NULL price: range check must flag it
    (3L, Some(7.0), "bad"),      // duplicate key + bad status
    (4L, Some(0.0), "ok")        // boundary: > 0 fails
  ).toDF("id", "price", "status")

  test("rowChecks counts NULLs as violations, one row per check") {
    val got = Audit.rowChecks(rows, Seq(
        "price_positive" -> (col("price") > 0),
        "status_known" -> col("status").isin("ok"),
        "id_not_null" -> col("id").isNotNull))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map(
      "price_positive" -> 3L, // -5, NULL, 0
      "status_known" -> 1L,
      "id_not_null" -> 0L))
  }

  test("uniqueCheck counts extra rows per duplicated key") {
    val got = Audit.uniqueCheck(rows, "id_unique", Seq("id")).collect()(0)
    assert(got.getString(0) == "id_unique" && got.getLong(1) == 1L)
    // empty input: zero violations, not an empty/NULL result
    val empty = Audit.uniqueCheck(rows.filter(col("id") < 0), "u", Seq("id"))
      .collect()(0)
    assert(empty.getLong(1) == 0L)
  }

  test("refCheck counts orphaned fact rows") {
    val dim = Seq(1L, 2L, 3L).toDF("dim_id")
    val got = Audit.refCheck(rows, "id_in_dim", "id", dim, "dim_id")
      .collect()(0)
    assert(got.getString(0) == "id_in_dim" && got.getLong(1) == 1L) // id 4
  }

  test("audit composes all tiers into one summary") {
    val dim = Seq(1L, 2L, 3L, 4L).toDF("dim_id")
    val got = Audit.audit(rows,
        rowConstraints = Seq("price_positive" -> (col("price") > 0)),
        uniqueKeys = Seq("id_unique" -> Seq("id")),
        refs = Seq(("id_in_dim", "id", dim, "dim_id")))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("price_positive" -> 3L, "id_unique" -> 1L,
      "id_in_dim" -> 0L))
  }

  test("selectionParity: four-fifths flag, NULL-keep counts as drop, " +
      "zero-best edge") {
    val docs = Seq(
      ("en", 1), ("en", 1), ("en", 1), ("en", 1), ("en", 0),  // 4/5 keep
      ("de", 1), ("de", 0), ("de", 0), ("de", 0)              // 1/4 keep
    ).toDF("g", "keepv")
    val got = Audit.selectionParity(docs, "g", col("keepv") === 1)
      .orderBy(col("g")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getBoolean(5)))
    def r6(v: Double) = math.round(v * 1e6) / 1e6
    assert(got.toSeq === Seq(
      ("de", 4L, 1L, 0.25, r6(0.25 / 0.8), true),
      ("en", 5L, 4L, 0.8, 1.0, false)))
    // all-drop corpus: best_rate 0 -> ratio 1, no flag
    val none = Audit.selectionParity(docs, "g", lit(false))
      .collect().map(r => (r.getDouble(4), r.getBoolean(5)))
    assert(none.forall(_ == ((1.0, false))))
  }

  test("jsTokenDrift: identical token mixes score 0, disjoint ones " +
      "approach ln 2, and two-group drift is symmetric") {
    // two groups with the SAME token multiset: each group's rest IS
    // its own distribution -> every smoothed cell has p = q -> JS = 0
    val same = Seq(("a", "x x y z"), ("b", "x x y z")).toDF("src", "text")
    val s0 = Audit.jsTokenDrift(same, "src", "text", topK = 8)
      .orderBy(col("grp")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(s0.toSeq === Seq(("a", 4L, 0.0), ("b", 4L, 0.0)))

    // fully disjoint vocabularies: JS positive, bounded by ln 2
    // (Laplace smoothing over topK+1 cells flattens a 6-token group
    // hard — the expected value here is ~0.105, not the raw-ln-2 cap)
    val disj = Seq(("a", "x x y y z z"), ("b", "u u v v w w"))
      .toDF("src", "text")
    val d = Audit.jsTokenDrift(disj, "src", "text", topK = 8)
      .orderBy(col("grp")).collect().map(_.getDouble(2))
    assert(d.forall(v => v > 0.05 && v <= 0.693148), d.toSeq)
    // two groups: rest(a) = b and rest(b) = a, and JS is symmetric
    assert(d(0) === d(1))

    // invariance under repartitioning
    val r = Audit.jsTokenDrift(disj.repartition(5), "src", "text", 8)
      .orderBy(col("grp")).collect().map(_.getDouble(2))
    assert(r.toSeq === d.toSeq)
  }

  test("categoricalMi: bijective columns score NMI 1, independent " +
      "columns 0, and a constant column hits the zero-entropy guard") {
    import spark.implicits._
    val bij = Seq(("a1", "b1"), ("a1", "b1"), ("a2", "b2"), ("a2", "b2"))
      .toDF("x", "y")
    val r1 = Audit.categoricalMi(bij, "x", "y").head
    assert((r1.getLong(0), r1.getLong(1), r1.getLong(2)) === ((4L, 2L, 2L)))
    // MI = H = 2 * round(0.5 ln 2, 6) = 0.693148; NMI exactly 1
    assert(r1.getDouble(3) === 0.693148 && r1.getDouble(6) === 1.0)

    val ind = Seq(("a1", "b1"), ("a1", "b2"), ("a2", "b1"), ("a2", "b2"))
      .toDF("x", "y")
    val r2 = Audit.categoricalMi(ind, "x", "y").head
    assert(r2.getDouble(3) === 0.0 && r2.getDouble(6) === 0.0)

    val const = Seq(("a1", "b1"), ("a1", "b2")).toDF("x", "y")
    val r3 = Audit.categoricalMi(const, "x", "y").head
    assert(r3.getDouble(4) === 0.0 && r3.getDouble(6) === 0.0)
  }
}
