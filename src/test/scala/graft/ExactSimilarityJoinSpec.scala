package graft

import graft.operators.{Dedup, EditDistanceJoin}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The two EXACT sub-quadratic similarity joins must equal their
  * brute-force counterparts — losslessness is their whole contract
  * (the q94/q95 oracles assert the same against DuckDB; these specs
  * add the adversarial edges the corpus doesn't produce). */
class ExactSimilarityJoinSpec extends SparkSpecBase {
  import spark.implicits._

  // --- prefix-filtered Jaccard ---

  private def bruteJaccard(df: DataFrame, threshold: Double): DataFrame = {
    val toks = df.select(col("doc_id"),
        array_distinct(split(col("text"), " ")).as("toks"))
      .filter(size(col("toks")) > 0)
    val a = toks.select(col("doc_id").as("a"), col("toks").as("ta"))
    val b = toks.select(col("doc_id").as("b"), col("toks").as("tb"))
    val inter = size(array_intersect(col("ta"), col("tb")))
    a.crossJoin(b).filter(col("a") < col("b"))
      .select(col("a"), col("b"), (inter.cast("double") /
        (size(col("ta")) + size(col("tb")) - inter).cast("double"))
        .as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  private lazy val jacCorpus = {
    val d = Tables.documents(spark, sf).select(col("doc_id"), col("text"))
    val nearDup = d.filter(col("doc_id") % 3 === 0)
      .select((col("doc_id") + 1000000).as("doc_id"),
        expr("substring(text, instr(text, ' ') + 1)").as("text"))
    d.unionByName(nearDup).cache()
  }

  test("prefixJaccardPairs equals brute force on the corpus") {
    val got = Dedup.prefixJaccardPairs(jacCorpus, "doc_id", "text", 0.5)
    val want = bruteJaccard(jacCorpus, 0.5)
    assert(want.count() > 0, "expected synthesized near-dup pairs")
    assertBagEqual(got, want)
  }

  test("prefixJaccardPairs with shingles equals the brute shingle join") {
    // ngramJaccardPairs IS the exact all-pairs shingle join (q31's
    // oracle-verified tier) — the prefix-filtered form must match it
    for (t <- Seq(0.5, 0.8)) {
      assertBagEqual(
        Dedup.prefixJaccardPairs(jacCorpus, "doc_id", "text", t, shingleK = 3),
        Dedup.ngramJaccardPairs(jacCorpus, "doc_id", "text", 3, t))
    }
  }

  test("prefixJaccardPairs handles duplicates, singletons, threshold 1.0") {
    val docs = Seq(
      (1L, "the quick brown fox"),
      (2L, "the quick brown fox"),        // exact dup, J = 1
      (3L, "fox brown quick the"),        // permutation, J = 1
      (4L, "lonely"),                     // single token
      (5L, "lonely"),                     // J = 1 with 4
      (6L, "the the the"),                // collapses to one token
      (7L, "entirely different words here")).toDF("doc_id", "text")
    for (t <- Seq(0.4, 1.0)) {
      assertBagEqual(
        Dedup.prefixJaccardPairs(docs, "doc_id", "text", t),
        bruteJaccard(docs, t))
    }
  }

  // --- edit-distance join ---

  private def bruteEdit(df: DataFrame, d: Int): DataFrame = {
    val a = df.select(col("key").as("a"), col("name").as("na"))
    val b = df.select(col("key").as("b"), col("name").as("nb"))
    a.crossJoin(b).filter(col("a") < col("b"))
      .select(col("a"), col("b"),
        levenshtein(col("na"), col("nb")).as("dist"))
      .filter(col("dist") <= d)
  }

  test("editDistancePairs equals brute force on part names") {
    val p = Tables.part(spark, sf)
      .select(col("p_partkey").as("key"), col("p_name").as("name"))
    val typo = p.filter(col("key") % 3 === 0)
      .select((col("key") + 1000000).as("key"),
        concat(expr("substring(name, 1, 2)"),
          expr("substring(name, 4)")).as("name"))
    val names = p.unionByName(typo)
    for (d <- Seq(1, 2)) {
      val got = EditDistanceJoin.editDistancePairs(names, "key", "name", d)
      val want = bruteEdit(names, d)
      assert(want.count() > 0)
      assertBagEqual(got, want)
    }
  }

  test("editDistancePairs covers short strings, empties, and ties") {
    val rows = Seq(
      (1L, ""), (2L, "a"), (3L, "ab"), (4L, "ba"), (5L, "abcd"),
      (6L, "abcd"), (7L, "abxd"), (8L, "xyzw"), (9L, "abcdefgh"),
      (10L, "abcdefxh"), (11L, "hgfedcba")).toDF("key", "name")
    for (d <- Seq(1, 2, 3)) {
      assertBagEqual(
        EditDistanceJoin.editDistancePairs(rows, "key", "name", d),
        bruteEdit(rows, d))
    }
  }
}
