package graft

import graft.operators.Similarity
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSpecBase {
  import spark.implicits._

  test("cosine matches a hand computation") {
    val df = Seq((Array(1.0, 0.0, 1.0), Array(1.0, 1.0, 0.0)))
      .toDF("a", "b")
    val sim = df.select(Similarity.cosine(col("a"), col("b"))).head.getDouble(0)
    assert(math.abs(sim - 0.5) < 1e-12) // dot=1, norms=sqrt(2)*sqrt(2)
  }

  test("native codegen cosine is bit-identical to the HOF baseline") {
    val e = Tables.embeddings(spark, sf).limit(200)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val pairs = e.alias("x").join(e.alias("y"),
      col("x.vec_id") < col("y.vec_id"))
    val diffs = pairs.select(
        Similarity.cosine(col("x.v"), col("y.v")).as("native"),
        Similarity.cosineHof(col("x.v"), col("y.v")).as("hof"))
      .filter(col("native") =!= col("hof"))
    assert(diffs.isEmpty)
  }

  test("cosine_sim is SQL-callable via GraftExtensions") {
    val s2 = spark.newSession()
    // extension injection happens at session build
    // (spark.sql.extensions=graft.plans.GraftExtensions); for a live
    // session, register through the function registry directly
    s2.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cosine_sim",
      exprs => graft.plans.CosineSimilarity(exprs.head, exprs(1)),
      "scala_udf")
    val r = s2.sql(
      "SELECT cosine_sim(array(1.0d, 0.0d), array(1.0d, 0.0d)) AS s")
      .head.getDouble(0)
    assert(math.abs(r - 1.0) < 1e-12)
  }

  test("LSH top-k finds planted near-duplicate vectors") {
    // Random 64-d vectors are near-orthogonal — every candidate looks
    // alike, so exact-top-k recall there measures noise, not the
    // operator. Plant true neighbors instead: exact copies under new
    // ids MUST land in the query's own bucket and rank first.
    val e = Tables.embeddings(spark, sf)
    val queries = e.filter(col("vec_id") < 16)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    val planted = e.filter(col("vec_id") < 16)
      .select((col("vec_id") + 10000).as("c_id"), col("embedding").as("c_vec"))
    val corpus = e.select(col("vec_id").as("c_id"), col("embedding").as("c_vec"))
      .unionByName(planted)
    val top1 = Similarity.lshTopK(queries, corpus, 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val hits = (0L until 16L).count(q => top1.get(q).contains(q + 10000))
    assert(hits == 16, s"only $hits/16 planted duplicates found at rank 1")
  }

  test("Aggregator top-k equals the window top-k plan") {
    val e = Tables.embeddings(spark, sf)
    val queries = e.filter(col("vec_id") < 8)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    val corpus = e.select(col("vec_id").as("c_id"), col("embedding").as("c_vec"))
    val win = Similarity.bruteForceTopK(queries, corpus, 5)
      .select("q_id", "c_id", "sim")
    val agg = Similarity.bruteForceTopKAgg(queries, corpus, 5)
      .select("q_id", "c_id", "sim")
    assertBagEqual(win, agg)
  }

  test("IVF top-k finds planted duplicates through cell assignment") {
    val e = Tables.embeddings(spark, sf)
    val queries = e.filter(col("vec_id") < 16)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    val planted = e.filter(col("vec_id") < 16)
      .select((col("vec_id") + 10000).as("c_id"), col("embedding").as("c_vec"))
    val corpus = e.select(col("vec_id").as("c_id"), col("embedding").as("c_vec"))
      .unionByName(planted)
    val top1 = Similarity.ivfTopK(queries, corpus, 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val hits = (0L until 16L).count(q => top1.get(q).contains(q + 10000))
    assert(hits == 16, s"only $hits/16 planted duplicates found at rank 1")
  }

  test("brute-force top-k respects k and excludes self") {
    val e = Tables.embeddings(spark, sf)
    val queries = e.filter(col("vec_id") < 4)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    val corpus = e.select(col("vec_id").as("c_id"), col("embedding").as("c_vec"))
    val r = Similarity.bruteForceTopK(queries, corpus, 3).collect()
    assert(r.groupBy(_.getLong(0)).forall(_._2.length <= 3))
    assert(r.forall(row => row.getLong(0) != row.getLong(1)))
  }
}
