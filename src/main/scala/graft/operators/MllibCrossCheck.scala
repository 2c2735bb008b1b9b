package graft.operators

import org.apache.spark.ml.feature.{BucketedRandomProjectionLSH, HashingTF, MinHashLSH, Normalizer}
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Stock-MLlib twins of the engine's hand-rolled dedup/ANN tiers
  * (north star: "DataFrame ops + MLlib"). These exist as CROSS-CHECKS,
  * not replacements: the custom tiers (Dedup.minhashNearDupPairs,
  * Similarity.lshTopK) stay the production path — they shuffle 16-byte
  * hashed shingles instead of 2^18-dim sparse vectors and avoid the
  * fit() pass — while these give an independent implementation to hold
  * recall against (DedupSpec / SimilaritySpec) and prove the engine
  * composes with the `org.apache.spark.ml` feature pipeline.
  *
  * Model seeds are fixed; outputs are engine-deterministic but not
  * SQL-expressible → rows-only driver checks (q66/q67).
  */
object MllibCrossCheck {

  /** MinHashLSH near-dup pairs over word-shingle sets: shingles →
    * binary HashingTF vectors (set membership in 2^18 buckets) →
    * `numHashTables` min-hashes → approxSimilarityJoin, which bands
    * one hash per table (pure OR-amplification) and computes the
    * EXACT Jaccard of the hashed feature sets on candidates only —
    * the same candidates-then-verify shape as the custom tier. */
  def minhashPairs(df: DataFrame, keyCol: String, textCol: String,
                   k: Int = 3, numHashTables: Int = 8,
                   threshold: Double = 0.5,
                   numFeatures: Int = 1 << 18): DataFrame = {
    val sets = Dedup.shingles(df, keyCol, textCol, k)
      .groupBy(col(keyCol)).agg(collect_list(col("shingle")).as("sh"))
    val tf = new HashingTF().setInputCol("sh").setOutputCol("features")
      .setNumFeatures(numFeatures).setBinary(true)
    val feats = tf.transform(sets)
    val model = new MinHashLSH().setInputCol("features").setOutputCol("hashes")
      .setNumHashTables(numHashTables).setSeed(20240801L)
      .fit(feats)
    model.approxSimilarityJoin(feats, feats, 1.0 - threshold, "dist")
      .select(col(s"datasetA.$keyCol").as("a"),
        col(s"datasetB.$keyCol").as("b"),
        round(lit(1.0) - col("dist"), 6).as("jaccard"))
      .filter(col("a") < col("b"))
  }

  /** BucketedRandomProjectionLSH approximate top-k by cosine: vectors
    * are L2-normalized so Euclidean distance orders exactly like
    * cosine (d² = 2 − 2·cos on the unit sphere), then bucketed by
    * random projections; candidates come from bucket collisions only.
    * Output shape matches Similarity.lshTopK: (q_id, c_id, sim, rn). */
  def brpTopK(queries: DataFrame, corpus: DataFrame, k: Int,
              bucketLength: Double = 0.5, numHashTables: Int = 4,
              queryId: String = "q_id", queryVec: String = "q_vec",
              corpusId: String = "c_id", corpusVec: String = "c_vec"): DataFrame = {
    def unit(df: DataFrame, vec: String): DataFrame =
      new Normalizer().setInputCol("_v0").setOutputCol("_v").setP(2.0)
        .transform(df.withColumn("_v0",
          array_to_vector(col(vec).cast("array<double>"))))
        .drop("_v0")
    val c = unit(corpus, corpusVec)
    val q = unit(queries, queryVec)
    val model = new BucketedRandomProjectionLSH()
      .setInputCol("_v").setOutputCol("_h")
      .setBucketLength(bucketLength).setNumHashTables(numHashTables)
      .setSeed(20240801L)
      .fit(c)
    // 2.1 > max distance between unit vectors: the cut is the bucket
    // collision, not the radius
    val joined = model.approxSimilarityJoin(c, q, 2.1, "dist")
      .select(col(s"datasetB.$queryId").as(queryId),
        col(s"datasetA.$corpusId").as(corpusId),
        round(lit(1.0) - col("dist") * col("dist") / 2.0, 6).as("sim"))
      .filter(col(queryId) =!= col(corpusId))
    val w = Window.partitionBy(col(queryId))
      .orderBy(col("sim").desc, col(corpusId).asc)
    joined.distinct()
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
  }
}
