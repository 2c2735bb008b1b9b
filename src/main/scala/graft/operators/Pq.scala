package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Product quantization (training-data pipeline ★ — the compression
  * half of ANN at 100 TB, Jégou et al. 2011, "Product quantization
  * for nearest neighbor search"): the embedding is split into M
  * subvectors, each subspace gets its own small k-means codebook, and
  * a vector is stored as M small codes — 64 float32 dims become M
  * bytes, which is what makes a 10¹⁰-vector index memory-resident.
  * IVF (cells, [[Similarity.ivfTopK]]) partitions the corpus; PQ
  * compresses the residents; together they are the published IVF-PQ
  * layout.
  *
  * Determinism (the q52 Lloyd discipline, transplanted to L2): seeds
  * are the lowest-id subvectors, assignment ranks by ROUND-6
  * euclidean distance with cell-ascending ties, refinement means run
  * through DECIMAL(30,18) sums (order-insensitive), and the final
  * reconstruction error folds the per-subspace squared distances in
  * subspace order before the one sqrt + round — so codes AND qerr
  * replay bit-for-bit in the SQL oracle.
  *
  * Scale shape: ONE corpus explode into (m, id, subvector) rows; the
  * codebook is M·ks rows, collect-materialized (bounded ≤ 4096 by the
  * guard) and BROADCAST into both assignment joins, so the corpus is
  * never shuffled — per-row work is M·ks rounded distances, exactly
  * the arithmetic a production PQ encoder does. Lloyd refinement adds
  * one (m, cell, pos)-grouped aggregate per iteration, bounded by
  * M·ks·subDim, with map-side combine.
  */
object Pq {

  /** `(idCol, code0..code{M-1}, qerr)`: per-vector subspace codes
    * against a k-means-refined per-subspace codebook, plus the
    * round-6 L2 reconstruction error. `dim` must equal M·subDim and
    * every vector's length. */
  def codebook(vectors: DataFrame, idCol: String, vecCol: String,
               dim: Int, numSub: Int, ks: Int,
               kmeansIters: Int = 1): DataFrame = {
    require(numSub >= 1 && dim % numSub == 0,
      s"dim=$dim not divisible into numSub=$numSub subspaces")
    require(ks >= 1 && numSub * ks <= 4096,
      s"numSub*ks=${numSub * ks} out of range: the codebook is broadcast " +
        "to every task — bounded side only")
    require(kmeansIters >= 0 && kmeansIters <= 16,
      s"kmeansIters=$kmeansIters out of range (each pass rescans the corpus)")
    val sub = dim / numSub
    val spark = vectors.sparkSession
    val subs = vectors
      .select(col(idCol).as("id"),
        col(vecCol).cast("array<double>").as("dv"))
      .select(col("id"), explode(sequence(lit(0), lit(numSub - 1))).as("m"),
        col("dv"))
      .select(col("id"), col("m"),
        slice(col("dv"), col("m") * sub + 1, lit(sub)).as("sv"))
    def sqd(a: Column, b: Column): Column =
      aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
        lit(0.0), (acc, v) => acc + v)
    def rdist(a: Column, b: Column): Column = round(sqrt(sqd(a, b)), 6)
    def assign(cents: DataFrame): DataFrame =
      Relational.topKPerGroup(
        subs.join(broadcast(cents), Seq("m"))
          .withColumn("rd", rdist(col("sv"), col("cv"))),
        Seq(col("m"), col("id")), Seq(col("rd").asc, col("cell").asc), 1)
    val seeds = Relational.topKPerGroup(subs, Seq(col("m")),
      Seq(col("id").asc), ks)
      .select(col("m"), col("id").as("cell"), col("sv").as("cv"))
    val refined = (0 until kmeansIters).foldLeft(seeds) { (cents, _) =>
      import org.apache.spark.sql.types.DecimalType
      val means = assign(cents)
        .select(col("m"), col("cell"),
          posexplode(col("sv")).as(Seq("pos", "v")))
        .groupBy(col("m"), col("cell"), col("pos"))
        .agg((sum(col("v").cast(DecimalType(30, 18))).cast("double") /
          count(lit(1)).cast("double")).as("mv"))
        .groupBy(col("m"), col("cell"))
        .agg(transform(array_sort(collect_list(struct(col("pos"), col("mv")))),
          s => s.getField("mv")).as("rv"))
      cents.select(col("m"), col("cell"), col("cv").as("seed_cv"))
        .join(means, Seq("m", "cell"), "left")
        .select(col("m"), col("cell"),
          coalesce(col("rv"), col("seed_cv")).as("cv"))
    }
    // bounded (≤ numSub·ks rows by the guard): materialize once so the
    // downstream broadcast doesn't re-run the Lloyd scans (the q52
    // refinedCentroids pattern)
    val codebookLocal = {
      import scala.jdk.CollectionConverters._
      spark.createDataFrame(refined.collect().toSeq.asJava, refined.schema)
    }
    val codes = assign(codebookLocal)
      .select(col("m"), col("id"), col("cell"),
        sqd(col("sv"), col("cv")).as("sqd"))
    val codeCols = (0 until numSub).map(m =>
      max(when(col("m") === m, col("cell"))).as(s"code$m"))
    codes.groupBy(col("id"))
      .agg(codeCols.head,
        codeCols.tail :+
          array_sort(collect_list(struct(col("m"), col("sqd")))).as("es"): _*)
      .select(col("id").as(idCol) +:
        (0 until numSub).map(m => col(s"code$m")) :+
        round(sqrt(aggregate(col("es"), lit(0.0),
          (acc, x) => acc + x("sqd"))), 6).as("qerr"): _*)
  }

  /** DuckDB replay of [[codebook]] over `table(idCol, vecCol)` —
    * subspace explode, lowest-id seeds, `iters` decimal-mean Lloyd
    * passes, rounded-distance assignment, m-ordered error fold. */
  def sqlCodebook(table: String, idCol: String, vecCol: String,
                  dim: Int, numSub: Int, ks: Int, iters: Int = 1)
                  : String = {
    require(iters == 1, "oracle generator currently unrolls exactly 1 pass")
    val sub = dim / numSub
    def sqd(a: String, b: String): String =
      s"list_reduce(list_prepend(0.0, list_transform(range(1, ${sub + 1}), " +
        s"j -> ($a[j] - $b[j]) * ($a[j] - $b[j]))), (acc, x) -> acc + x)"
    val codeSel = (0 until numSub).map(m =>
      s"    MAX(CASE WHEN m = $m THEN cell END) AS code$m,").mkString("\n")
    val outCodes = (0 until numSub).map(m => s"code$m").mkString(", ")
    s"""WITH vecs AS (
       |  SELECT $idCol AS id, CAST($vecCol AS DOUBLE[]) AS dv FROM $table),
       |subs AS (
       |  SELECT id, t.m AS m, dv[t.m * $sub + 1 : t.m * $sub + $sub] AS sv
       |  FROM vecs, LATERAL (SELECT unnest(range(0, $numSub)) AS m) t),
       |seeds AS (
       |  SELECT m, id AS cell, sv AS cv FROM (
       |    SELECT m, id, sv, row_number() OVER (PARTITION BY m ORDER BY id)
       |      AS rn FROM subs) WHERE rn <= $ks),
       |a1 AS (
       |  SELECT m, id, cell FROM (
       |    SELECT s.m, s.id, c.cell,
       |      row_number() OVER (PARTITION BY s.m, s.id
       |        ORDER BY round(sqrt(${sqd("s.sv", "c.cv")}), 6), c.cell) AS rn
       |    FROM subs s JOIN seeds c ON s.m = c.m) WHERE rn = 1),
       |m1 AS (
       |  SELECT a.m, a.cell, t.j AS pos,
       |    CAST(SUM(CAST(s.sv[t.j] AS DECIMAL(30,18))) AS DOUBLE)
       |      / CAST(COUNT(*) AS DOUBLE) AS mv
       |  FROM a1 a JOIN subs s ON s.m = a.m AND s.id = a.id,
       |    LATERAL (SELECT unnest(range(1, ${sub + 1})) AS j) t
       |  GROUP BY 1, 2, 3),
       |c1 AS (
       |  SELECT s.m, s.cell, coalesce(r.cv, s.cv) AS cv
       |  FROM seeds s LEFT JOIN (
       |    SELECT m, cell, list(mv ORDER BY pos) AS cv FROM m1 GROUP BY 1, 2)
       |    r ON r.m = s.m AND r.cell = s.cell),
       |code AS (
       |  SELECT m, id, cell, sqd FROM (
       |    SELECT s.m, s.id, c.cell, ${sqd("s.sv", "c.cv")} AS sqd,
       |      row_number() OVER (PARTITION BY s.m, s.id
       |        ORDER BY round(sqrt(${sqd("s.sv", "c.cv")}), 6), c.cell) AS rn
       |    FROM subs s JOIN c1 c ON s.m = c.m) WHERE rn = 1),
       |g AS (
       |  SELECT id,
       |$codeSel
       |    list_sort(list({'m': m, 'sqd': sqd})) AS es
       |  FROM code GROUP BY 1)
       |SELECT id AS $idCol, $outCodes,
       |  round(sqrt(list_reduce(list_prepend(0.0,
       |    list_transform(es, x -> x.sqd)), (acc, x) -> acc + x)), 6) AS qerr
       |FROM g ORDER BY id""".stripMargin
  }
}
