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
    val (_, codes) =
      trainAndEncode(vectors, idCol, vecCol, dim, numSub, ks, kmeansIters)
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

  /** ADC (asymmetric distance computation) top-k over PQ codes — the
    * search half of IVF-PQ: each of the `numQueries` lowest-id
    * vectors builds a per-subspace lookup table of squared distances
    * to every sub-centroid (Q·M·ks entries), and every corpus vector
    * scores as the m-ordered fold of M table lookups chosen by its
    * CODES — the raw vectors never enter the scan, which is the
    * entire point of PQ at 10¹⁰ vectors. Output: top-`k` `(q_id,
    * c_id, adist)` per query by (round-6 ADC distance asc, id asc),
    * self-matches excluded.
    *
    * Scale shape: the LUT is query-set-bounded and BROADCAST; the
    * code frame (N·M rows, the compressed index) streams through one
    * hash join on (m, cell) and one (query, id)-grouped fold — no
    * corpus shuffle beyond that aggregation, no vector arithmetic in
    * the scan. */
  def adcTopK(vectors: DataFrame, idCol: String, vecCol: String,
              dim: Int, numSub: Int, ks: Int, k: Int,
              numQueries: Int, kmeansIters: Int = 1): DataFrame = {
    require(numQueries >= 1 && numQueries <= 64,
      s"numQueries=$numQueries outside [1, 64] — the LUT broadcasts")
    require(k >= 1, s"k=$k must be positive")
    val (cb, codes) =
      trainAndEncode(vectors, idCol, vecCol, dim, numSub, ks, kmeansIters)
    val sub = dim / numSub
    val qsubs = subvectors(vectors, idCol, vecCol, numSub, sub)
      .filter(col("id") < numQueries)
      .select(col("id").as("q_id"), col("m"), col("sv"))
    val lut = qsubs.join(broadcast(cb), Seq("m"))
      .select(col("q_id"), col("m"), col("cell"),
        sqd(col("sv"), col("cv")).as("lutd"))
    codes.join(broadcast(lut), Seq("m", "cell"))
      .filter(col("q_id") =!= col("id"))
      .groupBy(col("q_id"), col("id"))
      .agg(array_sort(collect_list(struct(col("m"), col("lutd"))))
        .as("es"))
      .select(col("q_id"), col("id").as("c_id"),
        round(sqrt(aggregate(col("es"), lit(0.0),
          (acc, x) => acc + x("lutd"))), 6).as("adist"))
      .transform(df => Relational.topKPerGroup(df, Seq(col("q_id")),
        Seq(col("adist").asc, col("c_id").asc), k))
  }

  /** IVF-PQ top-k (★ — the PUBLISHED two-level layout of Jégou et
    * al. 2011 assembled from this file's own parts: the coarse
    * quantizer IS a product quantizer with ONE subspace over the full
    * vector (same lowest-id seeds, same decimal Lloyd pass, same
    * round-6 assignment — one discipline, two granularities), so
    * `numCells` coarse cells partition the corpus; each query probes
    * its `nprobe` nearest coarse centroids and runs ADC ONLY against
    * the residents of those cells. Brute ADC (q159) touches every
    * code; this touches ~nprobe/numCells of them — the 10¹⁰-vector
    * search posture.
    *
    * Scale shape: both codebooks collect-materialize (guarded ≤ 4096)
    * and broadcast; the query→cell probe set and the LUT are
    * query-bounded broadcasts; the only corpus-sized frames are the
    * coarse assignment (id, ccell) and the code table, which meet the
    * candidate frame through hash equi-joins. Output as [[adcTopK]]
    * plus the probed `ccell` count per pair is implicit in recall —
    * SimilaritySpec-style recall holds it to the brute tier. */
  def ivfAdcTopK(vectors: DataFrame, idCol: String, vecCol: String,
                 dim: Int, numSub: Int, ks: Int, k: Int,
                 numQueries: Int, numCells: Int, nprobe: Int,
                 kmeansIters: Int = 1): DataFrame = {
    require(numQueries >= 1 && numQueries <= 64,
      s"numQueries=$numQueries outside [1, 64]")
    require(nprobe >= 1 && nprobe <= numCells,
      s"nprobe=$nprobe outside [1, numCells=$numCells]")
    require(k >= 1, s"k=$k must be positive")
    val (ccb, ccodes) =
      trainAndEncode(vectors, idCol, vecCol, dim, 1, numCells, kmeansIters)
    val cells = ccodes.select(col("id"), col("cell").as("ccell"))
    val (cb, codes) =
      trainAndEncode(vectors, idCol, vecCol, dim, numSub, ks, kmeansIters)
    val sub = dim / numSub
    val qfull = vectors
      .select(col(idCol).as("q_id"),
        col(vecCol).cast("array<double>").as("qv"))
      .filter(col("q_id") < numQueries)
    val probes = Relational.topKPerGroup(
        qfull.crossJoin(broadcast(
            ccb.select(col("cell").as("ccell"), col("cv"))))
          .withColumn("crd", round(sqrt(sqd(col("qv"), col("cv"))), 6)),
        Seq(col("q_id")), Seq(col("crd").asc, col("ccell").asc), nprobe)
      .select(col("q_id"), col("ccell"))
    val cand = probes.join(cells, Seq("ccell"))
      .filter(col("q_id") =!= col("id"))
      .select(col("q_id"), col("id"))
    val qsubs = subvectors(vectors, idCol, vecCol, numSub, sub)
      .filter(col("id") < numQueries)
      .select(col("id").as("q_id"), col("m"), col("sv"))
    val lut = qsubs.join(broadcast(cb), Seq("m"))
      .select(col("q_id"), col("m"), col("cell"),
        sqd(col("sv"), col("cv")).as("lutd"))
    codes.join(cand, Seq("id"))
      .join(broadcast(lut), Seq("q_id", "m", "cell"))
      .groupBy(col("q_id"), col("id"))
      .agg(array_sort(collect_list(struct(col("m"), col("lutd"))))
        .as("es"))
      .select(col("q_id"), col("id").as("c_id"),
        round(sqrt(aggregate(col("es"), lit(0.0),
          (acc, x) => acc + x("lutd"))), 6).as("adist"))
      .transform(df => Relational.topKPerGroup(df, Seq(col("q_id")),
        Seq(col("adist").asc, col("c_id").asc), k))
  }

  /** DuckDB replay of [[ivfAdcTopK]]: the coarse chain (tag `cq`, one
    * subspace), the fine chain (untagged), probes, candidate
    * restriction, LUT, and the m-ordered fold. */
  def sqlIvfAdcTopK(table: String, idCol: String, vecCol: String,
                    dim: Int, numSub: Int, ks: Int, k: Int,
                    numQueries: Int, numCells: Int, nprobe: Int,
                    iters: Int = 1): String = {
    val sub = dim / numSub
    "WITH " +
      sqlChain(table, idCol, vecCol, dim, 1, numCells, iters, tag = "cq") +
      ",\n" + sqlChain(table, idCol, vecCol, dim, numSub, ks, iters) +
      s""",
         |cells AS (SELECT id, cell AS ccell FROM cqcode),
         |qf AS (SELECT id AS q_id, dv AS qv FROM vecs
         |       WHERE id < $numQueries),
         |probes AS (
         |  SELECT q_id, ccell FROM (
         |    SELECT q.q_id, c.cell AS ccell,
         |      row_number() OVER (PARTITION BY q.q_id
         |        ORDER BY round(sqrt(${sqlSqd(dim, "q.qv", "c.cv")}), 6),
         |          c.cell) AS rn
         |    FROM qf q JOIN cqc$iters c ON c.m = 0) WHERE rn <= $nprobe),
         |cand AS (
         |  SELECT p.q_id, ce.id FROM probes p JOIN cells ce USING (ccell)
         |  WHERE p.q_id <> ce.id),
         |qs AS (SELECT id AS q_id, m, sv FROM subs WHERE id < $numQueries),
         |lut AS (
         |  SELECT q.q_id, c.m, c.cell, ${sqlSqd(sub, "q.sv", "c.cv")} AS lutd
         |  FROM qs q JOIN c$iters c ON q.m = c.m),
         |sc AS (
         |  SELECT ca.q_id, cd.id,
         |    list_sort(list({'m': cd.m, 'lutd': l.lutd})) AS es
         |  FROM code cd
         |  JOIN cand ca ON ca.id = cd.id
         |  JOIN lut l ON l.q_id = ca.q_id AND l.m = cd.m
         |    AND l.cell = cd.cell
         |  GROUP BY 1, 2),
         |ad AS (
         |  SELECT q_id, id AS c_id,
         |    round(sqrt(list_reduce(list_prepend(0.0,
         |      list_transform(es, x -> x.lutd)), (acc, x) -> acc + x)), 6)
         |      AS adist
         |  FROM sc)
         |SELECT q_id, c_id, adist FROM (
         |  SELECT q_id, c_id, adist, row_number() OVER (PARTITION BY q_id
         |    ORDER BY adist, c_id) AS rn FROM ad)
         |WHERE rn <= $k ORDER BY q_id, adist, c_id""".stripMargin
  }

  private def subvectors(vectors: DataFrame, idCol: String,
                         vecCol: String, numSub: Int,
                         sub: Int): DataFrame =
    vectors
      .select(col(idCol).as("id"),
        col(vecCol).cast("array<double>").as("dv"))
      .select(col("id"), explode(sequence(lit(0), lit(numSub - 1))).as("m"),
        col("dv"))
      .select(col("id"), col("m"),
        slice(col("dv"), col("m") * sub + 1, lit(sub)).as("sv"))

  private def sqd(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, v) => acc + v)

  /** Train the per-subspace codebook and encode the corpus: returns
    * the collect-materialized codebook `(m, cell, cv)` and the code
    * frame `(m, id, cell, sqd)`. */
  private def trainAndEncode(vectors: DataFrame, idCol: String,
                             vecCol: String, dim: Int, numSub: Int,
                             ks: Int, kmeansIters: Int)
                             : (DataFrame, DataFrame) = {
    require(numSub >= 1 && dim % numSub == 0,
      s"dim=$dim not divisible into numSub=$numSub subspaces")
    require(ks >= 1 && numSub * ks <= 4096,
      s"numSub*ks=${numSub * ks} out of range: the codebook is broadcast " +
        "to every task — bounded side only")
    require(kmeansIters >= 0 && kmeansIters <= 16,
      s"kmeansIters=$kmeansIters out of range (each pass rescans the corpus)")
    val sub = dim / numSub
    val spark = vectors.sparkSession
    val subs = subvectors(vectors, idCol, vecCol, numSub, sub)
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
    (codebookLocal, codes)
  }

  /** DuckDB replay of [[codebook]] over `table(idCol, vecCol)` —
    * subspace explode, lowest-id seeds, `iters` decimal-mean Lloyd
    * passes, rounded-distance assignment, m-ordered error fold. */
  def sqlCodebook(table: String, idCol: String, vecCol: String,
                  dim: Int, numSub: Int, ks: Int, iters: Int = 1)
                  : String = {
    val codeSel = (0 until numSub).map(m =>
      s"    MAX(CASE WHEN m = $m THEN cell END) AS code$m,").mkString("\n")
    val outCodes = (0 until numSub).map(m => s"code$m").mkString(", ")
    "WITH " + sqlChain(table, idCol, vecCol, dim, numSub, ks, iters) +
      s""",
         |g AS (
         |  SELECT id,
         |$codeSel
         |    list_sort(list({'m': m, 'sqd': sqd})) AS es
         |  FROM code GROUP BY 1)
         |SELECT id AS $idCol, $outCodes,
         |  round(sqrt(list_reduce(list_prepend(0.0,
         |    list_transform(es, x -> x.sqd)), (acc, x) -> acc + x)), 6)
         |    AS qerr
         |FROM g ORDER BY id""".stripMargin
  }

  /** DuckDB replay of [[adcTopK]]: the training/encoding chain, the
    * query LUT against the refined codebook, the (m, cell) lookup
    * join, and the per-pair m-ordered fold. */
  def sqlAdcTopK(table: String, idCol: String, vecCol: String,
                 dim: Int, numSub: Int, ks: Int, k: Int,
                 numQueries: Int, iters: Int = 1): String = {
    val sub = dim / numSub
    "WITH " + sqlChain(table, idCol, vecCol, dim, numSub, ks, iters) +
      s""",
         |qs AS (SELECT id AS q_id, m, sv FROM subs WHERE id < $numQueries),
         |lut AS (
         |  SELECT q.q_id, c.m, c.cell, ${sqlSqd(sub, "q.sv", "c.cv")} AS lutd
         |  FROM qs q JOIN c$iters c ON q.m = c.m),
         |sc AS (
         |  SELECT l.q_id, cd.id,
         |    list_sort(list({'m': cd.m, 'lutd': l.lutd})) AS es
         |  FROM code cd JOIN lut l ON l.m = cd.m AND l.cell = cd.cell
         |  WHERE l.q_id <> cd.id GROUP BY 1, 2),
         |ad AS (
         |  SELECT q_id, id AS c_id,
         |    round(sqrt(list_reduce(list_prepend(0.0,
         |      list_transform(es, x -> x.lutd)), (acc, x) -> acc + x)), 6)
         |      AS adist
         |  FROM sc)
         |SELECT q_id, c_id, adist FROM (
         |  SELECT q_id, c_id, adist, row_number() OVER (PARTITION BY q_id
         |    ORDER BY adist, c_id) AS rn FROM ad)
         |WHERE rn <= $k ORDER BY q_id, adist, c_id""".stripMargin
  }

  private def sqlSqd(sub: Int, a: String, b: String): String =
    s"list_reduce(list_prepend(0.0, list_transform(range(1, ${sub + 1}), " +
      s"j -> ($a[j] - $b[j]) * ($a[j] - $b[j]))), (acc, x) -> acc + x)"

  private def sqlChain(table: String, idCol: String, vecCol: String,
                       dim: Int, numSub: Int, ks: Int, iters: Int,
                       tag: String = ""): String = {
    require(iters == 1, "oracle generator currently unrolls exactly 1 pass")
    val sub = dim / numSub
    def sqd(a: String, b: String): String = sqlSqd(sub, a, b)
    val t = tag
    s"""${t}vecs AS (
       |  SELECT $idCol AS id, CAST($vecCol AS DOUBLE[]) AS dv FROM $table),
       |${t}subs AS (
       |  SELECT id, t.m AS m, dv[t.m * $sub + 1 : t.m * $sub + $sub] AS sv
       |  FROM ${t}vecs, LATERAL (SELECT unnest(range(0, $numSub)) AS m) t),
       |${t}seeds AS (
       |  SELECT m, id AS cell, sv AS cv FROM (
       |    SELECT m, id, sv, row_number() OVER (PARTITION BY m ORDER BY id)
       |      AS rn FROM ${t}subs) WHERE rn <= $ks),
       |${t}a1 AS (
       |  SELECT m, id, cell FROM (
       |    SELECT s.m, s.id, c.cell,
       |      row_number() OVER (PARTITION BY s.m, s.id
       |        ORDER BY round(sqrt(${sqd("s.sv", "c.cv")}), 6), c.cell) AS rn
       |    FROM ${t}subs s JOIN ${t}seeds c ON s.m = c.m) WHERE rn = 1),
       |${t}m1 AS (
       |  SELECT a.m, a.cell, t.j AS pos,
       |    CAST(SUM(CAST(s.sv[t.j] AS DECIMAL(30,18))) AS DOUBLE)
       |      / CAST(COUNT(*) AS DOUBLE) AS mv
       |  FROM ${t}a1 a JOIN ${t}subs s ON s.m = a.m AND s.id = a.id,
       |    LATERAL (SELECT unnest(range(1, ${sub + 1})) AS j) t
       |  GROUP BY 1, 2, 3),
       |${t}c1 AS (
       |  SELECT s.m, s.cell, coalesce(r.cv, s.cv) AS cv
       |  FROM ${t}seeds s LEFT JOIN (
       |    SELECT m, cell, list(mv ORDER BY pos) AS cv FROM ${t}m1 GROUP BY 1, 2)
       |    r ON r.m = s.m AND r.cell = s.cell),
       |${t}code AS (
       |  SELECT m, id, cell, sqd FROM (
       |    SELECT s.m, s.id, c.cell, ${sqd("s.sv", "c.cv")} AS sqd,
       |      row_number() OVER (PARTITION BY s.m, s.id
       |        ORDER BY round(sqrt(${sqd("s.sv", "c.cv")}), 6), c.cell) AS rn
       |    FROM ${t}subs s JOIN ${t}c1 c ON s.m = c.m) WHERE rn = 1)""".stripMargin
  }
}
