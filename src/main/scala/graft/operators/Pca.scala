package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Top principal component of an embedding column (training-data
  * pipeline ★ — the whitening / dominant-direction analysis embedding
  * curation runs before ANN indexing and dedup: a dominant common
  * direction (the "anisotropy" of learned embeddings) inflates every
  * cosine similarity, and subtracting it is the standard fix; the
  * explained-variance share is the diagnostic this operator reports).
  *
  * Method: one distributed pass builds the exact second-moment matrix
  * (Σ xᵢxⱼ as DECIMAL(30,18) sums — order-insensitive, the q52 Lloyd
  * discipline) and the mean vector; the dim×dim covariance
  * C = S/n − m·mᵀ is assembled on the driver (dim ≤ 128 guard — the
  * IVF centroid-collect reasoning: model-sized, not corpus-sized) and
  * `iters` fixed power-iteration steps run there with PINNED fold
  * order (j-ascending multiply-adds, i-ascending norm), so the whole
  * computation — corpus sums, driver iteration, final rounding — is
  * an IEEE sequence the DuckDB oracle replays bit-for-bit with
  * unrolled list-fold CTEs.
  *
  * Scale shape (100 TB lens): the corpus is scanned twice (mean pass,
  * product pass); the product explode is dim² per row with map-side
  * combine collapsing each partition to dim² partial sums, so the
  * shuffle is KB-sized regardless of corpus size; nothing but the
  * dim²-bounded model ever reaches the driver. Power iteration on a
  * dim×dim matrix is microseconds — the distributed work is exactly
  * the two aggregation passes.
  *
  * Output: one row per dimension — `(dim, mean, pc1, eigenvalue,
  * explained)` (eigenvalue/explained constant across rows; doubles
  * rounded to 6, the engine's float-output discipline).
  */
object Pca {

  def topComponent(df: DataFrame, vecCol: String, dim: Int,
                   iters: Int = 10): DataFrame = {
    require(dim >= 2 && dim <= 128, s"dim=$dim outside [2, 128]")
    require(iters >= 1 && iters <= 20, s"iters=$iters outside [1, 20]")
    val spark = df.sparkSession
    val x = df.select(col(vecCol).cast("array<double>").as("v"))
    val n = x.count()
    require(n > 0, "empty input")
    val comps = x.select(posexplode(col("v")).as(Seq("j", "vj")))
    val mRows = comps.groupBy(col("j"))
      .agg((sum(col("vj").cast(DecimalType(30, 18))).cast("double") /
        lit(n.toDouble)).as("m"))
      .collect()
    require(mRows.length == dim,
      s"expected $dim dims, saw ${mRows.length}")
    val m = Array.ofDim[Double](dim)
    mRows.foreach(r => m(r.getInt(0)) = r.getDouble(1))
    val prs = x.select(explode(
        graft.functions.TextFunctions.bound(col("v")) { v =>
          flatten(transform(sequence(lit(1), lit(dim)), i =>
            transform(sequence(lit(1), lit(dim)), j =>
              struct(i.as("i"), j.as("j"),
                (element_at(v, i) * element_at(v, j)).as("p")))))
        }).as("e"))
      .select(col("e.i"), col("e.j"), col("e.p"))
    val sRows = prs.groupBy(col("i"), col("j"))
      .agg(sum(col("p").cast(DecimalType(30, 18))).cast("double").as("s"))
      .collect()
    require(sRows.length == dim * dim,
      s"expected ${dim * dim} product sums, saw ${sRows.length}")
    val c = Array.ofDim[Double](dim, dim)
    sRows.foreach { r =>
      val (i, j) = (r.getInt(0) - 1, r.getInt(1) - 1)
      c(i)(j) = r.getDouble(2) / n.toDouble - m(i) * m(j)
    }
    // power iteration, fold orders pinned to match the oracle's
    // list_reduce spelling exactly (j-ascending, 0.0-seeded)
    var v = Array.fill(dim)(1.0)
    var lam = 0.0
    var it = 0
    while (it < iters) {
      val w = Array.tabulate(dim) { i =>
        var acc = 0.0
        var j = 0
        while (j < dim) { acc = acc + c(i)(j) * v(j); j += 1 }
        acc
      }
      var nacc = 0.0
      var i = 0
      while (i < dim) { nacc = nacc + w(i) * w(i); i += 1 }
      lam = math.sqrt(nacc)
      v = w.map(_ / lam)
      it += 1
    }
    var trace = 0.0
    var d = 0
    while (d < dim) { trace = trace + c(d)(d); d += 1 }
    val explained = lam / trace
    val out = (0 until dim).map(j =>
      Row(j + 1, m(j), v(j), lam, explained))
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("dim", IntegerType, nullable = false),
      StructField("mean_raw", DoubleType, nullable = false),
      StructField("pc1_raw", DoubleType, nullable = false),
      StructField("eig_raw", DoubleType, nullable = false),
      StructField("expl_raw", DoubleType, nullable = false)))
    spark.createDataFrame(
        spark.sparkContext.parallelize(out, 1), schema)
      .select(col("dim"), round(col("mean_raw"), 6).as("mean"),
        round(col("pc1_raw"), 6).as("pc1"),
        round(col("eig_raw"), 6).as("eigenvalue"),
        round(col("expl_raw"), 6).as("explained"))
      .orderBy(col("dim"))
  }

  /** DuckDB replay of [[topComponent]] as a full SELECT statement:
    * the two decimal-sum passes, covariance assembly, `iters`
    * unrolled power-iteration CTEs with the same 0.0-seeded
    * list folds, and the rounded presentation. */
  def sqlTopComponent(rel: String, vecExpr: String, dim: Int,
                      iters: Int = 10): String = {
    val d1 = dim + 1
    def foldSum(listExpr: String): String =
      s"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), $listExpr), " +
        "(a, b) -> a + b)"
    val itCtes = (1 to iters).map { k =>
      s"""it$k AS (
         |  SELECT list_transform(w, x -> x / lam) AS v, lam FROM (
         |    SELECT w, sqrt(${foldSum("list_transform(w, x -> x * x)")})
         |      AS lam FROM (
         |      SELECT list_transform(range(1, $d1), i ->
         |        ${foldSum(s"list_transform(range(1, $d1), " +
                    s"j -> cm.m[i][j] * p.v[j])")}) AS w
         |      FROM it${k - 1} p CROSS JOIN cm)))""".stripMargin
    }.mkString(",\n")
    s"""WITH pcv AS (
       |  SELECT CAST($vecExpr AS DOUBLE[]) AS dv FROM $rel),
       |pcn AS (SELECT COUNT(*) AS n FROM pcv),
       |pcm AS (
       |  SELECT t.j AS j,
       |    CAST(SUM(CAST(v.dv[t.j] AS DECIMAL(30,18))) AS DOUBLE)
       |      / CAST(ANY_VALUE(pcn.n) AS DOUBLE) AS m
       |  FROM pcv v CROSS JOIN pcn,
       |    LATERAL (SELECT unnest(range(1, $d1)) AS j) t
       |  GROUP BY 1),
       |pcs AS (
       |  SELECT ti.i AS i, tj.j AS j,
       |    CAST(SUM(CAST(v.dv[ti.i] * v.dv[tj.j] AS DECIMAL(30,18)))
       |      AS DOUBLE) AS s
       |  FROM pcv v,
       |    LATERAL (SELECT unnest(range(1, $d1)) AS i) ti,
       |    LATERAL (SELECT unnest(range(1, $d1)) AS j) tj
       |  GROUP BY 1, 2),
       |cvals AS (
       |  SELECT a.i, a.j,
       |    a.s / CAST(pcn.n AS DOUBLE) - mi.m * mj.m AS c
       |  FROM pcs a JOIN pcm mi ON mi.j = a.i
       |  JOIN pcm mj ON mj.j = a.j CROSS JOIN pcn),
       |crow AS (SELECT i, list(c ORDER BY j) AS r FROM cvals GROUP BY i),
       |cm AS (SELECT list(r ORDER BY i) AS m FROM crow),
       |pctr AS (
       |  SELECT ${foldSum(s"list_transform(range(1, $d1), " +
            "i -> cm.m[i][i])")} AS tr
       |  FROM cm),
       |it0 AS (SELECT list_transform(range(1, $d1), x -> 1.0) AS v,
       |  CAST(0.0 AS DOUBLE) AS lam),
       |$itCtes
       |SELECT CAST(t.j AS INTEGER) AS dim, round(mj.m, 6) AS mean,
       |  round(fin.v[t.j], 6) AS pc1, round(fin.lam, 6) AS eigenvalue,
       |  round(fin.lam / pctr.tr, 6) AS explained
       |FROM it$iters fin CROSS JOIN pctr,
       |  LATERAL (SELECT unnest(range(1, $d1)) AS j) t
       |JOIN pcm mj ON mj.j = t.j
       |ORDER BY dim""".stripMargin
  }
}
