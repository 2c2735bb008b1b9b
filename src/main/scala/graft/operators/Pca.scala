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

  /** `samplePermille` caps the ESTIMATION sample (deterministic md5
    * bucket on `idCol` — the q82 hash discipline): the top direction
    * of a 64-dim covariance stabilizes on a fraction of the corpus,
    * and the second-moment pass is the operator's entire cost (dim²
    * decimal terms per sampled row — the triangle halves it, the
    * sample bounds it; the CORRECTION ([[removeDirection]]) still
    * applies to every row). At 100 TB you estimate on ~10⁻⁶ of the
    * corpus; the registered query keeps 200‰ so the sf0.01 oracle
    * still sees a meaningful sample. */
  def topComponent(df: DataFrame, idCol: String, vecCol: String, dim: Int,
                   iters: Int = 10, samplePermille: Int = 1000)
                  : DataFrame = {
    require(dim >= 2 && dim <= 128, s"dim=$dim outside [2, 128]")
    require(iters >= 1 && iters <= 20, s"iters=$iters outside [1, 20]")
    require(samplePermille >= 1 && samplePermille <= 1000,
      s"samplePermille=$samplePermille outside [1, 1000]")
    val spark = df.sparkSession
    val x = df
      .filter(pmod(graft.functions.Scalars.portableHash64(col(idCol)),
        lit(1000)) < samplePermille)
      .select(col(vecCol).cast("array<double>").as("v"))
    val n = x.count()
    require(n > 0, "empty estimation sample")
    val comps = x.select(posexplode(col("v")).as(Seq("j", "vj")))
    val mRows = comps.groupBy(col("j"))
      .agg((sum(col("vj").cast(DecimalType(30, 18))).cast("double") /
        lit(n.toDouble)).as("m"))
      .collect()
    require(mRows.length == dim,
      s"expected $dim dims, saw ${mRows.length}")
    val m = Array.ofDim[Double](dim)
    mRows.foreach(r => m(r.getInt(0)) = r.getDouble(1))
    // upper triangle only (i <= j): covariance is symmetric, so half
    // the decimal terms buy the same matrix
    val prs = x.select(explode(
        graft.functions.TextFunctions.bound(col("v")) { v =>
          flatten(transform(sequence(lit(1), lit(dim)), i =>
            transform(sequence(i, lit(dim)), j =>
              struct(i.as("i"), j.as("j"),
                (element_at(v, i) * element_at(v, j)).as("p")))))
        }).as("e"))
      .select(col("e.i"), col("e.j"), col("e.p"))
    val sRows = prs.groupBy(col("i"), col("j"))
      .agg(sum(col("p").cast(DecimalType(30, 18))).cast("double").as("s"))
      .collect()
    require(sRows.length == dim * (dim + 1) / 2,
      s"expected ${dim * (dim + 1) / 2} product sums, saw ${sRows.length}")
    val c = Array.ofDim[Double](dim, dim)
    sRows.foreach { r =>
      val (i, j) = (r.getInt(0) - 1, r.getInt(1) - 1)
      val v = r.getDouble(2) / n.toDouble - m(i) * m(j)
      c(i)(j) = v
      c(j)(i) = v
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

  private def foldSum(listExpr: String): String =
    s"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), $listExpr), " +
      "(a, b) -> a + b)"

  /** DuckDB replay of [[topComponent]] as a full SELECT statement:
    * the two decimal-sum passes, covariance assembly, `iters`
    * unrolled power-iteration CTEs with the same 0.0-seeded
    * list folds, and the rounded presentation. */
  def sqlTopComponent(rel: String, idExpr: String, vecExpr: String,
                      dim: Int, iters: Int = 10,
                      samplePermille: Int = 1000): String = {
    val d1 = dim + 1
    s"""WITH ${sqlTopComponentCtes(rel, idExpr, vecExpr, dim, iters,
          samplePermille)}
       |SELECT CAST(t.j AS INTEGER) AS dim, round(mj.m, 6) AS mean,
       |  round(fin.v[t.j], 6) AS pc1, round(fin.lam, 6) AS eigenvalue,
       |  round(fin.lam / pctr.tr, 6) AS explained
       |FROM it$iters fin CROSS JOIN pctr,
       |  LATERAL (SELECT unnest(range(1, $d1)) AS j) t
       |JOIN pcm mj ON mj.j = t.j
       |ORDER BY dim""".stripMargin
  }

  /** The CTE chain behind [[sqlTopComponent]] (no leading WITH, no
    * final SELECT): ends at `it$iters(v, lam)`, `pcm(j, m)`,
    * `pctr(tr)` — reusable by downstream compositions (q175's
    * all-but-the-top correction). */
  def sqlTopComponentCtes(rel: String, idExpr: String, vecExpr: String,
                          dim: Int, iters: Int,
                          samplePermille: Int = 1000): String = {
    val d1 = dim + 1
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
    s"""pcv AS (
       |  SELECT CAST($vecExpr AS DOUBLE[]) AS dv FROM $rel
       |  WHERE ${graft.functions.Scalars.sqlPortableHash64(idExpr)}
       |    % 1000 < $samplePermille),
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
       |    LATERAL (SELECT unnest(range(ti.i, $d1)) AS j) tj
       |  GROUP BY 1, 2),
       |cgrid AS (
       |  SELECT a.i, b.j
       |  FROM (SELECT unnest(range(1, $d1)) AS i) a,
       |    (SELECT unnest(range(1, $d1)) AS j) b),
       |cvals AS (
       |  SELECT g.i, g.j,
       |    a.s / CAST(pcn.n AS DOUBLE) - mi.m * mj.m AS c
       |  FROM cgrid g
       |  JOIN pcs a ON a.i = least(g.i, g.j) AND a.j = greatest(g.i, g.j)
       |  JOIN pcm mi ON mi.j = g.i
       |  JOIN pcm mj ON mj.j = g.j CROSS JOIN pcn),
       |crow AS (SELECT i, list(c ORDER BY j) AS r FROM cvals GROUP BY i),
       |cm AS (SELECT list(r ORDER BY i) AS m FROM crow),
       |pctr AS (
       |  SELECT ${foldSum(s"list_transform(range(1, $d1), " +
            "i -> cm.m[i][i])")} AS tr
       |  FROM cm),
       |it0 AS (SELECT list_transform(range(1, $d1), x -> 1.0) AS v,
       |  CAST(0.0 AS DOUBLE) AS lam),
       |$itCtes""".stripMargin
  }

  /** All-but-the-top correction (training-data pipeline ★ — Mu &
    * Viswanath 2018): subtract each vector's projection onto a fixed
    * direction, v′ = v − (v·p)p. The direction is the ROUNDED pc1
    * [[topComponent]] emits (model-sized literal, broadcast into the
    * plan); the dot product folds j-ascending with a 0.0 seed and the
    * scalar is `bound` once (the CollapseProject trap — inlined, the
    * per-element lambda would re-fold the dot per dimension, an
    * O(dim²) blowup per row). Output: `(idCol, corrected
    * array<double>)` — a per-row projection at scan speed. */
  def removeDirection(df: DataFrame, idCol: String, vecCol: String,
                      dir: Array[Double]): DataFrame = {
    require(dir.length >= 2, "direction must have >= 2 dims")
    val p = array(dir.map(lit(_)): _*)
    val dv = col(vecCol).cast("array<double>")
    val dot = aggregate(zip_with(dv, p, (a, b) => a * b), lit(0.0),
      (acc, x) => acc + x)
    val corrected = graft.functions.TextFunctions.bound(array(dot)) { d =>
      zip_with(dv, p, (a, b) => a - element_at(d, 1) * b)
    }
    df.select(col(idCol), corrected.as("corrected"))
  }

  /** DuckDB spelling of [[removeDirection]] given a CTE `pdir(p)`
    * holding the direction list: emits `$tag(id, cv)` over `rel(id,
    * dv)`. The dot is folded in a nested select so it is computed
    * once per row (the Spark `bound` twin). */
  def sqlRemoveDirection(tag: String, rel: String, dim: Int): String = {
    val d1 = dim + 1
    s"""$tag AS (
       |  SELECT id, list_transform(range(1, $d1),
       |    j -> dv[j] - dot * p[j]) AS cv
       |  FROM (
       |    SELECT r.id, r.dv, pdir.p,
       |      ${foldSum(s"list_transform(range(1, $d1), " +
            "j -> r.dv[j] * pdir.p[j])")} AS dot
       |    FROM $rel r CROSS JOIN pdir))""".stripMargin
  }
}
