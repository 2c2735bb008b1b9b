package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding quantization (training-data pipeline ★ — the storage
  * half of similarity search at 100 TB): a float32 embedding column is
  * 4 bytes/dim; scalar int8 quantization cuts it to 1 byte/dim (plus
  * two doubles per row), which at corpus scale is the difference
  * between an ANN index that fits executor memory and one that spills.
  * The candidate tiers (LSH buckets, IVF cells) run on quantized codes;
  * the exact-rerank tier dequantizes or re-reads the float column for
  * the O(candidates) tail, so recall loss stays confined to candidate
  * generation — same contract as the Bloom join: the compressed form
  * moves work, the exact form settles answers.
  *
  * Per-vector (not global) min/max scaling: each row carries its own
  * `(vmin, scale)`, so outlier vectors can't crush everyone else's
  * resolution, and quantization stays a pure per-row Column transform —
  * no global pass, no shuffle, codegen end to end.
  */
object Quantize {

  /** Attach int8-range codes (`codes`: array<int> in [0, 255]) plus the
    * `(vmin, scale)` pair that inverts them. A constant vector (scale
    * 0) maps to all-zero codes. */
  def int8(df: DataFrame, vecCol: String): DataFrame = {
    val taken = Seq("vmin", "scale", "codes").filter(df.columns.contains)
    require(taken.isEmpty,
      s"int8 writes columns vmin/scale/codes; input already has " +
        s"${taken.mkString(", ")} — rename or drop them first")
    val v = col(vecCol)
    val vmin = array_min(v).cast("double")
    val scale = (array_max(v).cast("double") - vmin) / lit(255.0)
    df.withColumn("vmin", vmin)
      .withColumn("scale", scale)
      .withColumn("codes",
        when(col("scale") === 0.0,
          transform(v, _ => lit(0)))
        .otherwise(transform(v, x =>
          round((x.cast("double") - col("vmin")) / col("scale")).cast("int"))))
  }

  /** Inverse transform: codes → array<double> approximation. */
  def dequantize(codesCol: Column, vminCol: Column, scaleCol: Column): Column =
    transform(codesCol, c => vminCol + c.cast("double") * scaleCol)

  /** Channel-wise (per-DIMENSION) int8 quantization with percentile
    * calibration (★ — the TensorRT/ONNX activation-quant recipe,
    * complementing [[int8]]'s per-vector scaling: per-vector ranges
    * protect against outlier VECTORS, per-channel calibrated ranges
    * protect against outlier VALUES — the 1-in-10⁴ spike that would
    * otherwise stretch a whole dimension's scale). Each dimension j
    * gets `[lo_j, hi_j]` = the (pLo, pHi) quantiles estimated from the
    * q151 mergeable bottom-k sketch built per dimension (the sketch
    * keys on the vector id, so the calibration set is one
    * deterministic row-sample of VECTORS — the natural calibration
    * batch); values clip into the range and quantize to [0, 255].
    *
    * Scale shape: the sketch is one per-dim window over a k·dim-
    * bounded frame; the cuts collapse to a 1-row pair of dim-length
    * arrays that BROADCASTS; quantization is a per-row zip at scan
    * speed. Determinism: the sketch is hash-exact (q151), cuts are
    * type-1 empirical quantiles, and the quantize chain is IEEE ops +
    * round — the oracle replays everything.
    *
    * Output: `(idCol, codes_md5, code_sum, recon_err)` — the codes
    * digest, their sum, and the round-6 mean absolute reconstruction
    * error. */
  def channelInt8(df: DataFrame, idCol: String, vecCol: String,
                  dim: Int = 64, k: Int = 256,
                  pLo: Double = 0.01, pHi: Double = 0.99): DataFrame = {
    require(dim >= 2 && dim <= 4096, s"dim=$dim")
    require(pLo > 0 && pHi <= 1 && pLo < pHi, s"percentiles ($pLo, $pHi)")
    val dv = col(vecCol).cast("array<double>")
    val comps = df.select(col(idCol),
        posexplode(dv).as(Seq("j0", "v")))
      .select(col(idCol), (col("j0") + 1).as("j"), col("v"))
    val sk = QuantileSketch.sketch(comps, Seq("j"), idCol, "v", k)
    val vs = sort_array(collect_list(col("value")))
    def atRank(p: Double): Column =
      element_at(vs, greatest(lit(1L), ceil(lit(p) * size(vs))).cast("int"))
    val cuts = sk.groupBy(col("j"))
      .agg(atRank(pLo).as("lo"), atRank(pHi).as("hi"))
      .select(col("j"), col("lo"),
        ((col("hi") - col("lo")) / lit(255.0)).as("scale"))
    val carr = cuts.agg(
      transform(array_sort(collect_list(struct(col("j"), col("lo")))),
        s => s.getField("lo")).as("los"),
      transform(array_sort(collect_list(struct(col("j"), col("scale")))),
        s => s.getField("scale")).as("scales"))
    val codesExpr = transform(sequence(lit(1), lit(dim)), jj =>
      when(element_at(col("scales"), jj) === 0.0, lit(0L))
        .otherwise(least(lit(255L), greatest(lit(0L),
          round((element_at(col("__dv"), jj) -
            element_at(col("los"), jj)) /
            element_at(col("scales"), jj)).cast("long")))))
    val out = graft.functions.TextFunctions.bound(codesExpr) { codes =>
      struct(
        md5(array_join(transform(codes, _.cast("string")), ","))
          .as("codes_md5"),
        aggregate(codes, lit(0L), (acc, c) => acc + c).as("code_sum"),
        round(
          aggregate(sequence(lit(1), lit(dim)), lit(0.0), (acc, jj) =>
            acc + abs(element_at(col("__dv"), jj) -
              (element_at(col("los"), jj) +
                element_at(codes, jj).cast("double") *
                  element_at(col("scales"), jj)))) /
            lit(dim.toDouble), 6).as("recon_err"))
    }
    df.select(col(idCol), dv.as("__dv"))
      .crossJoin(broadcast(carr))
      .select(col(idCol), out.as("o"))
      .select(col(idCol), col("o.codes_md5").as("codes_md5"),
        col("o.code_sum").as("code_sum"),
        col("o.recon_err").as("recon_err"))
  }

  /** DuckDB replay of [[channelInt8]] over `rel(id, dv)`: CTEs ending
    * in `$tag(id, codes_md5, code_sum, recon_err)`. */
  def sqlChannelInt8(tag: String, rel: String, dim: Int, k: Int,
                     pLo: Double, pHi: Double): String = {
    val d1 = dim + 1
    val h = graft.functions.Scalars.sqlPortableHash64("id")
    def atRank(p: Double) = QuantileSketch.sqlAtRank("vs", p)
    s"""${tag}c AS (
       |  SELECT v.id, t.j, v.dv[t.j] AS v
       |  FROM $rel v, LATERAL (SELECT unnest(range(1, $d1)) AS j) t),
       |${tag}skr AS (
       |  SELECT j, v, row_number() OVER (PARTITION BY j
       |    ORDER BY $h, id) AS rn
       |  FROM ${tag}c),
       |${tag}cut AS (
       |  SELECT j, ${atRank(pLo)} AS lo,
       |    (${atRank(pHi)} - ${atRank(pLo)}) / 255.0 AS scale
       |  FROM (SELECT j, list_sort(list(v)) AS vs
       |        FROM ${tag}skr WHERE rn <= $k GROUP BY j)),
       |${tag}ca AS (
       |  SELECT list(lo ORDER BY j) AS los,
       |    list(scale ORDER BY j) AS scales
       |  FROM ${tag}cut),
       |${tag}q AS (
       |  SELECT v.id, ca.los, ca.scales, v.dv,
       |    list_transform(range(1, $d1), jj -> CASE
       |      WHEN ca.scales[jj] = 0 THEN CAST(0 AS BIGINT)
       |      ELSE LEAST(255, GREATEST(0,
       |        CAST(round((v.dv[jj] - ca.los[jj]) / ca.scales[jj])
       |          AS BIGINT))) END) AS codes
       |  FROM $rel v CROSS JOIN ${tag}ca ca),
       |$tag AS (
       |  SELECT id,
       |    md5(array_to_string(list_transform(codes,
       |      c -> CAST(c AS VARCHAR)), ',')) AS codes_md5,
       |    list_reduce(list_prepend(CAST(0 AS BIGINT), codes),
       |      (a, b) -> a + b) AS code_sum,
       |    round(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |      list_transform(range(1, $d1), jj ->
       |        abs(dv[jj] - (los[jj] + CAST(codes[jj] AS DOUBLE)
       |          * scales[jj])))), (a, b) -> a + b) / $dim.0, 6)
       |      AS recon_err
       |  FROM ${tag}q)""".stripMargin
  }
}
