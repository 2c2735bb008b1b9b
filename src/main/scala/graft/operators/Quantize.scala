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
}
