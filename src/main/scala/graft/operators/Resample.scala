package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Time-series resampling to a regular grid (SURVEY §2.9's spine
  * pattern promoted to an operator): aggregate to `grain` buckets,
  * complete the grid so EVERY (bucket, key) combination exists —
  * missing buckets surface as explicit rows instead of silent holes —
  * then optionally repair the value column by carry-forward.
  *
  * Scale shape: the aggregate is one shuffle over the facts; the spine
  * is generated DISTRIBUTED from the data's own min/max (a 2-scalar
  * aggregate feeding `sequence` — no driver collect, no hand-written
  * calendar), and is bucket-count-sized, so the grid completion join
  * broadcasts. The optional fill is [[Relational.fillForward]]'s
  * per-key window. Facts stream through exactly once.
  */
object Resample {

  /** Supported grains map 1:1 to `date_trunc` units with a matching
    * spine step. */
  private val steps = Map(
    "day" -> "interval 1 day",
    "week" -> "interval 7 day",
    "month" -> "interval 1 month",
    "year" -> "interval 1 year")

  /** Resample `valueCol` to (`grain` bucket × keys): `vsum`
    * (decimal-exact) and `vcount` per cell; absent cells get
    * `vcount = 0` and, when `fill`, the latest preceding `vsum`
    * (otherwise null). */
  def resample(df: DataFrame, timeCol: String, grain: String,
               keys: Seq[String], valueCol: String,
               fill: Boolean = false): DataFrame = {
    val step = steps.getOrElse(grain.toLowerCase,
      throw new IllegalArgumentException(
        s"grain '$grain' not in ${steps.keys.mkString("/")}"))
    val bucketed = df
      .groupBy(date_trunc(grain, col(timeCol)).as("bucket") +:
        keys.map(col): _*)
      .agg(sum(col(valueCol).cast(DecimalType(18, 4))).as("vsum"),
        count(col(valueCol)).as("vcount"))
    val spine = df
      .agg(date_trunc(grain, min(col(timeCol))).as("lo"),
        date_trunc(grain, max(col(timeCol))).as("hi"))
      .select(explode(sequence(col("lo"), col("hi"), expr(step)))
        .as("bucket"))
    val grid =
      if (keys.isEmpty) spine
      else spine.crossJoin(df.select(keys.map(col): _*).distinct())
    val full = grid.join(bucketed, "bucket" +: keys, "left")
      .withColumn("vcount", coalesce(col("vcount"), lit(0L)))
    if (fill) Relational.fillForward(full, keys, Seq("bucket"), Seq("vsum"))
    else full
  }
}
