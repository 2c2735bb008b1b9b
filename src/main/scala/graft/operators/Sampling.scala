package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic sampling (training-data pipeline ★): reproducible
  * subsets without RNG state — the sample is a pure function of each
  * row's key, so re-runs, retries, and different partitionings all
  * select the same rows (the property `df.sample` cannot give you),
  * and the filter pushes down like any other predicate.
  */
object Sampling {

  /** Keep ~`permille`/1000 of rows, keyed on a stable column. Uses
    * xxhash64 so the selection is uncorrelated with key structure. */
  def deterministicSample(df: DataFrame, keyCol: String,
                          permille: Int): DataFrame =
    df.filter(pmod(xxhash64(col(keyCol)), lit(1000)) < permille)

  /** Stratified variant: a per-stratum permille map (strata absent
    * from the map keep `defaultPermille`). */
  def stratifiedSample(df: DataFrame, keyCol: String, stratumCol: String,
                       permilleByStratum: Map[String, Int],
                       defaultPermille: Int): DataFrame = {
    val rate = permilleByStratum.foldLeft(lit(defaultPermille)) {
      case (acc, (stratum, p)) =>
        when(col(stratumCol) === stratum, lit(p)).otherwise(acc)
    }
    df.filter(pmod(xxhash64(col(keyCol)), lit(1000)) < rate)
  }
}
