package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.plans.BloomMightContain

/** Bloom-pruned joins (SURVEY §4 / 100 TB shuffle-reduction tier).
  *
  * The dominant cost of a big-big join is shuffling probe rows that
  * will never match. A Bloom filter over the build side's keys is a
  * few megabytes regardless of data volume, so it can sit at the probe
  * SCAN and drop non-matching rows before they are serialized into the
  * exchange: shuffle volume falls from |probe| to |matches| / (1-fpp).
  * This is the manual, composable form of Spark's own runtime bloom
  * filter (`spark.sql.optimizer.runtime.bloomFilter.enabled`), exposed
  * as an operator so it also applies where the optimizer's injection
  * does not reach (non-equi pre-filters, multi-stage pipelines that
  * reuse the filter, filters persisted between runs).
  *
  * Exactness: the Bloom test admits false positives, so it is ONLY a
  * pre-filter — `bloomSemiJoin` always finishes with the exact join.
  * Results are therefore identical to the plain join (the q79 oracle
  * and BloomJoinSpec assert it); only the shuffle shrinks.
  *
  * Scale contract: the filter is built with one distributed pass over
  * the build side (`df.stat.bloomFilter` — partial filters OR-merged,
  * one bit-array returned) and its size is `~1.2 * items * ln(1/fpp)`
  * bits, independent of row width. The `maxItems` guard keeps the
  * driver-side object bounded, same contract as the as-of ref guard.
  */
object BloomJoin {

  /** Build a Bloom filter over `build`'s `buildKey` column. */
  def buildFilter(build: DataFrame, buildKey: String, expectedItems: Long,
                  fpp: Double): org.apache.spark.util.sketch.BloomFilter = {
    val maxItems = 100L * 1000 * 1000 // ~170 MB at fpp=0.01; hard stop
    require(expectedItems > 0 && expectedItems <= maxItems,
      s"expectedItems=$expectedItems outside (0, $maxItems]")
    require(fpp > 0 && fpp < 1, s"fpp=$fpp outside (0, 1)")
    build.stat.bloomFilter(buildKey, expectedItems, fpp)
  }

  /** Exact left-semi join of `probe` against `build`, Bloom-pruned:
    * keep probe rows whose `probeKey` appears in `build.buildKey`.
    * The Bloom pre-filter runs at the probe scan (codegen'd predicate,
    * pushes past column pruning); survivors — true matches plus an
    * `fpp` sliver of false positives — carry into the exact semi join
    * that settles the answer. */
  def bloomSemiJoin(probe: DataFrame, build: DataFrame,
                    probeKey: String, buildKey: String,
                    expectedItems: Long, fpp: Double = 0.01): DataFrame = {
    val bloom = buildFilter(build, buildKey, expectedItems, fpp)
    probe.filter(BloomMightContain.column(col(probeKey), bloom))
      .join(build.select(col(buildKey).as(probeKey)).distinct(),
        Seq(probeKey), "left_semi")
      .select(probe.columns.map(col).toSeq: _*) // keep probe's column order
  }

  /** Anti variant: drop probe rows whose key appears in `build`. The
    * Bloom test cannot pre-drop here (a "maybe" is not a "yes"), but
    * it still splits the probe: rows the filter rejects are DEFINITE
    * non-matches and bypass the shuffle entirely; only the "maybe"
    * sliver joins. At scale that turns an all-rows shuffle into a
    * |build|-sized one. */
  def bloomAntiJoin(probe: DataFrame, build: DataFrame,
                    probeKey: String, buildKey: String,
                    expectedItems: Long, fpp: Double = 0.01): DataFrame = {
    val bloom = buildFilter(build, buildKey, expectedItems, fpp)
    val maybe = probe.filter(BloomMightContain.column(col(probeKey), bloom))
      .join(build.select(col(buildKey).as(probeKey)).distinct(),
        Seq(probeKey), "left_anti")
    // NULL keys: the Bloom test is NULL (not false) for them, so they
    // fail the `maybe` filter above — but a plain left_anti KEEPS
    // null-key rows (null never equals any build key). Coalesce routes
    // them to the definite-miss branch, preserving join parity.
    val definiteMiss = probe.filter(
      !coalesce(BloomMightContain.column(col(probeKey), bloom), lit(false)))
    definiteMiss.unionByName(maybe)
  }
}
