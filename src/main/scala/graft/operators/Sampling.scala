package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling (training-data pipeline ★): reproducible
  * subsets without RNG state — the sample is a pure function of each
  * row's key, so re-runs, retries, and different partitionings all
  * select the same rows (the property `df.sample` cannot give you),
  * and the filter pushes down like any other predicate.
  *
  * Keyed on `Scalars.portableHash64` (md5-derived) rather than
  * xxhash64: equally uncorrelated with key structure, but spellable
  * in ANSI SQL — so the sampling queries are hash-verified against
  * the DuckDB oracle instead of rows-only checked.
  */
object Sampling {

  private def bucket(keyCol: String): org.apache.spark.sql.Column =
    pmod(graft.functions.Scalars.portableHash64(col(keyCol)), lit(1000))

  /** The oracle spelling of the per-key bucket (value is nonnegative,
    * so `%` and pmod agree). */
  def sqlBucket(keyExpr: String): String =
    s"${graft.functions.Scalars.sqlPortableHash64(keyExpr)} % 1000"

  /** Keep ~`permille`/1000 of rows, keyed on a stable column. */
  def deterministicSample(df: DataFrame, keyCol: String,
                          permille: Int): DataFrame =
    df.filter(bucket(keyCol) < permille)

  /** Deterministic train/val/test split (training-data pipeline ★):
    * tag every row with its split by hash bucket. The split is a pure
    * function of the key, so it is stable across re-runs, engines, and
    * partitionings, rows never migrate between splits as the corpus
    * grows (bucket membership doesn't depend on other rows), and a
    * later pipeline stage can recompute membership from the key alone
    * instead of joining a split table. Remaining buckets are "test". */
  def hashSplit(df: DataFrame, keyCol: String, splitCol: String,
                trainPermille: Int, valPermille: Int): DataFrame = {
    require(trainPermille >= 0 && valPermille >= 0 &&
      trainPermille + valPermille <= 1000, "permilles must fit in 1000")
    df.withColumn(splitCol,
      when(bucket(keyCol) < trainPermille, "train")
        .when(bucket(keyCol) < trainPermille + valPermille, "val")
        .otherwise("test"))
  }

  /** The oracle spelling of [[hashSplit]]'s tag. */
  def sqlSplit(keyExpr: String, trainPermille: Int, valPermille: Int): String =
    s"CASE WHEN ${sqlBucket(keyExpr)} < $trainPermille THEN 'train' " +
      s"WHEN ${sqlBucket(keyExpr)} < ${trainPermille + valPermille} " +
      s"THEN 'val' ELSE 'test' END"

  /** Deterministic fixed-SIZE uniform sample (the reservoir-sampling
    * contract, hash-ranked): exactly `k` rows — the k smallest under
    * the (portable hash, key) total order. Where [[deterministicSample]]
    * fixes the RATE, this fixes the COUNT, which is what a "take 10k
    * docs for eval" pipeline step actually wants; membership is still
    * a pure function of the keys present, so re-runs and engines
    * agree. Plans as TakeOrderedAndProject — per-partition top-k then
    * a k-row merge, never a global sort, no driver-side state beyond
    * the k-row result. */
  def reservoirSample(df: DataFrame, keyCol: String, k: Int): DataFrame = {
    require(k > 0 && k <= 10 * 1000 * 1000, s"k=$k outside (0, 1e7]")
    df.orderBy(graft.functions.Scalars.portableHash64(col(keyCol)),
      col(keyCol)).limit(k)
  }

  /** Oracle spelling of [[reservoirSample]]'s order (wrap in
    * `ORDER BY ... LIMIT k`). */
  def sqlReservoirOrder(keyExpr: String): String =
    s"${graft.functions.Scalars.sqlPortableHash64(keyExpr)}, $keyExpr"

  /** Deterministic weighted sample without replacement (the A-ES /
    * exponential-clocks scheme): each row draws its unit-interval
    * variate u from the portable hash of its key and gets priority
    * `−ln(u) / w` — exponential with rate w, so the k smallest
    * priorities are a weight-proportional sample — and, being
    * hash-derived, the draw is reproducible across engines and runs.
    * The priority is ROUNDED to 6 decimals before ranking (the cosine
    * rule: ln is correctly-rounded on neither engine; 6 decimals
    * absorb the ulp while the key tie-break keeps the order total).
    * Same TakeOrderedAndProject shape as [[reservoirSample]]. */
  def weightedSample(df: DataFrame, keyCol: String, weightCol: String,
                     k: Int): DataFrame = {
    require(k > 0 && k <= 10 * 1000 * 1000, s"k=$k outside (0, 1e7]")
    val u = (graft.functions.Scalars.portableHash64(col(keyCol))
      .cast("double") + 1.0) / lit(Math.pow(2, 60))
    val priority = round(-log(u) / col(weightCol).cast("double"), 6)
    df.orderBy(priority, col(keyCol)).limit(k)
  }

  /** Oracle spelling of [[weightedSample]]'s priority. */
  def sqlWeightedPriority(keyExpr: String, weightExpr: String): String =
    s"round(-ln((CAST(${graft.functions.Scalars.sqlPortableHash64(keyExpr)} " +
      s"AS DOUBLE) + 1.0) / 1152921504606846976.0) " +
      s"/ CAST($weightExpr AS DOUBLE), 6)"

  /** Per-group fixed-size sample: exactly `min(k, |group|)` rows per
    * group under the same (portable hash, key) order — the balanced
    * per-class draw (and equally the per-DOMAIN quota cap a curation
    * pipeline uses to stop one source dominating the mixture) where
    * [[reservoirSample]] is global. Two-level ranking: a salted
    * pre-prune bounds any one window partition at the salt-bucket
    * slice of a group (hot-group skew shield — see stage-1 comment),
    * then the group-level rank runs over ≤ salts·k rows per group.
    * Never a global sort, never a driver loop. */
  def reservoirPerGroup(df: DataFrame, groupCols: Seq[String],
                        keyCol: String, k: Int,
                        salts: Int = 16): DataFrame = {
    require(k > 0 && k <= 1000000, s"k=$k outside (0, 1e6]")
    require(salts >= 1 && salts <= 4096, s"salts=$salts outside [1, 4096]")
    import org.apache.spark.sql.expressions.Window
    val h = graft.functions.Scalars.portableHash64(col(keyCol))
    // Stage 1 (skew shield): rank within (group, salt) and keep ≤ k
    // per salt bucket. A hot group — one language at 60% of a 100 TB
    // corpus — would otherwise land in ONE window partition and one
    // task would sort it; salting spreads it over `salts` partitions
    // and caps stage 2's input at salts·k rows per group. LOSSLESS by
    // construction: a row in the group's true top-k under the
    // (hash, key) total order is a fortiori top-k within its salt
    // bucket, so stage 1 never drops a final survivor — the oracle
    // replays the single-window semantics unchanged.
    val pruned =
      if (salts == 1) df
      else {
        val w1 = Window
          .partitionBy(groupCols.map(col) :+ pmod(h, lit(salts)): _*)
          .orderBy(h, col(keyCol))
        df.withColumn("__rn1", row_number().over(w1))
          .filter(col("__rn1") <= k).drop("__rn1")
      }
    val w = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(h, col(keyCol))
    pruned.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k).drop("__rn")
  }

  /** Stratified variant: a per-stratum permille map (strata absent
    * from the map keep `defaultPermille`). */
  def stratifiedSample(df: DataFrame, keyCol: String, stratumCol: String,
                       permilleByStratum: Map[String, Int],
                       defaultPermille: Int): DataFrame = {
    val rate = permilleByStratum.foldLeft(lit(defaultPermille)) {
      case (acc, (stratum, p)) =>
        when(col(stratumCol) === stratum, lit(p)).otherwise(acc)
    }
    df.filter(bucket(keyCol) < rate)
  }

  /** Source-mixture sampling (training-data pipeline ★): given target
    * mixture WEIGHTS per source and a global TOKEN budget, sample each
    * source at the deterministic rate that lands its share of the
    * budget — the "data mixing" step that turns a raw crawl into a
    * weighted pretraining corpus (mixture weights per source are the
    * published knob in GPT-3/LLaMA-style recipes). A source too small
    * for its target share is taken whole (rate caps at 1000‰) — the
    * standard under-supply behavior; re-normalizing the shortfall onto
    * other sources is a caller-side loop over this same operator.
    *
    * Scale shape: one tiny per-source token aggregate (sources are
    * dozens, not billions) broadcast back onto the corpus, then the
    * same pushdown-friendly hash-bucket filter as
    * [[deterministicSample]]. Rows keep their columns plus the
    * applied `permille`, so the mixture is auditable downstream. */
  def mixtureSample(df: DataFrame, sourceCol: String, keyCol: String,
                    tokensCol: String, weights: Map[String, Double],
                    tokenBudget: Long): DataFrame = {
    require(tokenBudget > 0, s"tokenBudget=$tokenBudget must be positive")
    val wExpr = weights.foldLeft(lit(0.0)) { case (acc, (s, wgt)) =>
      when(col(sourceCol) === s, lit(wgt)).otherwise(acc)
    }
    val totals = df.groupBy(col(sourceCol))
      .agg(sum(col(tokensCol).cast("long")).as("__tot"))
      .withColumn("__permille",
        least(lit(1000L),
          floor(lit(1000.0) * (lit(tokenBudget.toDouble) * wExpr) /
            col("__tot").cast("double"))))
      .select(col(sourceCol), col("__permille").as("permille"))
    df.join(broadcast(totals), Seq(sourceCol))
      .filter(bucket(keyCol) < col("permille"))
  }

  /** Oracle spelling of [[mixtureSample]]'s per-source permille (the
    * weight CASE must be built by the caller from the same map). */
  def sqlMixturePermille(weightCaseExpr: String, totExpr: String,
                         tokenBudget: Long): String =
    s"LEAST(1000, CAST(FLOOR(1000.0 * (CAST($tokenBudget AS DOUBLE) * " +
      s"$weightCaseExpr) / CAST($totExpr AS DOUBLE)) AS BIGINT))"

  /** Mixture sampling with shortfall RE-NORMALIZATION — the
    * waterfilling loop [[mixtureSample]]'s scaladoc left to the
    * caller, as an operator: a source too small for its target share
    * is taken whole and its unused budget redistributes onto the
    * still-unsaturated sources in proportion to their weights,
    * `rounds` times (each round saturates ≥ 1 source or reaches the
    * fixpoint, so rounds = 4 settles any practical mixture; a deeper
    * cascade keeps the round-4 rule, documented bias toward under-
    * spending the budget, never over). Weights are INTEGER permille
    * and token counts integral, so every aggregate in the loop sums
    * exactly (order-free) — the whole cascade replays in DuckDB
    * bit-for-bit, which Map[String, Double] weights would forfeit to
    * float-sum ordering. The loop runs over the per-source totals
    * frame (metadata-sized: sources are dozens); the corpus is
    * touched twice — the totals aggregate and the final
    * pushdown-friendly hash-bucket filter. */
  def mixtureWaterfill(df: DataFrame, sourceCol: String, keyCol: String,
                       tokensCol: String, weightsPermille: Map[String, Int],
                       tokenBudget: Long, rounds: Int = 4): DataFrame = {
    require(tokenBudget > 0, s"tokenBudget=$tokenBudget must be positive")
    require(rounds >= 1 && rounds <= 8, s"rounds=$rounds outside [1, 8]")
    require(weightsPermille.values.forall(_ >= 0), "negative weight")
    val wExpr = weightsPermille.foldLeft(lit(0L)) { case (acc, (s, wgt)) =>
      when(col(sourceCol) === s, lit(wgt.toLong)).otherwise(acc)
    }
    var st = df.groupBy(col(sourceCol))
      .agg(sum(col(tokensCol).cast("long")).cast("double").as("tot"))
      .withColumn("w", wExpr)
      .withColumn("sat", lit(false))
      .withColumn("alloc", lit(0.0))
    for (_ <- 1 to rounds) {
      val a = st.agg(
        sum(when(!col("sat"), col("w")).otherwise(0L)).as("w_act"),
        sum(when(col("sat"), col("alloc")).otherwise(0.0)).as("done"))
      st = st.crossJoin(broadcast(a))
        .withColumn("share",
          when(col("w_act") > 0,
            (lit(tokenBudget.toDouble) - col("done")) *
              col("w").cast("double") / col("w_act").cast("double"))
            .otherwise(lit(0.0)))
        .select(col(sourceCol), col("tot"), col("w"),
          (col("sat") || col("share") >= col("tot")).as("sat"),
          when(col("sat"), col("alloc"))
            .when(col("share") >= col("tot"), col("tot"))
            .otherwise(lit(0.0)).as("alloc"))
    }
    val aF = st.agg(
      sum(when(!col("sat"), col("w")).otherwise(0L)).as("w_act"),
      sum(when(col("sat"), col("alloc")).otherwise(0.0)).as("done"))
    val permille = st.crossJoin(broadcast(aF))
      .withColumn("allocF",
        when(col("sat"), col("alloc")).otherwise(least(col("tot"),
          when(col("w_act") > 0,
            (lit(tokenBudget.toDouble) - col("done")) *
              col("w").cast("double") / col("w_act").cast("double"))
            .otherwise(lit(0.0)))))
      .select(col(sourceCol),
        // tot = 0 (a source whose token counts sum to zero) would put
        // 0.0/0.0 = NaN into floor — Spark casts NaN to 0 silently,
        // DuckDB errors on the BIGINT cast; guard BOTH spellings
        when(col("tot") > 0,
          least(lit(1000L),
            floor(lit(1000.0) * col("allocF") / col("tot")).cast("long")))
          .otherwise(lit(0L)).as("permille"))
    df.join(broadcast(permille), Seq(sourceCol))
      .filter(bucket(keyCol) < col("permille"))
  }

  /** DuckDB CTE chain replaying [[mixtureWaterfill]]'s cascade.
    * Expects a CTE `t0(source, tot, w)` in scope (tot DOUBLE-cast
    * integral token totals, w the caller's integer permille CASE);
    * yields `perm(source, permille)`. Generated here so the two
    * engines' iteration arithmetic cannot drift (the GraphSql
    * discipline). */
  def sqlWaterfillCtes(tokenBudget: Long, rounds: Int): String = {
    def aCte(i: Int): String =
      s"""a$i AS (
         |  SELECT SUM(CASE WHEN NOT sat THEN w ELSE 0 END) AS w_act,
         |    SUM(CASE WHEN sat THEN alloc ELSE 0.0 END) AS done
         |  FROM s${i - 1})""".stripMargin
    def sCte(i: Int): String =
      s"""s$i AS (
         |  SELECT source, tot, w, (sat OR share >= tot) AS sat,
         |    CASE WHEN sat THEN alloc WHEN share >= tot THEN tot
         |         ELSE 0.0 END AS alloc
         |  FROM (
         |    SELECT s.*, CASE WHEN a.w_act > 0
         |      THEN (CAST($tokenBudget AS DOUBLE) - a.done)
         |        * CAST(s.w AS DOUBLE) / CAST(a.w_act AS DOUBLE)
         |      ELSE 0.0 END AS share
         |    FROM s${i - 1} s, a$i a))""".stripMargin
    val iters = (1 to rounds).map(i => s"${aCte(i)},\n${sCte(i)}")
      .mkString(",\n")
    s"""s0 AS (SELECT source, tot, w, FALSE AS sat, 0.0 AS alloc FROM t0),
       |$iters,
       |af AS (
       |  SELECT SUM(CASE WHEN NOT sat THEN w ELSE 0 END) AS w_act,
       |    SUM(CASE WHEN sat THEN alloc ELSE 0.0 END) AS done
       |  FROM s$rounds),
       |perm AS (
       |  SELECT source, CASE WHEN tot > 0
       |    THEN LEAST(1000, CAST(FLOOR(1000.0 *
       |      (CASE WHEN sat THEN alloc ELSE LEAST(tot,
       |        CASE WHEN af.w_act > 0
       |          THEN (CAST($tokenBudget AS DOUBLE) - af.done)
       |            * CAST(w AS DOUBLE) / CAST(af.w_act AS DOUBLE)
       |          ELSE 0.0 END) END) / tot) AS BIGINT))
       |    ELSE 0 END AS permille
       |  FROM s$rounds, af)""".stripMargin
  }

  /** Deterministic epoch shuffle — the training order for one epoch as
    * `(shard, ord)`: rows hash into `shards` shards and rank within
    * their shard by (portable_hash64(key:epoch), key). The order is a
    * pure function of (key, epoch), so any cluster, any partitioning,
    * any retry replays it exactly — the property loaders need for
    * resumable, auditable training runs. Shard-major traversal
    * (shard 0 in ord order, then shard 1, …) IS a total order, and a
    * W-worker loader instead streams shards round-robin, each in ord
    * order — which is why the output is sharded in the first place:
    * ONE hash shuffle + per-shard window sorts, no single-partition
    * global sort anywhere (an unpartitioned rank would serialize the
    * corpus through one task — the anti-pattern this operator
    * replaces). Epoch reshuffles move rows ACROSS shards (the hash
    * changes), so inter-shard mixing is free. */
  def epochOrder(df: DataFrame, keyCol: String, epoch: Int,
                 shards: Int = 64): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(shards >= 1, s"shards=$shards")
    val h = graft.functions.Scalars.portableHash64(
      concat(col(keyCol).cast("string"), lit(":" + epoch)))
    df.withColumn("__eh", h)
      .withColumn("shard", pmod(col("__eh"), lit(shards)).cast("int"))
      .withColumn("ord",
        row_number().over(Window.partitionBy(col("shard"))
          .orderBy(col("__eh"), col(keyCol))).cast("long"))
      .drop("__eh")
  }

  /** Temperature-scaled mixture sampling (training mechanics ★ — the
    * multilingual/multi-source rebalancing of mBERT/mT5/Gopher:
    * sampling weight ∝ tot_i^α with α < 1, so low-resource sources
    * are UPsampled relative to their natural share; contrast
    * [[mixtureSample]]/[[mixtureWaterfill]], where the weights are
    * caller-GIVEN — here they are COMPUTED from the corpus itself).
    *
    * α is restricted to dyadic exponents 2^-sqrtTimes (0.5, 0.25, …)
    * computed by ITERATED sqrt: sqrt is an IEEE correctly-rounded
    * operation both engines produce bit-identically, while a general
    * pow() is libm-dependent and would break the oracle replay. The
    * cross-source weight normalization folds a SORTED (source, w)
    * array (the q121 discipline) so the double sum has one pinned
    * order. Selection reuses the per-key md5 permille bucket, so the
    * sample is replayable row-for-row.
    *
    * Scale shape: totals/weights are per-SOURCE (metadata-sized,
    * broadcast); the corpus is touched twice — the totals aggregate
    * and the final pushdown-friendly bucket filter. */
  def temperatureMixture(df: DataFrame, sourceCol: String, keyCol: String,
                         tokensCol: String, tokenBudget: Long,
                         sqrtTimes: Int = 1): DataFrame = {
    require(tokenBudget > 0, s"tokenBudget=$tokenBudget")
    require(sqrtTimes >= 1 && sqrtTimes <= 4,
      s"sqrtTimes=$sqrtTimes — dyadic alpha only (see scaladoc)")
    val totals = df.groupBy(col(sourceCol))
      .agg(sum(col(tokensCol).cast("long")).as("tot"))
    val w = totals.withColumn("w",
      (1 to sqrtTimes).foldLeft(col("tot").cast("double"))(
        (acc, _) => sqrt(acc)))
    val wsum = w.agg(aggregate(
      sort_array(collect_list(struct(col(sourceCol).as("s"),
        col("w").as("w")))),
      lit(0.0), (acc, x) => acc + x.getField("w")).as("wsum"))
    val perm = w.crossJoin(broadcast(wsum))
      .select(col(sourceCol), col("tot"),
        least(lit(1000L),
          floor(lit(1000.0) * lit(tokenBudget.toDouble) *
            (col("w") / col("wsum")) / col("tot").cast("double")))
          .as("permille"))
    df.join(broadcast(perm), Seq(sourceCol))
      .filter(bucket(keyCol) < col("permille"))
  }

  /** DuckDB spelling of [[temperatureMixture]]'s per-source permille
    * frame: CTEs ending in `tmperm(s, tot, permille)`. The caller's
    * per-row relation must expose `source` and the token count as
    * `d(source, n_tok)`. */
  def sqlTemperatureCtes(tokenBudget: Long, sqrtTimes: Int): String = {
    val wExpr = (1 to sqrtTimes).foldLeft("CAST(tot AS DOUBLE)")(
      (acc, _) => s"sqrt($acc)")
    s"""tmtot AS (
       |  SELECT source AS s, CAST(SUM(n_tok) AS BIGINT) AS tot
       |  FROM d GROUP BY 1),
       |tmw AS (SELECT s, tot, $wExpr AS w FROM tmtot),
       |tmsum AS (
       |  SELECT list_reduce(
       |    list_prepend(CAST(0.0 AS DOUBLE),
       |      list_transform(list_sort(list({'s': s, 'w': w})),
       |        x -> x.w)),
       |    (a, b) -> a + b) AS wsum FROM tmw),
       |tmperm AS (
       |  SELECT s AS source, tot,
       |    LEAST(1000, CAST(FLOOR(1000.0 * CAST($tokenBudget AS DOUBLE) *
       |      (w / wsum) / CAST(tot AS DOUBLE)) AS BIGINT)) AS permille
       |  FROM tmw CROSS JOIN tmsum)""".stripMargin
  }

  /** Oracle spellings of [[epochOrder]]'s hash and shard. */
  def sqlEpochHash(keyExpr: String, epoch: Int): String =
    graft.functions.Scalars.sqlPortableHash64(
      s"CAST($keyExpr AS VARCHAR) || ':$epoch'")
  def sqlEpochShard(keyExpr: String, epoch: Int, shards: Int): String =
    s"CAST(${sqlEpochHash(keyExpr, epoch)} % $shards AS INTEGER)"

  /** Poisson(1) CDF prefix, c_k = e⁻¹·Σ_{j≤k} 1/j!, shared by the
    * Scala ladder and the SQL generator so both engines compare the
    * identical literal doubles (Double→shortest-string→parse
    * round-trips exactly). Truncated at 8 — P(X > 8) ≈ 1e-6, and a
    * deterministic cap keeps the weight domain bounded. */
  val poissonCdf: Seq[Double] = {
    val e = math.exp(-1.0)
    val facts = Seq(1L, 1L, 2L, 6L, 24L, 120L, 720L, 5040L)
    facts.scanLeft(0.0)((acc, f) => acc + e / f).tail
  }

  /** Deterministic Poisson(1) bootstrap weight for (key, replicate) —
    * the POISSON BOOTSTRAP (the production-scale resampling scheme:
    * classic multinomial bootstrap needs global coordination per
    * replicate; giving every row an independent Poisson(1) weight per
    * replicate is the streaming/map-side equivalent, exact as n→∞).
    * The unit variate is the 60-bit portable hash of "key:replicate"
    * scaled by 2⁻⁶⁰ (int→double is correctly rounded on both engines,
    * the scale is a power of two), inverted through the shared
    * [[poissonCdf]] ladder — every weight replays in SQL. */
  def poissonWeight(key: Column, rep: Column): Column = {
    val u = graft.functions.Scalars.portableHash64(
      concat(key.cast("string"), lit(":"), rep.cast("string")))
      .cast("double") / lit(math.pow(2, 60))
    poissonCdf.zipWithIndex.foldRight(lit(poissonCdf.size): Column) {
      case ((c, k), elseCol) => when(u < c, k).otherwise(elseCol)
    }
  }

  /** DuckDB spelling of [[poissonWeight]]. */
  def sqlPoissonWeight(keyExpr: String, repExpr: String): String = {
    val h = graft.functions.Scalars.sqlPortableHash64(
      s"CAST($keyExpr AS VARCHAR) || ':' || CAST($repExpr AS VARCHAR)")
    val u = s"(CAST($h AS DOUBLE) / ${math.pow(2, 60)})"
    val ladder = poissonCdf.zipWithIndex
      .map { case (c, k) => s"WHEN $u < $c THEN $k" }
      .mkString(" ")
    s"(CASE $ladder ELSE ${poissonCdf.size} END)"
  }
}
