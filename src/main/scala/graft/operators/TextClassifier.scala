package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Supervised text classification (training-data pipeline ★ — the
  * model-based curation tier: C4/FineWeb-style pipelines route every
  * document through a lightweight linear classifier for domain,
  * language, or quality routing, trained on a small labeled subset and
  * applied corpus-wide). The reference's nearest analogue is its
  * lexicon sentiment tagger (`weekly_dag.py` has none; the engine's
  * q51 covers that tier) — this adds the LEARNED counterpart: a
  * multinomial Naive Bayes with add-one smoothing, trained and applied
  * in one plan with closed-form count statistics, no iterative fitting.
  *
  * Determinism contract (the q121/q155 discipline): every model
  * statistic is an exact integer from count aggregations; per-class
  * log-likelihoods fold a SORTED (token asc) struct array in IEEE
  * order, add the log-prior, and round to 6 decimals; the argmax is a
  * sort over the (rounded ll, label) pairs taking the LAST element —
  * ties break toward the lexicographically largest label, a total
  * order both engines replay bit-for-bit.
  *
  * Scale shape (100 TB lens): the model is VOCABULARY×CLASSES bounded
  * — `cc`/`ctot`/`classes` never exceed the (tiny) training vocab and
  * broadcast into the scoring joins; the corpus is exploded ONCE into
  * per-doc token counts and never shuffled on anything wider than
  * (doc, token); the two 1-row global frames (vocab size, train count)
  * are broadcast cross joins per the PlanAuditSpec whitelist. Training
  * cost is one map-side-combinable count over the labeled subset.
  */
object TextClassifier {

  /** Train a multinomial NB on `train(labelCol, textCol)` and score
    * every row of `score`, returning
    * `(keyCol, actual, pred, ll, correct)` where `ll` is the winning
    * class's rounded log2-likelihood. `score` must carry `labelCol`
    * (reported back as `actual` for accuracy audits downstream). */
  def naiveBayes(train: DataFrame, score: DataFrame, keyCol: String,
                 textCol: String, labelCol: String): DataFrame = {
    sortedLl(train, score, keyCol, textCol, labelCol)
      .select(col(keyCol), col("actual"),
        element_at(col("ss"), -1).getField("cls").as("pred"),
        (element_at(col("ss"), -1).getField("ll") + lit(0.0)).as("ll"),
        (element_at(col("ss"), -1).getField("cls") === col("actual"))
          .as("correct"))
  }

  /** Reliability-diagram calibration audit over the NB posteriors
    * (★ — the Guo et al. 2017 audit every model-based curation gate
    * needs before its scores steer a corpus: confidence = softmax of
    * the per-class log2-likelihoods, binned into `bins` equal-width
    * confidence buckets; per bucket accuracy vs mean confidence,
    * their gap, and the expected calibration error ECE =
    * Σ_b (n_b/N)·|acc_b − conf_b| carried on every row). The softmax
    * folds 2^(ll − ll_win) over the SAME sorted (ll, cls) array the
    * argmax reads, so confidence inherits the classifier's
    * determinism contract (pow is the one libm op, summed in pinned
    * order and rounded to 6); bin sums ride the Exact decimal rule.
    * Output: `(bin, n_docs, n_correct, accuracy, avg_conf, gap,
    * ece)`. */
  def calibrationBins(train: DataFrame, score: DataFrame, keyCol: String,
                      textCol: String, labelCol: String,
                      bins: Int = 10): DataFrame = {
    require(bins >= 2 && bins <= 100, s"bins=$bins outside [2, 100]")
    import org.apache.spark.sql.types.DecimalType
    val win = element_at(col("ss"), -1)
    val conf = round(lit(1.0) / aggregate(col("ss"), lit(0.0),
      (acc, x) => acc + pow(lit(2.0), x("ll") - win.getField("ll"))), 6)
    val perDoc = sortedLl(train, score, keyCol, textCol, labelCol)
      .select(
        least(floor(conf * lit(bins)).cast("long"),
          lit((bins - 1).toLong)).as("bin"),
        (win.getField("cls") === col("actual")).cast("long").as("ok"),
        conf.as("conf"))
    val binned = perDoc.groupBy(col("bin"))
      .agg(count(lit(1)).as("n_docs"), sum(col("ok")).as("n_correct"),
        sum(col("conf").cast(DecimalType(18, 6))).as("sconf"))
      .select(col("bin"), col("n_docs"), col("n_correct"),
        round(col("n_correct").cast("double") /
          col("n_docs").cast("double"), 6).as("accuracy"),
        round(col("sconf").cast("double") /
          col("n_docs").cast("double"), 6).as("avg_conf"))
      .withColumn("gap", round(abs(col("accuracy") - col("avg_conf")), 6))
    val ece = binned.agg(round(
      sum(col("gap").cast(DecimalType(18, 6)) * col("n_docs"))
        .cast("double") / sum(col("n_docs")).cast("double"), 6).as("ece"))
    binned.crossJoin(broadcast(ece))
      .select(col("bin"), col("n_docs"), col("n_correct"),
        col("accuracy"), col("avg_conf"), col("gap"), col("ece"))
  }

  /** Per-class evaluation report + chance-corrected agreement (★ —
    * the confusion-matrix tier of the classifier audit: per actual
    * class its support, predicted count, diagonal hits, precision /
    * recall / F1, plus corpus accuracy and Cohen's κ = (p_o − p_e) /
    * (1 − p_e) carried on every row — κ is the agreement statistic
    * labeled-data pipelines report between a model and its raters.
    * Classes are the ACTUAL label set (a label never predicted gets
    * precision 0; a prediction outside the actual set contributes to
    * no row but counts in the totals). All inputs are exact ints from
    * the |classes|²-bounded confusion matrix; the κ expectation's
    * rowTot·colTot products run in DECIMAL(38,0) (counts at corpus
    * scale overflow int64 products), divided in double space.
    * Degenerate p_e = 1 (single class) reports κ = 0. */
  def classReport(train: DataFrame, score: DataFrame, keyCol: String,
                  textCol: String, labelCol: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val cm = naiveBayes(train, score, keyCol, textCol, labelCol)
      .groupBy(col("actual"), col("pred")).agg(count(lit(1)).as("n"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val rt = cm.groupBy(col("actual").as("cls"))
      .agg(sum(col("n")).as("n_true"))
    val ct = cm.groupBy(col("pred").as("cls"))
      .agg(sum(col("n")).as("n_pred"))
    val dg = cm.filter(col("actual") === col("pred"))
      .groupBy(col("actual").as("cls")).agg(sum(col("n")).as("n_correct"))
    val per = rt.join(broadcast(ct), Seq("cls"), "left")
      .join(broadcast(dg), Seq("cls"), "left")
      .select(col("cls"), col("n_true"),
        coalesce(col("n_pred"), lit(0L)).as("n_pred"),
        coalesce(col("n_correct"), lit(0L)).as("n_correct"))
    val tots = cm.agg(sum(col("n")).as("nn"),
      sum(when(col("actual") === col("pred"), col("n")).otherwise(0L))
        .as("ndiag"))
    val peNum = rt.join(broadcast(ct), Seq("cls"), "left")
      .agg(sum(col("n_true").cast(DecimalType(19, 0)) *
        coalesce(col("n_pred"), lit(0L)).cast(DecimalType(19, 0)))
        .as("pe_num"))
    val glob = tots.crossJoin(broadcast(peNum))
      .select(
        round(col("ndiag").cast("double") / col("nn").cast("double"), 6)
          .as("accuracy"),
        round(col("pe_num").cast("double") /
          (col("nn").cast("double") * col("nn").cast("double")), 6)
          .as("pe"))
      .select(col("accuracy"),
        when(col("pe") < 1.0,
          round((col("accuracy") - col("pe")) / (lit(1.0) - col("pe")), 6))
          .otherwise(lit(0.0)).as("kappa"))
    val p = col("n_correct").cast("double") / col("n_pred").cast("double")
    val r = col("n_correct").cast("double") / col("n_true").cast("double")
    per.crossJoin(broadcast(glob))
      .select(col("cls"), col("n_true"), col("n_pred"), col("n_correct"),
        when(col("n_pred") > 0, round(p, 6)).otherwise(lit(0.0))
          .as("precision"),
        round(r, 6).as("recall"),
        when(col("n_pred") > 0 && (p + r) > 0,
          round(lit(2.0) * p * r / (p + r), 6)).otherwise(lit(0.0))
          .as("f1"),
        col("accuracy"), col("kappa"))
  }

  /** χ² feature selection (★ — the vocabulary-pruning tier of the
    * classifier stack: for each class, the top-k tokens by the χ²
    * statistic of the token-presence × class 2×2 table — how
    * lightweight routing classifiers (fastText-style) and lexicon
    * builders choose their feature vocabulary). Document-level
    * presence (one distinct over the exploded corpus — the single
    * corpus-sized shuffle), then every count lives on the
    * vocabulary×classes-bounded frame: a = docs of the class with the
    * token, b = other docs with it, c = class docs without it,
    * d = the rest; χ² = N(ad−bc)² / ((a+b)(c+d)(a+c)(b+d)), computed
    * in double from exact-int counts (products reach ~N⁴ — beyond
    * any fixed decimal; IEEE ops are identical in both engines) and
    * rounded to 6 before the (χ² desc, token) per-class rank. Only
    * co-occurring (token, class) pairs are scored (a ≥ 1; absent
    * pairs measure negative association, which selection never
    * keeps). An all-docs token (c+d = 0 across classes ⇒ d-side
    * degenerate) scores 0 by the denominator guard. */
  def chiSquareTokens(docs: DataFrame, keyCol: String, textCol: String,
                      labelCol: String, k: Int): DataFrame = {
    require(k >= 1 && k <= 100, s"k=$k outside [1, 100]")
    val dt = docs.select(col(labelCol).as("cls"), col(keyCol),
        explode(split(col(textCol), " ")).as("tok"))
      .distinct()
    val a = dt.groupBy(col("tok"), col("cls"))
      .agg(count(lit(1)).as("a"))
    val ta = a.groupBy(col("tok")).agg(sum(col("a")).as("ta"))
    val nc = docs.groupBy(col(labelCol).as("cls"))
      .agg(count(lit(1)).as("nc"))
    val nn = docs.agg(count(lit(1)).as("nn"))
    val d = (c: String) => col(c).cast("double")
    val (av, bv, cv, dv) = (d("a"), d("ta") - d("a"), d("nc") - d("a"),
      d("nn") - d("ta") - d("nc") + d("a"))
    val den = (av + bv) * (cv + dv) * (av + cv) * (bv + dv)
    val num = d("nn") * (av * dv - bv * cv) * (av * dv - bv * cv)
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("cls"))
      .orderBy(col("chi2").desc, col("tok"))
    a.join(ta, Seq("tok"))
      .join(broadcast(nc), Seq("cls"))
      .crossJoin(broadcast(nn))
      .select(col("cls"), col("tok"), col("a").as("n_docs"),
        when(den > 0, round(num / den, 6)).otherwise(lit(0.0))
          .as("chi2"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
  }

  /** DuckDB replay of [[chiSquareTokens]]; emits a full CTE chain
    * ending in `chitop(cls, tok, n_docs, chi2, rank)`. */
  def sqlChiSquareTokens(rel: String, keyExpr: String, textExpr: String,
                         labelExpr: String, k: Int): String =
    s"""chdt AS (
       |  SELECT DISTINCT $labelExpr AS cls, $keyExpr AS k,
       |    unnest(string_split($textExpr, ' ')) AS tok
       |  FROM $rel),
       |cha AS (
       |  SELECT tok, cls, COUNT(*) AS a FROM chdt GROUP BY 1, 2),
       |chta AS (
       |  SELECT tok, CAST(SUM(a) AS BIGINT) AS ta FROM cha GROUP BY 1),
       |chnc AS (
       |  SELECT $labelExpr AS cls, COUNT(*) AS nc FROM $rel GROUP BY 1),
       |chnn AS (SELECT COUNT(*) AS nn FROM $rel),
       |chx AS (
       |  SELECT cls, tok, a AS n_docs,
       |    CASE WHEN (CAST(ta AS DOUBLE))
       |        * (CAST(nn AS DOUBLE) - CAST(ta AS DOUBLE))
       |        * (CAST(nc AS DOUBLE))
       |        * (CAST(nn AS DOUBLE) - CAST(nc AS DOUBLE)) > 0
       |      THEN round(CAST(nn AS DOUBLE)
       |        * (CAST(a AS DOUBLE)
       |            * (CAST(nn AS DOUBLE) - CAST(ta AS DOUBLE)
       |               - CAST(nc AS DOUBLE) + CAST(a AS DOUBLE))
       |           - (CAST(ta AS DOUBLE) - CAST(a AS DOUBLE))
       |            * (CAST(nc AS DOUBLE) - CAST(a AS DOUBLE)))
       |        * (CAST(a AS DOUBLE)
       |            * (CAST(nn AS DOUBLE) - CAST(ta AS DOUBLE)
       |               - CAST(nc AS DOUBLE) + CAST(a AS DOUBLE))
       |           - (CAST(ta AS DOUBLE) - CAST(a AS DOUBLE))
       |            * (CAST(nc AS DOUBLE) - CAST(a AS DOUBLE)))
       |        / ((CAST(ta AS DOUBLE))
       |          * (CAST(nn AS DOUBLE) - CAST(ta AS DOUBLE))
       |          * (CAST(nc AS DOUBLE))
       |          * (CAST(nn AS DOUBLE) - CAST(nc AS DOUBLE))), 6)
       |      ELSE 0.0 END AS chi2
       |  FROM cha JOIN chta USING (tok) JOIN chnc USING (cls)
       |  CROSS JOIN chnn),
       |chtop AS (
       |  SELECT cls, tok, n_docs, chi2, rank FROM (
       |    SELECT cls, tok, n_docs, chi2,
       |      CAST(row_number() OVER (PARTITION BY cls
       |        ORDER BY chi2 DESC, tok) AS BIGINT) AS rank
       |    FROM chx) WHERE rank <= $k)""".stripMargin

  /** One-vs-rest ROC-AUC per class (★ — the ranking-quality tier of
    * the classifier audit: can the gate's class-c posterior SEPARATE
    * class-c documents from the rest, independent of any threshold —
    * the metric reported next to accuracy for every routing
    * classifier). AUC via the Mann–Whitney rank-sum with
    * tie-AVERAGED ranks over the round-6 posteriors:
    * AUC_c = (Σ_{pos} r̄ − n_pos(n_pos+1)/2) / (n_pos·n_neg), where
    * r̄ rides as the INTEGER 2r̄ = 2·rank_min + ties − 1 so every sum
    * is exact; the rank sums and the n(n+1) product run in
    * DECIMAL(38,0) (they reach N² — past int64 at corpus scale) and
    * only the final ratio divides in double. Posteriors come from the
    * same softmax as [[calibrationBins]], exploded to one (class,
    * score, is_pos) row per doc×class; the per-class rank is the one
    * sort this audit fundamentally needs. A class with no positives
    * or no negatives reports the uninformative 0.5. */
  def oneVsRestAuc(train: DataFrame, score: DataFrame, keyCol: String,
                   textCol: String, labelCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types.DecimalType
    val win = element_at(col("ss"), -1)
    val den = aggregate(col("ss"), lit(0.0),
      (acc, x) => acc + pow(lit(2.0), x("ll") - win.getField("ll")))
    val scoredSs = sortedLl(train, score, keyCol, textCol, labelCol)
      .select(col("actual"), col("ss"), den.as("den"))
      .select(col("actual"), explode(col("ss")).as("e"),
        element_at(col("ss"), -1).getField("ll").as("llw"), col("den"))
      .select(col("e").getField("cls").as("cls"),
        round(pow(lit(2.0), col("e").getField("ll") - col("llw")) /
          col("den"), 6).as("p"),
        (col("e").getField("cls") === col("actual")).as("pos"))
    val wRank = Window.partitionBy(col("cls")).orderBy(col("p"))
    val wTie = Window.partitionBy(col("cls"), col("p"))
    val ranked = scoredSs
      .withColumn("r2",
        lit(2L) * rank().over(wRank).cast("long") +
          count(lit(1)).over(wTie) - lit(1L))
    ranked.groupBy(col("cls"))
      .agg(sum(when(col("pos"), 1L).otherwise(0L)).as("n_pos"),
        sum(when(!col("pos"), 1L).otherwise(0L)).as("n_neg"),
        sum(when(col("pos"), col("r2")).otherwise(lit(0L))
          .cast(DecimalType(38, 0))).as("sr2"))
      .select(col("cls"), col("n_pos"), col("n_neg"),
        when(col("n_pos") > 0 && col("n_neg") > 0,
          round((col("sr2") -
            col("n_pos").cast(DecimalType(19, 0)) *
              (col("n_pos") + 1L).cast(DecimalType(19, 0)))
            .cast("double") /
            (lit(2.0) * col("n_pos").cast("double") *
              col("n_neg").cast("double")), 6))
          .otherwise(lit(0.5)).as("auc"))
  }

  /** DuckDB replay of [[oneVsRestAuc]]: extends the [[sqlNaiveBayes]]
    * chain from `nbsort`; ends in `nbauc(cls, n_pos, n_neg, auc)`. */
  def sqlOneVsRestAuc: String =
    s"""aucs AS (
       |  SELECT e.cls AS cls,
       |    round(power(2.0, e.ll - ss[len(ss)].ll)
       |      / list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |          list_transform(ss,
       |            x -> power(2.0, x.ll - ss[len(ss)].ll))),
       |        (a, b) -> a + b), 6) AS p,
       |    e.cls = actual AS pos
       |  FROM nbsort, LATERAL (SELECT unnest(ss) AS e)),
       |aucr AS (
       |  SELECT cls, pos,
       |    2 * CAST(rank() OVER (PARTITION BY cls ORDER BY p)
       |      AS BIGINT)
       |      + CAST(COUNT(*) OVER (PARTITION BY cls, p) AS BIGINT) - 1
       |      AS r2
       |  FROM aucs),
       |nbauc AS (
       |  SELECT cls,
       |    CAST(SUM(CASE WHEN pos THEN 1 ELSE 0 END) AS BIGINT)
       |      AS n_pos,
       |    CAST(SUM(CASE WHEN pos THEN 0 ELSE 1 END) AS BIGINT)
       |      AS n_neg,
       |    CASE WHEN SUM(CASE WHEN pos THEN 1 ELSE 0 END) > 0
       |           AND SUM(CASE WHEN pos THEN 0 ELSE 1 END) > 0
       |      THEN round(CAST(SUM(CASE WHEN pos
       |            THEN CAST(r2 AS DECIMAL(38,0))
       |            ELSE CAST(0 AS DECIMAL(38,0)) END)
       |          - CAST(SUM(CASE WHEN pos THEN 1 ELSE 0 END)
       |              AS DECIMAL(19,0))
       |            * CAST(SUM(CASE WHEN pos THEN 1 ELSE 0 END) + 1
       |              AS DECIMAL(19,0)) AS DOUBLE)
       |        / (2.0
       |          * CAST(SUM(CASE WHEN pos THEN 1 ELSE 0 END) AS DOUBLE)
       |          * CAST(SUM(CASE WHEN pos THEN 0 ELSE 1 END)
       |            AS DOUBLE)), 6)
       |      ELSE 0.5 END AS auc
       |  FROM aucr GROUP BY 1)""".stripMargin

  /** The shared train-and-score chain: per scored row, the SORTED
    * (ll, cls) per-class log2-likelihood array — argmax and softmax
    * both read the last element. */
  private def sortedLl(train: DataFrame, score: DataFrame, keyCol: String,
                       textCol: String, labelCol: String): DataFrame = {
    def toks(df: DataFrame) = df.select(col(labelCol).as("cls"),
      explode(split(col(textCol), " ")).as("tok"))
    // model frames — all vocabulary×classes bounded, broadcastable
    val ttoks = toks(train)
    val cc = ttoks.groupBy(col("cls"), col("tok"))
      .agg(count(lit(1)).as("c"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val ctot = cc.groupBy(col("cls")).agg(sum(col("c")).as("tot"))
    val classes = train.groupBy(col(labelCol).as("cls"))
      .agg(count(lit(1)).as("nd"))
    val glob = cc.agg(count_distinct(col("tok")).as("v"))
      .crossJoin(broadcast(train.agg(count(lit(1)).as("n"))))
    // corpus side: ONE explode into per-doc token counts
    val dt = score
      .select(col(keyCol), col(labelCol).as("actual"),
        explode(split(col(textCol), " ")).as("tok"))
      .groupBy(col(keyCol), col("actual"), col("tok"))
      .agg(count(lit(1)).as("m"))
    val nl = col("m").cast("double") * log(2.0,
      (coalesce(col("c"), lit(0L)) + lit(1L)).cast("double") /
        (col("tot") + col("v")).cast("double"))
    val perClass = dt
      .crossJoin(broadcast(classes))
      .join(broadcast(cc), Seq("cls", "tok"), "left")
      .join(broadcast(ctot), Seq("cls"))
      .crossJoin(broadcast(glob))
      .groupBy(col(keyCol), col("actual"), col("cls"), col("nd"),
        col("n"))
      .agg(array_sort(collect_list(struct(col("tok"), nl.as("nl"))))
        .as("es"))
      .select(col(keyCol), col("actual"), col("cls"),
        round(log(2.0, col("nd").cast("double") / col("n").cast("double"))
          + aggregate(col("es"), lit(0.0), (acc, x) => acc + x("nl")), 6)
          .as("ll"))
    perClass
      .groupBy(col(keyCol), col("actual"))
      .agg(array_sort(collect_list(struct(col("ll"), col("cls"))))
        .as("ss"))
  }

  /** DuckDB replay of [[naiveBayes]] over table `rel` with the same
    * train filter; emits the full CTE chain ending in relation
    * `nbpred(key, actual, pred, ll, correct)`. */
  def sqlNaiveBayes(rel: String, keyExpr: String, textExpr: String,
                    labelExpr: String, trainWhere: String): String =
    s"""nbtr AS (
       |  SELECT $keyExpr AS k, $labelExpr AS cls, $textExpr AS t
       |  FROM $rel WHERE $trainWhere),
       |nbtok AS (
       |  SELECT cls, unnest(string_split(t, ' ')) AS tok FROM nbtr),
       |nbcc AS (
       |  SELECT cls, tok, COUNT(*) AS c FROM nbtok GROUP BY 1, 2),
       |nbctot AS (
       |  SELECT cls, CAST(SUM(c) AS BIGINT) AS tot FROM nbcc GROUP BY 1),
       |nbcls AS (SELECT cls, COUNT(*) AS nd FROM nbtr GROUP BY 1),
       |nbglob AS (
       |  SELECT (SELECT COUNT(DISTINCT tok) FROM nbcc) AS v,
       |         (SELECT COUNT(*) FROM nbtr) AS n),
       |nbdt AS (
       |  SELECT k, actual, tok, COUNT(*) AS m FROM (
       |    SELECT $keyExpr AS k, $labelExpr AS actual,
       |      unnest(string_split($textExpr, ' ')) AS tok FROM $rel)
       |  GROUP BY 1, 2, 3),
       |nbpc AS (
       |  SELECT k, actual, cls,
       |    round(ln(CAST(nd AS DOUBLE) / CAST(n AS DOUBLE)) / ln(2)
       |      + list_reduce(list_prepend(0.0, list_transform(
       |          list_sort(list({'tok': tok,
       |            'nl': CAST(m AS DOUBLE) * ln(
       |              CAST(COALESCE(c, 0) + 1 AS DOUBLE)
       |                / CAST(tot + v AS DOUBLE)) / ln(2)})),
       |          x -> x.nl)), (acc, x) -> acc + x), 6) AS ll
       |  FROM nbdt CROSS JOIN nbcls
       |    LEFT JOIN nbcc USING (cls, tok)
       |    JOIN nbctot USING (cls) CROSS JOIN nbglob
       |  GROUP BY k, actual, cls, nd, n, tot, v),
       |nbsort AS (
       |  SELECT k, actual,
       |    list_sort(list({'ll': ll, 'cls': cls})) AS ss
       |  FROM nbpc GROUP BY 1, 2),
       |nbpred AS (
       |  SELECT k, actual, ss[len(ss)].cls AS pred,
       |    ss[len(ss)].ll + 0.0 AS ll,
       |    ss[len(ss)].cls = actual AS correct
       |  FROM nbsort)""".stripMargin

  /** DuckDB replay of [[calibrationBins]]: extends the
    * [[sqlNaiveBayes]] chain (must precede this fragment) from
    * `nbsort` through softmax confidence, binning, and ECE; ends in
    * relation `nbcal(bin, n_docs, n_correct, accuracy, avg_conf,
    * gap, ece)`. */
  def sqlCalibrationBins(bins: Int): String = {
    require(bins >= 2 && bins <= 100, s"bins=$bins outside [2, 100]")
    s"""nbconf AS (
       |  SELECT least(CAST(floor(
       |      round(1.0 / list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |        list_transform(ss,
       |          x -> power(2.0, x.ll - ss[len(ss)].ll))),
       |        (a, b) -> a + b), 6) * $bins) AS BIGINT),
       |      ${bins - 1}) AS bin,
       |    CASE WHEN ss[len(ss)].cls = actual THEN 1 ELSE 0 END AS ok,
       |    round(1.0 / list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |      list_transform(ss, x -> power(2.0, x.ll - ss[len(ss)].ll))),
       |      (a, b) -> a + b), 6) AS conf
       |  FROM nbsort),
       |nbbin AS (
       |  SELECT bin, COUNT(*) AS n_docs,
       |    CAST(SUM(ok) AS BIGINT) AS n_correct,
       |    round(CAST(SUM(ok) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6)
       |      AS accuracy,
       |    round(CAST(SUM(CAST(conf AS DECIMAL(18,6))) AS DOUBLE)
       |      / CAST(COUNT(*) AS DOUBLE), 6) AS avg_conf
       |  FROM nbconf GROUP BY 1),
       |nbgap AS (
       |  SELECT bin, n_docs, n_correct, accuracy, avg_conf,
       |    round(abs(accuracy - avg_conf), 6) AS gap
       |  FROM nbbin),
       |nbece AS (
       |  SELECT round(CAST(SUM(CAST(gap AS DECIMAL(18,6)) * n_docs)
       |      AS DOUBLE) / CAST(SUM(n_docs) AS DOUBLE), 6) AS ece
       |  FROM nbgap),
       |nbcal AS (
       |  SELECT bin, n_docs, n_correct, accuracy, avg_conf, gap, ece
       |  FROM nbgap CROSS JOIN nbece)""".stripMargin
  }

  /** DuckDB replay of [[classReport]]: extends the [[sqlNaiveBayes]]
    * chain (must precede this fragment) from `nbpred` through the
    * confusion matrix, per-class metrics, accuracy, and Cohen's κ;
    * ends in relation `nbrep(cls, n_true, n_pred, n_correct,
    * precision, recall, f1, accuracy, kappa)`. */
  def sqlClassReport: String =
    s"""cmc AS (
       |  SELECT actual, pred, COUNT(*) AS n FROM nbpred GROUP BY 1, 2),
       |crt AS (
       |  SELECT actual AS cls, CAST(SUM(n) AS BIGINT) AS n_true
       |  FROM cmc GROUP BY 1),
       |cct AS (
       |  SELECT pred AS cls, CAST(SUM(n) AS BIGINT) AS n_pred
       |  FROM cmc GROUP BY 1),
       |cdg AS (
       |  SELECT actual AS cls, CAST(SUM(n) AS BIGINT) AS n_correct
       |  FROM cmc WHERE actual = pred GROUP BY 1),
       |cper AS (
       |  SELECT crt.cls, crt.n_true,
       |    COALESCE(cct.n_pred, 0) AS n_pred,
       |    COALESCE(cdg.n_correct, 0) AS n_correct
       |  FROM crt LEFT JOIN cct ON cct.cls = crt.cls
       |  LEFT JOIN cdg ON cdg.cls = crt.cls),
       |ctot AS (
       |  SELECT CAST(SUM(n) AS BIGINT) AS nn,
       |    CAST(SUM(CASE WHEN actual = pred THEN n ELSE 0 END)
       |      AS BIGINT) AS ndiag
       |  FROM cmc),
       |cpen AS (
       |  SELECT SUM(CAST(crt.n_true AS DECIMAL(19,0)) *
       |    CAST(COALESCE(cct.n_pred, 0) AS DECIMAL(19,0))) AS pe_num
       |  FROM crt LEFT JOIN cct ON cct.cls = crt.cls),
       |cglob AS (
       |  SELECT accuracy,
       |    CASE WHEN pe < 1.0
       |      THEN round((accuracy - pe) / (1.0 - pe), 6)
       |      ELSE 0.0 END AS kappa
       |  FROM (
       |    SELECT
       |      round(CAST(ndiag AS DOUBLE) / CAST(nn AS DOUBLE), 6)
       |        AS accuracy,
       |      round(CAST(pe_num AS DOUBLE)
       |        / (CAST(nn AS DOUBLE) * CAST(nn AS DOUBLE)), 6) AS pe
       |    FROM ctot CROSS JOIN cpen)),
       |nbrep AS (
       |  SELECT cls, n_true, n_pred, n_correct,
       |    CASE WHEN n_pred > 0
       |      THEN round(CAST(n_correct AS DOUBLE)
       |        / CAST(n_pred AS DOUBLE), 6)
       |      ELSE 0.0 END AS precision,
       |    round(CAST(n_correct AS DOUBLE) / CAST(n_true AS DOUBLE), 6)
       |      AS recall,
       |    CASE WHEN n_pred > 0 AND
       |      (CAST(n_correct AS DOUBLE) / CAST(n_pred AS DOUBLE)
       |        + CAST(n_correct AS DOUBLE) / CAST(n_true AS DOUBLE)) > 0
       |      THEN round(2.0
       |        * (CAST(n_correct AS DOUBLE) / CAST(n_pred AS DOUBLE))
       |        * (CAST(n_correct AS DOUBLE) / CAST(n_true AS DOUBLE))
       |        / (CAST(n_correct AS DOUBLE) / CAST(n_pred AS DOUBLE)
       |          + CAST(n_correct AS DOUBLE) / CAST(n_true AS DOUBLE)), 6)
       |      ELSE 0.0 END AS f1,
       |    accuracy, kappa
       |  FROM cper CROSS JOIN cglob)""".stripMargin
}
