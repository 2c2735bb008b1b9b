package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Batch retrieval scoring (training-data pipeline ★): BM25 over a
  * fixed query-term set — the lexical ranking a curation pipeline uses
  * to pull topic-relevant documents out of a crawl (and the classical
  * baseline the ANN tiers are compared against; Robertson & Zaragoza
  * 2009 is the public reference).
  *
  * Scale shape: the query terms are a LITERAL list, so per-document
  * term frequencies are per-row `filter` counts — no explode of the
  * corpus, no (doc, term) shuffle. Corpus statistics (N, total length,
  * per-term document frequency) are ONE scan collapsing to a single
  * row that broadcasts back onto the corpus (the q76/q100 pattern:
  * a metadata-sized cross, exactly the plan wanted at 100 TB). Scores
  * are a fixed-order sum over terms, rounded to 6 decimals (the cosine
  * rule) so ln's last-ulp divergence between engines is absorbed and
  * the ranking is hash-verifiable cross-engine.
  */
object Search {

  /** Per-document bigram cross-entropy under the corpus's own MLE
    * bigram model (the KenLM-style perplexity quality filter: docs
    * whose token transitions are improbable under the corpus LM are
    * noise — mojibake, tables, boilerplate soup — and get filtered or
    * down-weighted before training). Self-scoring means every doc
    * bigram exists in the model (count ≥ 1), so MLE needs no
    * smoothing and the score is exact:
    *
    *   xent(d) = − Σ_{b ∈ bigrams(d)} log2 P(w2|w1) / |bigrams(d)|
    *
    * Output: `(keyCol, n_bigrams, xent)`; docs with < 2 tokens are
    * dropped (no bigrams — xent undefined).
    *
    * Scale shape: the LM is the q119 bigram-count table — bounded by
    * observed bigrams (≤ min(corpus tokens, vocab²)), built with
    * map-side combine; scoring is one equi-join of (doc, bigram) rows
    * against it. The per-doc sum folds a SORTED array (collect →
    * array_sort → aggregate), so float addition order is fixed and
    * the result is reproducible across partitionings AND engines —
    * a parallel double sum would be neither. Rounded to 6 decimals
    * (the cosine rule) to absorb log's last-ulp divergence. */
  def bigramCrossEntropy(docs: DataFrame, keyCol: String,
                         textCol: String,
                         storage: org.apache.spark.storage.StorageLevel =
                           org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
                         : DataFrame = {
    // bigrams explode as (w1, w2) STRUCTS straight from the token
    // array — building "w1 w2" strings only to substring_index them
    // back apart paid a concat + two scans per bigram for nothing
    val bi = docs
      .select(col(keyCol), split(col(textCol), " ").as("__toks"))
      .select(col(keyCol),
        explode(when(size(col("__toks")) >= 2,
          transform(sequence(lit(1), size(col("__toks")) - 1),
            i => struct(element_at(col("__toks"), i).as("w1"),
              element_at(col("__toks"), i + lit(1)).as("w2"))))
          .otherwise(array().cast(
            "array<struct<w1:string,w2:string>>"))).as("p"))
      .select(col(keyCol), col("p.w1").as("w1"), col("p.w2").as("w2"))
    // per-doc distinct (w1, w2, multiplicity): the corpus explode runs
    // ONCE — the LM counts are derived from these multiplicities, not
    // from a second pass over the corpus. Persisted (spill-safe
    // MEMORY_AND_DISK by default; callers at the 100 TB tier can pass
    // DISK_ONLY or localCheckpoint upstream) because it feeds both
    // the LM build and the scoring join.
    val docBi = bi.groupBy(col(keyCol), col("w1"), col("w2"))
      .agg(count(lit(1)).as("m")).persist(storage)
    val cnt = docBi.groupBy(col("w1"), col("w2"))
      .agg(sum(col("m")).as("c"))
    val tot = cnt.groupBy(col("w1")).agg(sum(col("c")).as("tot"))
    val lm = cnt.join(tot, Seq("w1"))
      .select(col("w1"), col("w2"),
        (col("c").cast("double") / col("tot").cast("double")).as("p"))
    docBi.join(lm, Seq("w1", "w2"))
      .select(col(keyCol), col("m"),
        struct(col("w1"), col("w2"),
          (col("m").cast("double") * -log(2.0, col("p"))).as("nl"))
          .as("e"))
      .groupBy(col(keyCol))
      .agg(sum(col("m")).cast("long").as("n_bigrams"),
        array_sort(collect_list(col("e"))).as("es"))
      .select(col(keyCol), col("n_bigrams"),
        round(
          aggregate(col("es"), lit(0.0), (acc, x) => acc + x("nl"))
            / col("n_bigrams"), 6).as("xent"))
  }

  /** `(keyCol, score)` for every document with a positive score —
    * docs matching no term are dropped (their score is exactly 0).
    * `k1` saturates term frequency; `b` is length normalization. */
  def bm25(docs: DataFrame, keyCol: String, textCol: String,
           terms: Seq[String], k1: Double = 1.2,
           b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty && terms.size <= 64,
      s"terms.size=${terms.size} outside [1, 64]")
    require(terms.distinct.size == terms.size, "duplicate query terms")
    val toks = split(col(textCol), " ")
    def tf(t: String): Column =
      size(filter(toks, x => x === lit(t))).cast("double")
    // one corpus scan: N, Σ dl, and every term's document frequency
    val aggs: Seq[Column] =
      count(lit(1)).cast("double").as("n_docs") ::
        sum(size(split(col(textCol), " ")).cast("long")).cast("double")
          .as("tot_len") ::
        terms.zipWithIndex.map { case (t, i) =>
          sum(when(tf(t) > 0, 1L).otherwise(0L)).cast("double").as(s"df_$i")
        }.toList
    val stats = docs.agg(aggs.head, aggs.tail: _*)
    val dl = size(toks).cast("double")
    val avgdl = col("tot_len") / col("n_docs")
    val score = terms.zipWithIndex.map { case (t, i) =>
      val idf = log(lit(1.0) +
        (col("n_docs") - col(s"df_$i") + 0.5) / (col(s"df_$i") + 0.5))
      idf * (tf(t) * lit(k1 + 1.0)) /
        (tf(t) + lit(k1) * (lit(1.0 - b) + lit(b) * dl / avgdl))
    }.reduce(_ + _)
    docs.crossJoin(broadcast(stats))
      .select(col(keyCol), round(score, 6).as("score"))
      .filter(col("score") > 0.0)
  }

  /** Positional postings `(term, keyCol, pos)` — the inverted-index
    * row form (pos is 1-based). One explode, no shuffle; at warehouse
    * scale this frame is what gets persisted bucketed-by-term so a
    * query touches only its own terms' posting lists. */
  def positionalPostings(docs: DataFrame, keyCol: String,
                         textCol: String): DataFrame =
    docs.select(col(keyCol), posexplode(split(col(textCol), " ")))
      .select(col("col").as("term"), col(keyCol),
        (col("pos") + 1).cast("long").as("pos"))

  /** Phrase search over positional postings: for each phrase, every
    * document containing its tokens CONSECUTIVELY, with the
    * overlap-aware occurrence count and first match position.
    *
    * The classic positional-index intersection (Zobel & Moffat 2006,
    * "Inverted files for text search engines"), shaped as ONE plan
    * regardless of phrase count or length: phrase tokens become a
    * literal `(phrase, idx, term)` frame; a posting matching token
    * `idx` of a phrase votes for candidate start `pos − idx`, and a
    * start is a match iff it collects all `n_terms` votes — each
    * (doc, pos) holds one term, so votes per (phrase, doc, start, idx)
    * are unique and a plain count works. Repeated phrase tokens
    * ("a a") and overlapping matches ("a a" twice inside "a a a")
    * fall out correctly: votes for different starts never collide.
    *
    * Scale shape: the phrase-term frame is broadcast; the `isin`
    * prefilter pushes into a persisted postings scan (PushedFilters)
    * so the corpus-sized frame is never shuffled — only matched-term
    * postings reach the two bounded aggregations. Output:
    * `(phrase, keyCol, n_occ, first_pos)`. */
  def phraseSearch(postings: DataFrame, keyCol: String,
                   phrases: Seq[String]): DataFrame = {
    require(phrases.nonEmpty && phrases.size <= 256,
      s"phrases.size=${phrases.size} outside [1, 256]")
    require(phrases.forall(_.trim.nonEmpty), "empty phrase")
    val spark = postings.sparkSession
    import spark.implicits._
    val phraseTerms = phrases.flatMap { p =>
      val ts = p.split(" ").toSeq
      ts.zipWithIndex.map { case (t, i) =>
        (p, i.toLong, t, ts.size.toLong)
      }
    }.toDF("phrase", "idx", "term", "n_terms")
    val wanted = phrases.flatMap(_.split(" ")).distinct
    postings
      .where(col("term").isin(wanted: _*))
      .join(broadcast(phraseTerms), Seq("term"))
      .select(col("phrase"), col(keyCol),
        (col("pos") - col("idx")).as("start"), col("n_terms"))
      .groupBy(col("phrase"), col(keyCol), col("start"), col("n_terms"))
      .agg(count(lit(1)).as("votes"))
      .filter(col("votes") === col("n_terms"))
      .groupBy(col("phrase"), col(keyCol))
      .agg(count(lit(1)).as("n_occ"), min(col("start")).as("first_pos"))
  }

  /** Interpolated Kneser–Ney bigram cross-entropy with a SEPARATE
    * training corpus — the real CCNet/KenLM quality-gate setup (train
    * the LM on a reference corpus, score the crawl; Wenzek et al.
    * 2020, "CCNet"): scored documents contain bigrams and even
    * contexts the model never saw, so smoothing and backoff are load-
    * bearing, unlike [[bigramCrossEntropy]]'s self-scoring MLE.
    *
    * Model (all statistics from `train` only; D = `discount`):
    *   - c(w1,w2), c(w1)=Σ_w2 c(w1,w2); N1+(w1,·) distinct successors
    *     of w1; N1+(·,w2) distinct predecessors of w2; B total
    *     distinct bigrams; V distinct continuation types.
    *   - Pcont(w2) = (N1+(·,w2) + 1) / (B + V + 1) — the continuation
    *     distribution add-1 smoothed over V seen types plus one
    *     unseen bucket, so out-of-vocabulary continuations keep
    *     positive mass and every score is finite.
    *   - seen context:  P(w2|w1) = max(c(w1,w2) − D, 0)/c(w1)
    *                              + (D·N1+(w1,·)/c(w1)) · Pcont(w2)
    *   - unseen context: P(w2|w1) = Pcont(w2).
    *
    * Output `(keyCol, n_bigrams, n_unseen, oov_rate, xent)`: per-doc
    * −Σ m·log2 P / Σ m over the doc's distinct bigrams with
    * multiplicity m, plus the fraction of bigram tokens absent from
    * the training counts (the OOV feature curation stacks filter on).
    * Docs with < 2 tokens are dropped (no bigrams — xent undefined).
    *
    * Determinism: every model statistic is an exact integer; P is a
    * fixed left-to-right IEEE op sequence over exact-int doubles,
    * mirrored op-for-op by the SQL oracle; the per-doc sum folds a
    * SORTED struct array and rounds to 6 decimals (the q121 rule), so
    * the result is reproducible across partitionings and engines.
    *
    * Scale shape: the four model frames are vocabulary-/bigram-
    * bounded aggregates built with map-side combine from ONE train
    * explode; B and V collapse to a 1-row broadcast; scoring is the
    * doc-bigram frame left-joined against them (model side
    * broadcastable at any realistic vocabulary) and one per-doc
    * aggregation — no corpus-sized shuffle beyond the doc-bigram
    * grouping itself. */
  def knCrossEntropy(train: DataFrame, score: DataFrame, keyCol: String,
                     textCol: String, discount: Double = 0.75)
                     : DataFrame = {
    require(discount > 0.0 && discount < 1.0,
      s"discount=$discount outside (0, 1)")
    def bigrams(df: DataFrame, keep: Seq[Column]): DataFrame = df
      .select(keep :+ split(col(textCol), " ").as("__toks"): _*)
      .select(keep :+ explode(when(size(col("__toks")) >= 2,
        transform(sequence(lit(1), size(col("__toks")) - 1),
          i => struct(element_at(col("__toks"), i).as("w1"),
            element_at(col("__toks"), i + lit(1)).as("w2"))))
        .otherwise(array().cast(
          "array<struct<w1:string,w2:string>>"))).as("p"): _*)
      .select(keep :+ col("p.w1").as("w1") :+ col("p.w2").as("w2"): _*)
    // bigram-bounded: one train explode feeds all four model frames
    val cnt = bigrams(train, Nil)
      .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val ctx = cnt.groupBy(col("w1"))
      .agg(sum(col("c")).as("tot"), count(lit(1)).as("n1f"))
    val cont = cnt.groupBy(col("w2")).agg(count(lit(1)).as("n1b"))
    val glob = cnt.agg(count(lit(1)).as("bb"),
      count_distinct(col("w2")).as("vv"))
    val db = bigrams(score, Seq(col(keyCol)))
      .groupBy(col(keyCol), col("w1"), col("w2"))
      .agg(count(lit(1)).as("m"))
    val d = lit(discount)
    val pcont = (coalesce(col("n1b"), lit(0L)) + lit(1L)).cast("double") /
      (col("bb") + col("vv") + lit(1L)).cast("double")
    val totD = col("tot").cast("double")
    val p = when(col("tot").isNotNull,
      greatest(coalesce(col("c"), lit(0L)).cast("double") - d, lit(0.0)) /
        totD +
        (d * col("n1f").cast("double") / totD) * pcont)
      .otherwise(pcont)
    val out = db
      .join(cnt, Seq("w1", "w2"), "left")
      .join(ctx, Seq("w1"), "left")
      .join(cont, Seq("w2"), "left")
      .crossJoin(broadcast(glob))
      .select(col(keyCol), col("m"),
        when(col("c").isNull, col("m")).otherwise(lit(0L)).as("un"),
        struct(col("w1"), col("w2"),
          (col("m").cast("double") * -log(2.0, p)).as("nl")).as("e"))
      .groupBy(col(keyCol))
      .agg(sum(col("m")).cast("long").as("n_bigrams"),
        sum(col("un")).cast("long").as("n_unseen"),
        array_sort(collect_list(col("e"))).as("es"))
      .select(col(keyCol), col("n_bigrams"), col("n_unseen"),
        (col("n_unseen").cast("double") / col("n_bigrams").cast("double"))
          .as("oov_rate"),
        round(
          aggregate(col("es"), lit(0.0), (acc, x) => acc + x("nl"))
            / col("n_bigrams"), 6).as("xent"))
    out
  }

  /** DoReMi-flavored domain reweighting (Xie et al. 2023: upweight
    * the domains a WEAK proxy model loses the most on relative to a
    * reference — "learnability" — then renormalize; here ONE
    * deterministic multiplicative-weights step so the whole update
    * replays in SQL). Per domain on held-out text:
    *
    *   excess_d = max(x̄_weak(d) − x̄_ref(d), 0)
    *   weight_d = exp(η·excess_d) / Σ_d' exp(η·excess_d')
    *
    * where x̄ are per-domain means of the [[knCrossEntropy]] per-doc
    * cross-entropies under two KN models: `refTrain` selects the
    * reference corpus and `weakTrain` the (smaller) proxy corpus;
    * `scorePred` the held-out docs both models score. Docs under 2
    * tokens carry no bigrams and drop from both means identically.
    *
    * Determinism: per-doc xents are the operator's round-6 doubles;
    * means run through DECIMAL(18,6) sums; excess re-rounds the
    * 6-dp difference; exp rounds to 6 immediately (the engine's
    * shared libm stance) and the normalizer is an exact decimal sum
    * — every statistic replays bit-for-bit.
    *
    * Scale shape: two KN model builds (vocabulary-bounded aggregates
    * off one train explode each, the q155 shape), two held-out
    * scoring passes, two corpus-keyed equi-joins to attach the
    * per-doc scores, ONE |domains|-group aggregate, and a 1-row
    * normalizer cross (the q76 shape).
    *
    * Output: (grp, n_docs, xent_ref, xent_weak, excess, weight). */
  def domainExcessWeights(docs: DataFrame, groupCol: String,
                          keyCol: String, textCol: String,
                          refTrain: Column, weakTrain: Column,
                          scorePred: Column,
                          eta: Double = 1.0): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    require(eta > 0.0 && eta <= 16.0, s"eta=$eta outside (0, 16]")
    val heldOut = docs.filter(scorePred)
    val ref = knCrossEntropy(docs.filter(refTrain), heldOut,
      keyCol, textCol).select(col(keyCol), col("xent").as("x_ref"))
    val weak = knCrossEntropy(docs.filter(weakTrain), heldOut,
      keyCol, textCol).select(col(keyCol), col("xent").as("x_weak"))
    val perDoc = heldOut.select(col(keyCol), col(groupCol).as("grp"))
      .join(ref, Seq(keyCol)).join(weak, Seq(keyCol))
    def dmean(c: Column): Column =
      round(sum(c.cast(DecimalType(18, 6))).cast("double") /
        count(lit(1)).cast("double"), 6)
    val per = perDoc.groupBy(col("grp"))
      .agg(count(lit(1)).as("n_docs"), dmean(col("x_ref")).as("xent_ref"),
        dmean(col("x_weak")).as("xent_weak"))
      .withColumn("excess",
        round(greatest(col("xent_weak") - col("xent_ref"), lit(0.0)), 6))
      .withColumn("ew", round(exp(lit(eta) * col("excess")), 6))
    val norm = per.agg(
      sum(col("ew").cast(DecimalType(18, 6))).cast("double").as("nrm"))
    per.crossJoin(broadcast(norm))
      .select(col("grp"), col("n_docs"), col("xent_ref"),
        col("xent_weak"), col("excess"),
        round(col("ew") / col("nrm"), 6).as("weight"))
  }
}
