package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Unigram language-model tokenizer training (Kudo 2018, the
  * SentencePiece algorithm — the OTHER subword family next to
  * [[Bpe]]: where BPE grows a vocabulary bottom-up by merging, the
  * unigram model starts from a large seed vocabulary and fits piece
  * probabilities so each word's segmentation maximizes Σ log p).
  *
  * This is the deterministic Viterbi hard-EM variant, engineered so
  * every step replays bit-for-bit in DuckDB:
  *
  *  - SEED: all substrings of length ≤ `maxPieceLen` of the word
  *    table, weighted by word frequency; the top-`seedSize` by
  *    (freq DESC, piece ASC) plus ALL single characters (coverage —
  *    every word stays segmentable).
  *  - E-STEP (Viterbi): per word, the min-cost segmentation under
  *    cost = −log p, computed by the classic left-to-right DP. Every
  *    dp cost is round-6 quantized AFTER each addition, so cost
  *    comparisons are comparisons of round-6 doubles — identical in
  *    both engines — and ties break on the smallest backpointer
  *    (= the longest piece), a total order.
  *  - M-STEP: piece counts over the best segmentations (exact ints);
  *    pieces with count 0 drop (every used piece survives, so every
  *    word's round-1 segmentation — hence segmentability — is
  *    preserved); log p = round(ln(count / total), 6).
  *  - Two EM rounds, then final counts.
  *
  * Scale shape: the corpus is scanned ONCE (the word-frequency
  * aggregate — the [[Bpe]] property); everything after runs on the
  * vocabulary-bounded word table. The span table is |words| ×
  * O(len × maxPieceLen) rows; the piece table (≤ seedSize + charset)
  * BROADCASTS into the span join; the DP is a per-row fold, no
  * shuffle. Words are `^[a-z0-9]+$` with length ≤ 24 (mirrored in
  * the oracle; the cap bounds the oracle's recursion depth and the
  * fold width).
  *
  * Float caveat (the KN-perplexity stance): ln() is the one libm op;
  * both engines round its result to 6 immediately, so only a value
  * landing within an ulp of a rounding boundary could diverge —
  * accepted, as for q155's cross-entropy.
  */
object Unigram {

  val MaxWordLen = 24

  /** Train 2 Viterbi-EM rounds; returns the final piece table
    * `(piece, piece_len, cnt)` — exact ints, no float in the output
    * contract. */
  def trainCounts(docs: DataFrame, textCol: String,
                  seedSize: Int = 256, maxPieceLen: Int = 4): DataFrame =
    pieceCounts(train(docs, textCol, seedSize, maxPieceLen))
      .select(col("piece"), length(col("piece")).as("piece_len"),
        col("c").as("cnt"))

  /** Apply the trained segmentation back to the corpus, keyed (the
    * q187 fertility audit under the unigram vocabulary): per key,
    * word/char/piece counts plus compression and fertility. Encoding
    * is the [[Bpe.encodedLengths]] shape — the final word table
    * already holds each word's segmentation, so the corpus explode
    * joins the BROADCAST vocabulary-bounded table; words outside the
    * trained charset/length cap drop out in the join exactly as they
    * never entered training. */
  def encodedLengths(docs: DataFrame, keyCol: String, textCol: String,
                     seedSize: Int = 256, maxPieceLen: Int = 4)
      : DataFrame = {
    val seg = train(docs, textCol, seedSize, maxPieceLen)
      .select(col("word"), size(col("pieces")).cast("long").as("n_sub"),
        length(col("word")).cast("long").as("n_chr"))
    docs.select(col(keyCol), explode(split(col(textCol), " ")).as("word"))
      .join(broadcast(seg), Seq("word"))
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_words"), sum(col("n_chr")).as("n_chars"),
        sum(col("n_sub")).as("n_pieces"))
      .select(col(keyCol), col("n_words"), col("n_chars"),
        col("n_pieces"),
        (col("n_chars").cast("double") / col("n_pieces").cast("double"))
          .as("compression"),
        (col("n_pieces").cast("double") / col("n_words").cast("double"))
          .as("fertility"))
  }

  /** The shared EM chain; returns the ROUND-2 segmentation frame
    * `(word, cnt, pieces)`. */
  private def train(docs: DataFrame, textCol: String,
                    seedSize: Int, maxPieceLen: Int): DataFrame = {
    require(seedSize >= 16 && seedSize <= 4096,
      s"seedSize=$seedSize outside [16, 4096]")
    require(maxPieceLen >= 2 && maxPieceLen <= 8,
      s"maxPieceLen=$maxPieceLen outside [2, 8]")
    // the ONE corpus pass; cached (vocab-bounded — kilobytes per
    // thousand distinct words) because the span explode re-derives
    // from it three times (seed, round-1 spans, round-2 spans). The
    // harness drops per-query caches after materialization.
    val wt = docs
      .select(explode(split(col(textCol), " ")).as("word"))
      .filter(col("word").rlike("^[a-z0-9]+$") &&
        length(col("word")) <= MaxWordLen)
      .groupBy(col("word")).agg(count(lit(1)).as("cnt"))
      .cache()
    val subs = spanTable(wt, maxPieceLen)
    val seedf = subs.groupBy(col("sub").as("piece"))
      .agg(sum(col("cnt")).as("f"))
    val p0 = seedf.orderBy(col("f").desc, col("piece")).limit(seedSize)
      .unionByName(seedf.filter(length(col("piece")) === 1))
      .dropDuplicates("piece")
    val v0 = withLogProb(p0, "f")
    val c1 = pieceCounts(viterbi(subs, v0))
    val v1 = withLogProb(c1, "c")
    viterbi(subs, v1)
  }

  /** All (word, cnt, s, e, sub) spans of the word table: start s
    * (0-based), end e = s + len, piece text. Word-table-bounded. */
  private def spanTable(wt: DataFrame, maxPieceLen: Int): DataFrame = {
    val n = length(col("word"))
    val spans = flatten(transform(sequence(lit(0), n - 1), s =>
      transform(sequence(lit(1), least(lit(maxPieceLen), n - s)), l =>
        struct(s.as("s"), (s + l).as("e"),
          col("word").substr(s + 1, l).as("sub")))))
    wt.select(col("word"), col("cnt"), explode(spans).as("sp"))
      .select(col("word"), col("cnt"), col("sp.s").as("s"),
        col("sp.e").as("e"), col("sp.sub").as("sub"))
  }

  /** round-6 log-probability from a count column over the piece
    * frame's own total (1-row broadcast cross). */
  private def withLogProb(pieces: DataFrame, cntCol: String): DataFrame = {
    val tot = pieces.agg(sum(col(cntCol)).as("t"))
    pieces.crossJoin(broadcast(tot))
      .select(col("piece"),
        (round(log(col(cntCol).cast("double") / col("t").cast("double")),
          6) + lit(0.0)).as("lp"))
  }

  /** Per word, the Viterbi-best segmentation under the piece table:
    * `(word, cnt, pieces: array<string>)`. DP costs round-6 after
    * each addition; ties → smallest backpointer (longest piece). */
  private def viterbi(subs: DataFrame, pieces: DataFrame): DataFrame = {
    val spArr = subs
      .join(broadcast(pieces.withColumnRenamed("piece", "sub")), Seq("sub"))
      .groupBy(col("word"), col("cnt"))
      .agg(array_sort(collect_list(
        struct(col("e"), col("s"), col("lp")))).as("sp"))
    // unreachable positions (possible in round 2: an unused single
    // char dropped from the vocabulary) carry a 1e9 sentinel cost —
    // finite, so no NULL ever enters a struct comparison (engines
    // disagree on NULL ordering), and ≫ any real path (≤ 24 pieces ×
    // |ln pmin| ≈ 400), so a sentinel chain never beats a real
    // segmentation at the word boundary — which always has one: the
    // previous round's pieces all survive the count filter
    val unreachable = struct(lit(1.0e9).as("cost"), lit(-1).as("bp"))
    val dp = aggregate(
      sequence(lit(1), length(col("word"))),
      array(struct(lit(0.0).as("cost"), lit(-1).as("bp"))),
      (acc: Column, i: Column) => concat(acc, array(coalesce(array_min(
        transform(filter(col("sp"), x => x("e") === i),
          x => struct(
            round(element_at(acc, x("s") + 1)("cost") - x("lp"), 6)
              .as("cost"),
            x("s").as("bp")))), unreachable))))
    val withDp = spArr.select(col("word"), col("cnt"), dp.as("dp"))
    // backwalk: n steps suffice (each step consumes ≥ 1 character);
    // once pos reaches 0 the fold is a no-op
    val walk = aggregate(
      sequence(lit(1), length(col("word"))),
      struct(length(col("word")).as("pos"),
        typedlit(Seq.empty[String]).as("ps")),
      (acc: Column, _: Column) => {
        val bp = element_at(col("dp"), acc("pos") + 1)("bp")
        when(acc("pos") <= 0, acc).otherwise(
          struct(bp.as("pos"),
            concat(acc("ps"),
              array(col("word").substr(bp + 1, acc("pos") - bp)))
              .as("ps")))
      })
    withDp.select(col("word"), col("cnt"), walk("ps").as("pieces"))
  }

  /** Exact weighted piece counts over best segmentations. */
  private def pieceCounts(seg: DataFrame): DataFrame =
    seg.select(col("cnt"), explode(col("pieces")).as("piece"))
      .groupBy(col("piece")).agg(sum(col("cnt")).as("c"))

  // ---------------------------------------------------------------
  // DuckDB twins — the same arithmetic, recursion instead of folds
  // (list_reduce mutates struct accumulators in place — the q202
  // trap — so both the DP and the backwalk are RECURSIVE CTEs).
  // ---------------------------------------------------------------

  /** Viterbi + backwalk CTE pair for round `r`, reading spans from
    * `sp$r` (word, cnt, sp) and producing `done$r` (word, cnt, ps). */
  private def sqlViterbi(r: Int): String =
    s"""rec$r AS (
       |  SELECT word, cnt, sp, 0 AS i,
       |    [{'cost': CAST(0 AS DOUBLE), 'bp': CAST(-1 AS BIGINT)}] AS dp
       |  FROM sp$r
       |  UNION ALL
       |  SELECT word, cnt, sp, i + 1,
       |    list_append(dp, COALESCE(list_sort(list_transform(
       |      list_filter(sp, x -> x.e = i + 1),
       |      x -> {'cost': round(dp[x.s + 1].cost - x.lp, 6),
       |            'bp': x.s}))[1],
       |      {'cost': CAST(1000000000 AS DOUBLE),
       |       'bp': CAST(-1 AS BIGINT)}))
       |  FROM rec$r WHERE i < len(word)),
       |d$r AS (SELECT word, cnt, dp FROM rec$r WHERE i = len(word)),
       |bw$r AS (
       |  SELECT word, cnt, dp, len(word) AS pos,
       |    CAST([] AS VARCHAR[]) AS ps
       |  FROM d$r
       |  UNION ALL
       |  SELECT word, cnt, dp, dp[pos + 1].bp AS pos,
       |    list_append(ps,
       |      substr(word, dp[pos + 1].bp + 1, pos - dp[pos + 1].bp)) AS ps
       |  FROM bw$r WHERE pos > 0),
       |done$r AS (SELECT word, cnt, ps FROM bw$r WHERE pos = 0)"""
      .stripMargin

  /** Full training replay: the CTE chain ending in `out` =
    * (piece, piece_len, cnt) for the final round. */
  def sqlTrainCounts(table: String, textCol: String,
                     seedSize: Int = 256, maxPieceLen: Int = 4): String =
    sqlCtes(table, textCol, seedSize, maxPieceLen) +
      s""",
         |c2 AS (
         |  SELECT piece, CAST(SUM(cnt) AS BIGINT) AS c FROM (
         |    SELECT cnt, unnest(ps) AS piece FROM done2) GROUP BY 1),
         |out AS (
         |  SELECT piece, CAST(len(piece) AS INTEGER) AS piece_len,
         |    c AS cnt
         |  FROM c2)""".stripMargin

  /** DuckDB replay of [[encodedLengths]]: the training CTEs, then the
    * corpus explode joined against the round-2 segmentation. */
  def sqlEncodedLengths(table: String, keyCol: String, textCol: String,
                        seedSize: Int = 256, maxPieceLen: Int = 4): String =
    sqlCtes(table, textCol, seedSize, maxPieceLen) +
      s""",
         |dw AS (
         |  SELECT $keyCol, unnest(string_split($textCol, ' ')) AS word
         |  FROM $table),
         |enc AS (
         |  SELECT $keyCol, CAST(len(ps) AS BIGINT) AS n_sub,
         |    CAST(len(word) AS BIGINT) AS n_chr
         |  FROM dw JOIN done2 USING (word))
         |SELECT $keyCol, COUNT(*) AS n_words,
         |  CAST(SUM(n_chr) AS BIGINT) AS n_chars,
         |  CAST(SUM(n_sub) AS BIGINT) AS n_pieces,
         |  CAST(SUM(n_chr) AS DOUBLE) / CAST(SUM(n_sub) AS DOUBLE)
         |    AS compression,
         |  CAST(SUM(n_sub) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
         |    AS fertility
         |FROM enc GROUP BY 1 ORDER BY 1""".stripMargin

  /** The shared training CTE chain, ending in `done2` =
    * (word, cnt, ps) — the round-2 Viterbi segmentation. */
  private def sqlCtes(table: String, textCol: String,
                      seedSize: Int, maxPieceLen: Int): String =
    s"""WITH RECURSIVE w0 AS (
       |  SELECT word, COUNT(*) AS cnt FROM (
       |    SELECT unnest(string_split($textCol, ' ')) AS word
       |    FROM $table)
       |  WHERE regexp_matches(word, '^[a-z0-9]+$$')
       |    AND len(word) <= $MaxWordLen
       |  GROUP BY 1),
       |subs AS (
       |  SELECT word, cnt, s, s + l AS e, substr(word, s + 1, l) AS sub
       |  FROM (
       |    SELECT word, cnt, unnest(range(0, len(word))) AS s FROM w0),
       |    LATERAL (SELECT unnest(range(1,
       |      least($maxPieceLen, len(word) - s) + 1)) AS l)),
       |seedf AS (
       |  SELECT sub AS piece, CAST(SUM(cnt) AS BIGINT) AS f
       |  FROM subs GROUP BY 1),
       |p0 AS (
       |  SELECT DISTINCT piece, f FROM (
       |    SELECT piece, f FROM
       |      (SELECT piece, f FROM seedf ORDER BY f DESC, piece
       |       LIMIT $seedSize)
       |    UNION ALL
       |    SELECT piece, f FROM seedf WHERE len(piece) = 1)),
       |t0 AS (SELECT CAST(SUM(f) AS BIGINT) AS t FROM p0),
       |v0 AS (
       |  SELECT piece,
       |    round(ln(CAST(f AS DOUBLE) / CAST(t AS DOUBLE)), 6) + 0.0
       |      AS lp
       |  FROM p0 CROSS JOIN t0),
       |sp1 AS (
       |  SELECT su.word, su.cnt,
       |    list_sort(list({'e': su.e, 's': su.s, 'lp': v.lp})) AS sp
       |  FROM subs su JOIN v0 v ON v.piece = su.sub
       |  GROUP BY su.word, su.cnt),
       |${sqlViterbi(1)},
       |c1 AS (
       |  SELECT piece, CAST(SUM(cnt) AS BIGINT) AS c FROM (
       |    SELECT cnt, unnest(ps) AS piece FROM done1) GROUP BY 1),
       |t1 AS (SELECT CAST(SUM(c) AS BIGINT) AS t FROM c1),
       |v1 AS (
       |  SELECT piece,
       |    round(ln(CAST(c AS DOUBLE) / CAST(t AS DOUBLE)), 6) + 0.0
       |      AS lp
       |  FROM c1 CROSS JOIN t1),
       |sp2 AS (
       |  SELECT su.word, su.cnt,
       |    list_sort(list({'e': su.e, 's': su.s, 'lp': v.lp})) AS sp
       |  FROM subs su JOIN v1 v ON v.piece = su.sub
       |  GROUP BY su.word, su.cnt),
       |${sqlViterbi(2)}""".stripMargin
}
