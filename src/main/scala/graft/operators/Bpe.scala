package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed BPE tokenizer training (training-data pipeline ★):
  * learn the top-k byte-pair merges from a corpus — the algorithm
  * behind every modern subword vocabulary (Sennrich et al. 2016,
  * "Neural Machine Translation of Rare Words with Subword Units").
  *
  * Formulated on the WORD-FREQUENCY TABLE, not the corpus: the corpus
  * is scanned exactly once (word counts with map-side combine), and
  * every merge iteration runs over the vocabulary-bounded table —
  * at 100 TB the corpus never re-enters the loop, which is what makes
  * distributed BPE training tractable (pair statistics over a 10⁵–10⁷
  * row word table, not 10¹² tokens).
  *
  * Per iteration: adjacent-pair counts weighted by word frequency
  * (one vocabulary-sized shuffle), a TakeOrdered(1) argmax with the
  * deterministic tie-break (count DESC, pair ASC), and a leftmost-
  * greedy merge fold applied to each word's token array (`aggregate`
  * over the tail: a pair merges iff the accumulator's LAST token is
  * the left part — so "a a a a" under (a,a) becomes [aa, aa], the
  * standard non-overlapping scan, and a token just created can itself
  * absorb the next element). The table is `localCheckpoint`ed each
  * round (the PageRank lineage discipline) so the plan stays flat
  * however many merges are learned.
  *
  * Words are restricted to `^[a-z0-9]+$` (mirrored in the oracle);
  * merged tokens are concatenations over that charset, which is what
  * lets the SQL replay fold token lists through a '|'-delimited
  * string accumulator without collision.
  *
  * Output: `(merge_rank, lhs, rhs, merged, pair_count)`, one row per
  * learned merge in rank order; fewer than k rows iff the vocabulary
  * exhausts (every word collapsed to one token). All outputs are
  * exact ints/strings — no float anywhere, so the DuckDB oracle
  * ([[sqlLearnMerges]] unrolls the same k iterations as CTEs) matches
  * bit-for-bit.
  */
object Bpe {

  /** The word stream the trainer and encoder share: a plain
    * whitespace split, optionally preceded by the deterministic
    * spaceless-script segmentation
    * ([[graft.functions.TextFunctions.segmentText]]) that turns each
    * CJK/Thai run into its own word — the run is then character-split
    * into initial tokens exactly like a Latin word, so BPE learns
    * merges WITHIN runs and fertility on spaceless scripts measures
    * real subword counts. */
  private def wordStream(textCol: String, segment: Boolean)
      : org.apache.spark.sql.Column =
    if (segment)
      split(graft.functions.TextFunctions.segmentText(col(textCol)), " ")
    else split(col(textCol), " ")

  /** Trainable-word charset: [a-z0-9]+ always; with segmentation on,
    * also pure spaceless-script runs. Both charsets exclude the '|'
    * delimiter the SQL replay folds through. */
  private def charsetRe(segment: Boolean): String =
    if (segment)
      s"^[a-z0-9]+$$|^${graft.functions.TextFunctions.spacelessClass}+$$"
    else "^[a-z0-9]+$"

  /** SQL twin of [[wordStream]]. */
  private def sqlWordStream(textCol: String, segment: Boolean): String =
    if (segment)
      s"string_split(${graft.functions.TextFunctions.sqlSegmentText(textCol)}, ' ')"
    else s"string_split($textCol, ' ')"

  /** SQL twin of [[charsetRe]] (single-quoted for interpolation). */
  private def sqlCharsetRe(segment: Boolean): String =
    if (segment)
      s"'^[a-z0-9]+$$|^${graft.functions.TextFunctions.spacelessClass}+$$'"
    else "'^[a-z0-9]+$'"

  def learnMerges(docs: DataFrame, textCol: String, k: Int,
                  segment: Boolean = false): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    train(docs, textCol, k, segment)._2
      .toDF("merge_rank", "lhs", "rhs", "merged", "pair_count")
  }

  /** Apply the learned segmentation back to the corpus: per-document
    * word/char/subword-token counts plus the chars-per-token
    * compression ratio (the statistic vocabulary-size sweeps are
    * tuned on). Scale shape: encoding is NOT a per-token fold over
    * the corpus — the final word table already holds each word's
    * segmentation, so the corpus explode joins the BROADCAST
    * vocabulary-bounded table and aggregates per document; words
    * outside the trained charset drop out in the join, exactly as
    * they never entered training. */
  def encodedLengths(docs: DataFrame, keyCol: String, textCol: String,
                     k: Int, segment: Boolean = false): DataFrame = {
    val (wt, _) = train(docs, textCol, k, segment)
    docs.select(col(keyCol), explode(wordStream(textCol, segment)).as("word"))
      .join(broadcast(wt.select(col("word"),
        size(col("toks")).cast("long").as("n_sub"),
        length(col("word")).cast("long").as("n_chr"))), Seq("word"))
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_words"), sum(col("n_chr")).as("n_chars"),
        sum(col("n_sub")).as("n_bpe_tokens"))
      .select(col(keyCol), col("n_words"), col("n_chars"),
        col("n_bpe_tokens"),
        (col("n_chars").cast("double") / col("n_bpe_tokens").cast("double"))
          .as("compression"),
        (col("n_bpe_tokens").cast("double") / col("n_words").cast("double"))
          .as("fertility"))
  }

  /** The training loop: returns the final `(word, cnt, toks)` table
    * and the learned merges. */
  private def train(docs: DataFrame, textCol: String, k: Int,
                    segment: Boolean = false)
      : (DataFrame, Seq[(Int, String, String, String, Long)]) = {
    val (wt, merges, _) =
      trainWithSnapshots(docs, textCol, k, Set.empty, segment)
    (wt, merges)
  }

  /** [[train]] plus word-table SNAPSHOTS at the requested merge ranks
    * (0 = the pre-merge character split) — the vocab-sweep support:
    * the corpus word-count scan runs ONCE and each requested rank's
    * segmentation is the checkpointed table of that round, so a sweep
    * over R ranks costs R vocab-bounded aggregates, not R corpus
    * scans. If training exhausts early, later-ranked snapshots alias
    * the fixed point (no merges left ⇒ the segmentation is final). */
  private def trainWithSnapshots(docs: DataFrame, textCol: String, k: Int,
                                 snaps: Set[Int],
                                 segment: Boolean = false)
      : (DataFrame, Seq[(Int, String, String, String, Long)],
         Map[Int, DataFrame]) = {
    require(k >= 1 && k <= 64, s"k=$k outside [1, 64]")
    val taken = scala.collection.mutable.Map.empty[Int, DataFrame]
    var wt = docs
      .select(explode(wordStream(textCol, segment)).as("word"))
      .filter(col("word").rlike(charsetRe(segment)))
      .groupBy(col("word")).agg(count(lit(1)).as("cnt"))
      .withColumn("toks", transform(sequence(lit(1), length(col("word"))),
        i => col("word").substr(i, lit(1))))
      .localCheckpoint()
    if (snaps.contains(0)) taken(0) = wt
    val merges =
      scala.collection.mutable.ArrayBuffer
        .empty[(Int, String, String, String, Long)]
    var r = 1
    var exhausted = false
    while (r <= k && !exhausted) {
      val best = wt.filter(size(col("toks")) >= 2)
        .select(col("cnt"),
          explode(transform(sequence(lit(1), size(col("toks")) - 1),
            i => struct(element_at(col("toks"), i).as("l"),
              element_at(col("toks"), i + lit(1)).as("r")))).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("cnt")).as("c"))
        .orderBy(col("c").desc, col("l"), col("r"))
        .limit(1).collect()
      if (best.isEmpty) exhausted = true
      else {
        val (l, rr, c) =
          (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
        merges += ((r, l, rr, l + rr, c))
        // leftmost-greedy merge: fold the tail onto [first]; merge iff
        // the accumulator's last token is `l` and the next is `rr`
        val fold = aggregate(
          slice(col("toks"), lit(2), size(col("toks")) - 1),
          array(element_at(col("toks"), 1)),
          (acc, x) => when(
            element_at(acc, -1) === lit(l) && x === lit(rr),
            concat(slice(acc, lit(1), size(acc) - 1), array(lit(l + rr))))
            .otherwise(concat(acc, array(x))))
        wt = wt.select(col("word"), col("cnt"),
          when(size(col("toks")) < 2, col("toks")).otherwise(fold)
            .as("toks"))
          .localCheckpoint()
        if (snaps.contains(r)) taken(r) = wt
        r += 1
      }
    }
    // early exhaustion: unreached ranks alias the fixed point
    snaps.filter(_ > 0).foreach(s => taken.getOrElseUpdate(s, wt))
    (wt, merges.toSeq, taken.toMap)
  }

  /** Vocabulary-size sweep (★ — the tuning curve behind "what vocab
    * size do we train the tokenizer at": corpus compression and
    * in-use vocabulary size at each requested merge rank, from ONE
    * training run; see [[trainWithSnapshots]]). Output per rank:
    * `(vocab_rank, n_vocab, total_words, total_chars, total_subwords,
    * compression)` — all exact ints except the final IEEE divide.
    * Every aggregate runs over the vocabulary-bounded word table;
    * the corpus is scanned exactly once (the q156 property). */
  def vocabSweep(docs: DataFrame, textCol: String, ranks: Seq[Int])
      : DataFrame = {
    require(ranks.nonEmpty && ranks == ranks.sorted.distinct,
      s"ranks=$ranks must be sorted distinct")
    require(ranks.head >= 0 && ranks.last >= 1 && ranks.last <= 64,
      s"ranks=$ranks outside [0, 64]")
    val (_, _, snaps) =
      trainWithSnapshots(docs, textCol, ranks.last, ranks.toSet)
    ranks.map { r =>
      val wt = snaps(r)
      val totals = wt.agg(
        sum(col("cnt")).as("total_words"),
        sum(col("cnt") * length(col("word")).cast("long"))
          .as("total_chars"),
        sum(col("cnt") * size(col("toks")).cast("long"))
          .as("total_subwords"))
      val vocab = wt.select(explode(col("toks")).as("t"))
        .agg(countDistinct(col("t")).as("n_vocab"))
      totals.crossJoin(vocab)
        .select(lit(r).as("vocab_rank"), col("n_vocab"),
          col("total_words"), col("total_chars"), col("total_subwords"),
          (col("total_chars").cast("double") /
            col("total_subwords").cast("double")).as("compression"))
    }.reduce(_.unionByName(_)).orderBy(col("vocab_rank"))
  }

  /** DuckDB replay of [[vocabSweep]]: the training CTEs, then one
    * vocab-bounded aggregate per requested rank. */
  def sqlVocabSweep(table: String, textCol: String, ranks: Seq[Int])
      : String = {
    val sweeps = ranks.map { r =>
      s"""sw$r AS (
         |  SELECT CAST($r AS INTEGER) AS vocab_rank,
         |    (SELECT COUNT(DISTINCT t) FROM
         |      (SELECT unnest(toks) AS t FROM wt$r)) AS n_vocab,
         |    CAST(SUM(cnt) AS BIGINT) AS total_words,
         |    CAST(SUM(cnt * len(word)) AS BIGINT) AS total_chars,
         |    CAST(SUM(cnt * len(toks)) AS BIGINT) AS total_subwords
         |  FROM wt$r)""".stripMargin
    }.mkString(",\n")
    val unions = ranks.map(r => s"SELECT * FROM sw$r")
      .mkString("\n  UNION ALL ")
    s"""${sqlCtes(table, textCol, ranks.last)},
       |$sweeps
       |SELECT vocab_rank, n_vocab, total_words, total_chars,
       |  total_subwords,
       |  CAST(total_chars AS DOUBLE) / CAST(total_subwords AS DOUBLE)
       |    AS compression
       |FROM ($unions) ORDER BY vocab_rank""".stripMargin
  }

  /** DuckDB replay of [[learnMerges]]: the k iterations unrolled as
    * CTE blocks. The merge fold mirrors the Spark `aggregate` through
    * a '|'-delimited string accumulator (`list_reduce` needs acc and
    * element types equal) — safe because the word charset excludes
    * the delimiter. */
  def sqlLearnMerges(table: String, textCol: String, k: Int,
                     segment: Boolean = false): String = {
    val sel = (1 to k).map { r =>
      s"SELECT CAST($r AS INTEGER) AS merge_rank, l AS lhs, r AS rhs, " +
        s"l || r AS merged, c AS pair_count FROM b$r"
    }.mkString("\nUNION ALL ")
    sqlCtes(table, textCol, k, segment) +
      s"\nSELECT * FROM (\n$sel\n) ORDER BY merge_rank"
  }

  /** DuckDB replay of [[encodedLengths]]: the training CTEs, then the
    * corpus explode joined against the final word table. */
  def sqlEncodedLengths(table: String, keyCol: String, textCol: String,
                        k: Int, segment: Boolean = false): String =
    sqlCtes(table, textCol, k, segment) +
      s""",
         |dw AS (
         |  SELECT $keyCol, unnest(${sqlWordStream(textCol, segment)}) AS word
         |  FROM $table),
         |enc AS (
         |  SELECT $keyCol, CAST(len(toks) AS BIGINT) AS n_sub,
         |    CAST(len(word) AS BIGINT) AS n_chr
         |  FROM dw JOIN wt$k USING (word))
         |SELECT $keyCol, COUNT(*) AS n_words,
         |  CAST(SUM(n_chr) AS BIGINT) AS n_chars,
         |  CAST(SUM(n_sub) AS BIGINT) AS n_bpe_tokens,
         |  CAST(SUM(n_chr) AS DOUBLE) / CAST(SUM(n_sub) AS DOUBLE)
         |    AS compression,
         |  CAST(SUM(n_sub) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
         |    AS fertility
         |FROM enc GROUP BY 1 ORDER BY 1""".stripMargin

  private def sqlCtes(table: String, textCol: String, k: Int,
                      segment: Boolean = false): String = {
    require(k >= 1 && k <= 64, s"k=$k outside [1, 64]")
    val head =
      s"""WITH w0 AS (
         |  SELECT word, COUNT(*) AS cnt FROM (
         |    SELECT unnest(${sqlWordStream(textCol, segment)}) AS word
         |    FROM $table)
         |  WHERE regexp_matches(word, ${sqlCharsetRe(segment)}) GROUP BY 1),
         |wt0 AS (
         |  SELECT word, cnt,
         |    list_transform(range(1, len(word) + 1), i -> word[i]) AS toks
         |  FROM w0)""".stripMargin
    val iters = (1 to k).map { r =>
      s"""p$r AS (
         |  SELECT t.l AS l, t.r AS r, CAST(SUM(cnt) AS BIGINT) AS c FROM (
         |    SELECT cnt, unnest(list_transform(range(1, len(toks)),
         |      i -> {'l': toks[i], 'r': toks[i+1]})) AS t
         |    FROM wt${r - 1} WHERE len(toks) >= 2)
         |  GROUP BY 1, 2),
         |b$r AS (SELECT l, r, c FROM p$r ORDER BY c DESC, l, r LIMIT 1),
         |wt$r AS (
         |  SELECT word, cnt, CASE WHEN len(toks) < 2 THEN toks ELSE
         |    string_split(list_reduce(toks, (acc, x) -> CASE
         |        WHEN string_split(acc, '|')[-1] = b$r.l AND x = b$r.r
         |        THEN array_to_string(list_append(
         |          string_split(acc, '|')[1:len(string_split(acc, '|')) - 1],
         |          b$r.l || b$r.r), '|')
         |        ELSE acc || '|' || x END), '|') END AS toks
         |  FROM wt${r - 1} CROSS JOIN b$r)""".stripMargin
    }
    (head +: iters).mkString(",\n")
  }
}
