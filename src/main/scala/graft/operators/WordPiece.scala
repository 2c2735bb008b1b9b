package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed WordPiece tokenizer training (training-data pipeline
  * ★): the THIRD subword family next to [[Bpe]] and [[Unigram]] —
  * Schuster & Nakajima 2012's likelihood-driven merge rule, the
  * algorithm behind BERT's vocabulary. Where BPE merges the most
  * FREQUENT adjacent pair, WordPiece merges the pair with the largest
  * unigram-LM likelihood GAIN, score = count(lr) / (count(l) ·
  * count(r)) — a rare pair of rare tokens can beat a frequent pair of
  * ubiquitous ones. BERT's `##` continuation convention is kept:
  * word-initial and word-internal occurrences of the same character
  * are DIFFERENT symbols (position 1 → `c`, later → `##c`), so
  * learned pieces never conflate prefix and suffix contexts; a
  * merge's right element is always word-internal, hence always
  * `##`-prefixed, and `merged = l ++ r.drop(2)` inherits l's prefix
  * status.
  *
  * Same scale formulation as [[Bpe]]: the corpus is scanned exactly
  * once into the word-frequency table; every iteration runs two
  * vocabulary-bounded aggregates (unigram token counts + adjacent-
  * pair counts — WordPiece needs the extra unigram pass for its
  * denominator), the unigram table BROADCASTS into the pair join, the
  * argmax is a TakeOrdered(1), and the merge is the leftmost-greedy
  * fold with the table `localCheckpoint`ed per round.
  *
  * Float caveat (the q217 stance): scores compare as
  * round(ln c − ln c_l − ln c_r, 6) — ln is the one libm op, rounded
  * to 6 immediately in both engines, so only a score within an ulp of
  * a rounding boundary could diverge; ties after rounding break on
  * (l, r) ascending, a total order.
  *
  * Output: `(merge_rank, lhs, rhs, merged, pair_count, score)`, one
  * row per learned merge in rank order; fewer than k rows iff the
  * vocabulary exhausts. The DuckDB oracle ([[sqlLearnMerges]]) unrolls
  * the same k iterations as CTEs, folding token lists through a
  * '|'-delimited string accumulator (safe: the `[a-z0-9#]` token
  * charset excludes the delimiter).
  */
object WordPiece {

  def learnMerges(docs: DataFrame, textCol: String, k: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    require(k >= 1 && k <= 64, s"k=$k outside [1, 64]")
    var wt = docs
      .select(explode(split(col(textCol), " ")).as("word"))
      .filter(col("word").rlike("^[a-z0-9]+$"))
      .groupBy(col("word")).agg(count(lit(1)).as("cnt"))
      .withColumn("toks", transform(sequence(lit(1), length(col("word"))),
        i => when(i === 1, col("word").substr(i, lit(1)))
          .otherwise(concat(lit("##"), col("word").substr(i, lit(1))))))
      .localCheckpoint()
    val merges = scala.collection.mutable.ArrayBuffer
      .empty[(Int, String, String, String, Long, Double)]
    var r = 1
    var exhausted = false
    while (r <= k && !exhausted) {
      // unigram denominator: EVERY token occurrence in the corpus,
      // including single-token words (they dilute their symbol's
      // score without ever pairing)
      val ut = wt.select(col("cnt"), explode(col("toks")).as("t"))
        .groupBy(col("t")).agg(sum(col("cnt")).as("uc"))
      val pairs = wt.filter(size(col("toks")) >= 2)
        .select(col("cnt"),
          explode(transform(sequence(lit(1), size(col("toks")) - 1),
            i => struct(element_at(col("toks"), i).as("l"),
              element_at(col("toks"), i + lit(1)).as("r")))).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("cnt")).as("c"))
      val best = pairs
        .join(broadcast(ut.select(col("t").as("l"), col("uc").as("lc"))),
          Seq("l"))
        .join(broadcast(ut.select(col("t").as("r"), col("uc").as("rc"))),
          Seq("r"))
        .select(col("l"), col("r"), col("c"),
          (round(log(col("c").cast("double")) -
            log(col("lc").cast("double")) -
            log(col("rc").cast("double")), 6) + lit(0.0)).as("score"))
        .orderBy(col("score").desc, col("l"), col("r"))
        .limit(1).collect()
      if (best.isEmpty) exhausted = true
      else {
        val (l, rr, c, sc) = (best(0).getString(0), best(0).getString(1),
          best(0).getLong(2), best(0).getDouble(3))
        val merged = l + rr.drop(2)
        merges += ((r, l, rr, merged, c, sc))
        val fold = aggregate(
          slice(col("toks"), lit(2), size(col("toks")) - 1),
          array(element_at(col("toks"), 1)),
          (acc, x) => when(
            element_at(acc, -1) === lit(l) && x === lit(rr),
            concat(slice(acc, lit(1), size(acc) - 1), array(lit(merged))))
            .otherwise(concat(acc, array(x))))
        wt = wt.select(col("word"), col("cnt"),
          when(size(col("toks")) < 2, col("toks")).otherwise(fold)
            .as("toks"))
          .localCheckpoint()
        r += 1
      }
    }
    merges.toSeq
      .toDF("merge_rank", "lhs", "rhs", "merged", "pair_count", "score")
  }

  /** DuckDB replay of [[learnMerges]]: k iterations unrolled as CTEs
    * (the [[Bpe.sqlLearnMerges]] structure plus the per-round unigram
    * CTE and the likelihood ordering). Unlike BPE's chain, each
    * `wt$r` here is referenced THREE times (unigram counts, pair
    * counts, next fold), so the per-round CTEs are `MATERIALIZED` —
    * without the hint the optimizer inlines the chain into 3^k scans
    * of the base table. */
  def sqlLearnMerges(table: String, textCol: String, k: Int): String = {
    require(k >= 1 && k <= 64, s"k=$k outside [1, 64]")
    val head =
      s"""WITH w0 AS (
         |  SELECT word, COUNT(*) AS cnt FROM (
         |    SELECT unnest(string_split($textCol, ' ')) AS word
         |    FROM $table)
         |  WHERE regexp_matches(word, '^[a-z0-9]+$$') GROUP BY 1),
         |wt0 AS MATERIALIZED (
         |  SELECT word, cnt,
         |    list_transform(range(1, len(word) + 1),
         |      i -> CASE WHEN i = 1 THEN word[i]
         |                ELSE '##' || word[i] END) AS toks
         |  FROM w0)""".stripMargin
    val iters = (1 to k).map { r =>
      s"""u$r AS MATERIALIZED (
         |  SELECT t AS tok, CAST(SUM(cnt) AS BIGINT) AS uc FROM (
         |    SELECT cnt, unnest(toks) AS t FROM wt${r - 1}) GROUP BY 1),
         |p$r AS MATERIALIZED (
         |  SELECT t.l AS l, t.r AS r, CAST(SUM(cnt) AS BIGINT) AS c FROM (
         |    SELECT cnt, unnest(list_transform(range(1, len(toks)),
         |      i -> {'l': toks[i], 'r': toks[i+1]})) AS t
         |    FROM wt${r - 1} WHERE len(toks) >= 2)
         |  GROUP BY 1, 2),
         |b$r AS MATERIALIZED (
         |  SELECT p.l AS l, p.r AS r, p.c AS c,
         |    p.l || substr(p.r, 3) AS merged,
         |    round(ln(CAST(p.c AS DOUBLE)) - ln(CAST(ul.uc AS DOUBLE))
         |      - ln(CAST(ur.uc AS DOUBLE)), 6) + 0.0 AS score
         |  FROM p$r p
         |  JOIN u$r ul ON ul.tok = p.l
         |  JOIN u$r ur ON ur.tok = p.r
         |  ORDER BY score DESC, p.l, p.r LIMIT 1),
         |wt$r AS MATERIALIZED (
         |  SELECT word, cnt, CASE WHEN len(toks) < 2 THEN toks ELSE
         |    string_split(list_reduce(toks, (acc, x) -> CASE
         |        WHEN string_split(acc, '|')[-1] = b$r.l AND x = b$r.r
         |        THEN array_to_string(list_append(
         |          string_split(acc, '|')[1:len(string_split(acc, '|')) - 1],
         |          b$r.merged), '|')
         |        ELSE acc || '|' || x END), '|') END AS toks
         |  FROM wt${r - 1} CROSS JOIN b$r)""".stripMargin
    }
    val sel = (1 to k).map { r =>
      s"SELECT CAST($r AS INTEGER) AS merge_rank, l AS lhs, r AS rhs, " +
        s"merged, c AS pair_count, score FROM b$r"
    }.mkString("\nUNION ALL ")
    (head +: iters).mkString(",\n") +
      s"\nSELECT * FROM (\n$sel\n) ORDER BY merge_rank"
  }
}
