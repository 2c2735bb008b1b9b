package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Scalars

/** Skip-gram training-pair extraction (training-data pipeline ★ —
  * Mikolov et al. 2013, word2vec's data preparation): every
  * (center, context) token pair within a ±`window` offset of the
  * frequency-SUBSAMPLED token stream, counted corpus-wide. The
  * subsample is Mikolov's: an occurrence of word w with corpus
  * frequency f = n(w)/N survives with probability
  * p = min(1, sqrt(t/f)) — frequent words are thinned BEFORE
  * windowing, so surviving tokens pair across the dropped ones
  * (the compaction is what widens effective context, per the paper).
  *
  * Determinism: the "coin flip" is the engine's portable md5 hash of
  * (doc, position) against floor(10⁶·p) — p is one IEEE
  * divide+sqrt+multiply sequence both engines round identically, and
  * the comparison is exact-integer, so the oracle replays the
  * subsample bit-for-bit.
  *
  * Scale shape (100 TB lens): the frequency table is VOCAB-bounded
  * and broadcasts (with the 1-row total) into the occurrence stream —
  * the corpus never shuffles against it; the only corpus-sized
  * shuffles are the per-doc compaction (one doc-key aggregate) and
  * the final pair count (map-side combinable); pair generation is a
  * per-row nested-transform Column over the compacted sequence
  * (≤ 2·window pairs per surviving token, no join); top-k plans
  * TakeOrderedAndProject.
  */
object Skipgram {

  private val M = 1000000L

  import graft.functions.TextFunctions.bound

  /** Corpus-wide (center, context, n_pairs) counts, top `topK` by
    * (n_pairs DESC, center, context). `t` is Mikolov's subsample
    * threshold. */
  def pairs(df: DataFrame, keyCol: String, textCol: String,
            window: Int = 2, t: Double = 0.01, topK: Int = 100)
           : DataFrame = {
    require(window >= 1, s"window=$window")
    require(t > 0, s"t=$t")
    val occ = df
      .select(col(keyCol), posexplode(split(col(textCol), " "))
        .as(Seq("pos0", "tok")))
      .select(col(keyCol), (col("pos0") + 1).cast("long").as("pos"),
        col("tok"))
    val freq = occ.groupBy(col("tok")).agg(count(lit(1)).as("c"))
    val tot = occ.agg(count(lit(1)).as("n"))
    val pKeep = least(lit(1.0),
      sqrt(lit(t) / (col("c").cast("double") / col("n").cast("double"))))
    val coin = Scalars.portableHash64(concat(
      col(keyCol).cast("string"), lit(":"), col("pos").cast("string")))
    val kept = occ
      .join(broadcast(freq), Seq("tok"))
      .crossJoin(broadcast(tot))
      .filter(coin % lit(M) < floor(lit(M.toDouble) * pKeep).cast("long"))
    val seqs = kept.groupBy(col(keyCol))
      .agg(transform(
        sort_array(collect_list(struct(col("pos"), col("tok")))),
        x => x.getField("tok")).as("cs"))
    val prs = bound(col("cs")) { cs =>
      flatten(transform(sequence(lit(1), size(cs)), i =>
        transform(
          filter(
            sequence(greatest(lit(1), i - window),
              least(size(cs), i + window)),
            j => j =!= i),
          j => struct(element_at(cs, i).as("a"),
            element_at(cs, j).as("b")))))
    }
    seqs.select(explode(prs).as("pr"))
      .select(col("pr.a").as("center"), col("pr.b").as("context"))
      .groupBy(col("center"), col("context"))
      .agg(count(lit(1)).as("n_pairs"))
      .orderBy(col("n_pairs").desc, col("center"), col("context"))
      .limit(topK)
  }

  /** DuckDB spelling of [[pairs]] over relation `rel`: emits CTEs
    * ending in `sgout(center, context, n_pairs)` (unordered — the
    * caller adds the top-k ORDER BY/LIMIT). */
  def sqlPairs(rel: String, keyExpr: String, textExpr: String,
               window: Int, t: Double): String = {
    val coin = Scalars.sqlPortableHash64(
      s"CAST(k AS VARCHAR) || ':' || CAST(pos AS VARCHAR)")
    s"""sgtok AS (
       |  SELECT $keyExpr AS k, string_split($textExpr, ' ') AS toks
       |  FROM $rel),
       |sgocc AS (
       |  SELECT k, u.p AS pos, u.t AS tok FROM (
       |    SELECT k, unnest(list_transform(range(1, len(toks) + 1),
       |      i -> {'p': CAST(i AS BIGINT), 't': toks[i]})) AS u
       |    FROM sgtok)),
       |sgfreq AS (SELECT tok, COUNT(*) AS c FROM sgocc GROUP BY 1),
       |sgtot AS (SELECT COUNT(*) AS n FROM sgocc),
       |sgkept AS (
       |  SELECT o.k, o.pos, o.tok
       |  FROM sgocc o JOIN sgfreq f USING (tok) CROSS JOIN sgtot
       |  WHERE ($coin) % ${M} <
       |    CAST(floor(${M}.0 * least(1.0,
       |      sqrt($t / (CAST(f.c AS DOUBLE) / CAST(sgtot.n AS DOUBLE)))))
       |      AS BIGINT)),
       |sgseq AS (
       |  SELECT k, list_transform(
       |    list_sort(list({'p': pos, 't': tok})), x -> x.t) AS cs
       |  FROM sgkept GROUP BY k),
       |sgpair AS (
       |  SELECT u.a AS center, u.b AS context FROM (
       |    SELECT unnest(flatten(list_transform(range(1, len(cs) + 1),
       |      i -> list_transform(
       |        list_filter(range(greatest(1, i - $window),
       |          least(len(cs), i + $window) + 1), j -> j != i),
       |        j -> {'a': cs[i], 'b': cs[j]})))) AS u
       |    FROM sgseq)),
       |sgout AS (
       |  SELECT center, context, COUNT(*) AS n_pairs
       |  FROM sgpair GROUP BY 1, 2)""".stripMargin
  }
}
