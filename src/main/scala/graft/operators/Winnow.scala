package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Winnowing document fingerprints (training-data pipeline ★ —
  * Schleimer, Wilkerson & Aiken 2003, the MOSS algorithm): from each
  * document's k-gram hash sequence, keep only the MINIMUM hash of
  * every w-wide window. The guarantee: any shared substring of length
  * ≥ w+k−1 contributes at least one shared fingerprint, while the
  * kept set is ~2/(w+1) of all k-grams — the sparse overlap index
  * production plagiarism/contamination pipelines build when full
  * shingle joins (q31/q94) are too dense.
  *
  * This tier differs from the engine's other overlap ops: q39 folds
  * ONE rolling hash per doc (identity fingerprint), q32/q33 hash into
  * fixed-width signatures (similarity estimate); winnowing keeps a
  * variable-size POSITION-AWARE subset with a substring-match
  * guarantee, which neither provides.
  *
  * Determinism: k-gram hashes are the portable Horner-mod-P fold over
  * md5-derived token hashes (the q32 family constants, [[Dedup.MinhashP]]
  * / [[Dedup.HornerC]]) — every selected fingerprint is an exact
  * integer the oracle recomputes; window minima are plain integer
  * mins; pair scores divide two exact ints in double precision (both
  * engines round identically).
  *
  * Scale shape (100 TB lens): fingerprint selection is a PER-ROW
  * Column expression (no shuffle, no UDF — array ops inside codegen);
  * only the winnowed ~2/(w+1) subset explodes into the candidate
  * join, which is a bucketed equi-join on the fingerprint value with
  * the same `HUB_CAP`-style guard as the LSH tiers: fingerprints
  * shared by more docs than `maxDf` are dropped before the self-join
  * (a stop-k-gram appearing in half the corpus would otherwise square
  * into the pair explosion — same reasoning as q94's prefix filter).
  */
object Winnow {

  /** Evaluate-once binding for a derived array: CollapseProject
    * inlines a projected array into EVERY lambda reference (and
    * whole-stage codegen's subexpression elimination cannot hoist
    * across HOF lambda scopes), so `slice(grams, j, w)` would rebuild
    * the gram array — which rebuilds the md5 token-hash array — per
    * WINDOW, an O(n³)-flavored blowup (the q150/`bound` trap,
    * TextFunctions.scala). A HOF's argument is evaluated once; the
    * 1-element-array transform makes the array a bound lambda
    * argument the inner lambdas capture. */
  private def bound(arr: org.apache.spark.sql.Column)(
      f: org.apache.spark.sql.Column => org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column =
    element_at(transform(array(arr), a => f(a)), 1)

  /** Per-doc winnowed fingerprint ARRAY (distinct, unordered set
    * semantics — kept as a column for reuse): `(keyCol, n_grams,
    * fingerprints)`. */
  def fingerprints(df: DataFrame, keyCol: String, textCol: String,
                   k: Int, w: Int): DataFrame = {
    require(k >= 2, s"k=$k — 1-token grams winnow single words")
    require(w >= 2, s"w=$w — a 1-wide window keeps every k-gram")
    val ths = transform(split(col(textCol), " "),
      t => graft.functions.Scalars.portableHash64(t) % lit(Dedup.MinhashP))
    // Horner fold over k consecutive token hashes, mod P (q32 family);
    // both the hash array and the gram array are [[bound]] so each is
    // built ONCE per row, not once per window
    val fpCol = bound(ths) { th =>
      bound(transform(
        Dedup.shinglePositions(th, k),
        i => (1 until k).foldLeft(element_at(th, i))(
          (acc, j) => (acc * lit(Dedup.HornerC) +
            element_at(th, i + lit(j))) % lit(Dedup.MinhashP)))) { grams =>
        struct(size(grams).as("n_grams"),
          array_distinct(transform(
            sequence(lit(1), greatest(size(grams) - lit(w - 1), lit(1))),
            j => array_min(slice(grams, j, lit(w)))))
            .as("fingerprints"))
      }
    }
    df.select(col(keyCol), fpCol.as("__fp"))
      .select(col(keyCol), col("__fp.n_grams").as("n_grams"),
        col("__fp.fingerprints").as("fingerprints"))
      .filter(col("n_grams") > 0)
  }

  /** Candidate overlap pairs from shared winnowed fingerprints:
    * `(a, b, shared, score)` with `a < b`, `shared` = #common
    * fingerprints and `score` = shared / min(|fp_a|, |fp_b|)
    * (containment-style). Fingerprints with document frequency
    * > `maxDf` are dropped before the self-join (the stop-gram
    * guard). */
  def overlapPairs(df: DataFrame, keyCol: String, textCol: String,
                   k: Int = 4, w: Int = 4, maxDf: Long = 1000L,
                   minShared: Long = 2L): DataFrame = {
    val fps = fingerprints(df, keyCol, textCol, k, w)
      .select(col(keyCol), size(col("fingerprints")).as("nf"),
        explode(col("fingerprints")).as("f"))
    val rare = fps.groupBy(col("f")).agg(count(lit(1)).as("df"))
      .filter(col("df") <= maxDf)
      .select(col("f"))
    val kept = fps.join(rare, Seq("f"))
    val l = kept.select(col("f"), col(keyCol).as("a"), col("nf").as("na"))
    val r = kept.select(col("f"), col(keyCol).as("b"), col("nf").as("nb"))
    l.join(r, Seq("f"))
      .filter(col("a") < col("b"))
      .groupBy(col("a"), col("b"), col("na"), col("nb"))
      .agg(count(lit(1)).as("shared"))
      .filter(col("shared") >= minShared)
      .select(col("a"), col("b"), col("shared"),
        (col("shared").cast("double") /
          least(col("na"), col("nb")).cast("double")).as("score"))
  }

  /** DuckDB replay of [[overlapPairs]] over `rel(key, text)`; CTE
    * chain ending in `wpairs(a, b, shared, score)`. `k` is unrolled
    * into the literal Horner expression. */
  def sqlOverlapPairs(rel: String, keyExpr: String, textExpr: String,
                      k: Int, w: Int, maxDf: Long, minShared: Long)
                     : String = {
    val P = Dedup.MinhashP
    val C = Dedup.HornerC
    val horner = (1 until k).foldLeft("ths[i]")(
      (acc, j) => s"(($acc) * $C + ths[i+$j]) % $P")
    s"""wth AS (
       |  SELECT $keyExpr AS key, list_transform(
       |    string_split($textExpr, ' '),
       |    t -> ${graft.functions.Scalars.sqlPortableHash64("t")} % $P)
       |    AS ths
       |  FROM $rel),
       |wgr AS (
       |  SELECT key, list_transform(range(1, len(ths) - ${k - 1} + 1),
       |    i -> $horner) AS grams
       |  FROM wth WHERE len(ths) >= $k),
       |wfp AS (
       |  SELECT key, list_distinct(list_transform(
       |    range(1, greatest(len(grams) - ${w - 1}, 1) + 1),
       |    j -> list_min(grams[j : j + ${w - 1}]))) AS fps
       |  FROM wgr WHERE len(grams) > 0),
       |wex AS (
       |  SELECT key, len(fps) AS nf, unnest(fps) AS f FROM wfp),
       |wrare AS (
       |  SELECT f FROM wex GROUP BY f HAVING COUNT(*) <= $maxDf),
       |wkept AS (SELECT key, nf, f FROM wex JOIN wrare USING (f)),
       |wpairs AS (
       |  SELECT l.key AS a, r.key AS b, COUNT(*) AS shared,
       |    CAST(COUNT(*) AS DOUBLE)
       |      / CAST(least(any_value(l.nf), any_value(r.nf)) AS DOUBLE)
       |      AS score
       |  FROM wkept l JOIN wkept r ON l.f = r.f AND l.key < r.key
       |  GROUP BY l.key, r.key
       |  HAVING COUNT(*) >= $minShared)""".stripMargin
  }
}
