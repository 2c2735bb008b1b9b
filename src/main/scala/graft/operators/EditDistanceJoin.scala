package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact edit-distance (Levenshtein) similarity join — the string
  * sibling of [[Dedup.prefixJaccardPairs]] (training-data pipeline ★:
  * typo-level near-dup of titles, names, URLs, short fields where
  * token Jaccard is too coarse). All pairs with edit distance ≤ d,
  * lossless, without the quadratic cross join.
  *
  * Candidate generation is the segment pigeonhole (the PassJoin
  * scheme): split each indexed string into d+1 contiguous segments —
  * at most d edits can touch at most d segments, so some segment
  * survives UNTOUCHED and appears in the partner verbatim, displaced
  * by at most the net insertions/deletions before it, i.e. within ±d
  * of its original position. The probe side therefore emits, for each
  * plausible partner length L ∈ [len−d, len+d] and each segment slot,
  * the substrings at the ±d position window — a bounded
  * (2d+1)·(d+1)·(2d+1) fan-out per row, independent of data volume —
  * and candidates fall out of a plain equi-join on
  * (partner length, slot, substring). Verification runs
  * `levenshtein(_, _, d)` (early-abandoning) on candidates only.
  *
  * Strings shorter than the segment count can't be split; any partner
  * of such a string has length ≤ 2d, so a "short tier" covers those
  * pairs with a length-band equi-join (|len diff| ≤ d is implied by
  * the distance bound) — still a hash join, never a cartesian.
  *
  * Scale shape: two equi-joins (segments, short band) whose keys are
  * substring content / short lengths, one distinct, verification on
  * candidates only. No approximation, no driver-side state.
  */
object EditDistanceJoin {

  /** Even split of a length-`len` string into `k` segments: segment
    * `i` (1-based) starts at `(i−1)·⌊len/k⌋ + min(i−1, len mod k) + 1`
    * and the first `len mod k` segments are one longer. */
  private def segStart(lenC: Column, i: Column, k: Int): Column =
    (i - 1) * (lenC / k).cast("int") + least(i - 1, lenC % k) + lit(1)

  private def segLen(lenC: Column, i: Column, k: Int): Column =
    (lenC / k).cast("int") + when(i <= lenC % k, 1).otherwise(0)

  /** All pairs (a < b) with `levenshtein(str_a, str_b) ≤ maxDist`,
    * as (a, b, dist). Keys must be distinct per row. */
  def editDistancePairs(df: DataFrame, keyCol: String, strCol: String,
                        maxDist: Int = 2): DataFrame = {
    require(maxDist >= 1 && maxDist <= 4, s"maxDist=$maxDist outside [1, 4]")
    val k = maxDist + 1
    val s = df.select(col(keyCol).as("key"), col(strCol).as("str"),
        length(col(strCol)).as("len"))
      .filter(col("str").isNotNull)
      .cache() // consumed by both candidate tiers and twice by verify

    // --- short tier: a string shorter than k can't be segmented, and
    // its partners have length ≤ len + d ≤ 2d; band-join that sliver.
    val shortS = s.filter(col("len") <= 2 * maxDist)
    val shortPairs = shortS
      .select(col("key").as("ka"),
        explode(sequence(col("len"), col("len") + maxDist)).as("bucket"))
      .join(shortS.select(col("key").as("kb"), col("len").as("bucket")),
        Seq("bucket"))
      .filter(col("ka") =!= col("kb"))
      .select(least(col("ka"), col("kb")).as("a"),
        greatest(col("ka"), col("kb")).as("b"))

    // --- main tier: segment index over strings long enough to split
    val iSeq = sequence(lit(1), lit(k))
    val index = s.filter(col("len") >= k)
      .select(col("key").as("kb"),
        explode(transform(iSeq, i => struct(
          col("len").as("lb"), i.as("slot"),
          col("str").substr(segStart(col("len"), i, k),
            segLen(col("len"), i, k)).as("seg")))).as("e"))
      .select(col("kb"), col("e.lb"), col("e.slot"), col("e.seg"))

    // probe: for each partner length L and slot, the substrings of
    // this string at the ±d window around the slot's start, clamped to
    // valid positions (an empty window yields no rows, not a
    // descending `sequence`)
    // len ≥ 1 keeps the partner-length sequence ascending (len+d ≥ k);
    // the empty string's partners all have length ≤ d — short tier.
    val probe = s.filter(col("len") >= 1)
      .select(col("key").as("ka"), col("str"), col("len"),
        explode(flatten(transform(
          sequence(greatest(col("len") - maxDist, lit(k)),
            col("len") + maxDist),
          L => flatten(transform(iSeq, { i =>
            val sl = segLen(L, i, k)
            val lo = greatest(segStart(L, i, k) - maxDist, lit(1))
            val hi = least(segStart(L, i, k) + maxDist, col("len") - sl + 1)
            transform(
              when(lo <= hi, sequence(lo, hi))
                .otherwise(array().cast("array<int>")),
              p => struct(L.as("lb"), i.as("slot"),
                col("str").substr(p, sl).as("seg")))
          }))))).as("e"))
      .select(col("ka"), col("e.lb"), col("e.slot"), col("e.seg"))

    val mainPairs = probe.join(index, Seq("lb", "slot", "seg"))
      .filter(col("ka") =!= col("kb"))
      .select(least(col("ka"), col("kb")).as("a"),
        greatest(col("ka"), col("kb")).as("b"))

    val cand = shortPairs.unionByName(mainPairs).distinct()
    cand
      .join(s.select(col("key").as("a"), col("str").as("str_a")), Seq("a"))
      .join(s.select(col("key").as("b"), col("str").as("str_b")), Seq("b"))
      .select(col("a"), col("b"),
        levenshtein(col("str_a"), col("str_b"), maxDist).as("dist"))
      .filter(col("dist") >= 0) // threshold form returns −1 past the bound
  }
}
