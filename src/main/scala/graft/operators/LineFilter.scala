package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** C4-style line-level filtering (training-data pipeline ★ — Raffel
  * et al. 2020, "Exploring the Limits of Transfer Learning", §2.2's
  * cleaning heuristics): the curation granularity between q148's
  * doc-level Gopher rule bank and q153's cross-document boilerplate
  * pass. Every LINE of a document is tested independently —
  *
  *   - terminal punctuation: the line must end in `.`, `!`, `?` or a
  *     closing quote (C4 keeps only sentence-shaped lines);
  *   - minimum length: ≥ [[minLineWords]] words;
  *   - no "javascript": the canonical rendered-boilerplate tell.
  *
  * — and the document is rebuilt from the survivors. Then two
  * DOC-level gates run over the ORIGINAL text (C4 drops the whole
  * page): a "lorem ipsum" placeholder match and a `{` code tell, plus
  * the ≥ [[minKeptLines]]-kept-lines floor.
  *
  * Scale shape (100 TB lens): the entire operator is ONE per-row
  * Column expression — a line split bound once (the CollapseProject
  * trap, [[graft.functions.TextFunctions.bound]]), three filter
  * lambdas, and scalar gates; no shuffle, no UDF, whole-stage
  * codegen end to end. Per-rule failure counts are INDEPENDENT
  * (a line can fail several rules), so the audit columns sum the
  * filter lambdas separately — the keep decision is the conjunction.
  *
  * Determinism: counts are exact ints; the cleaned text travels as
  * md5, the engine's oracle-spellable digest.
  */
object LineFilter {

  /** C4's "at least 5 words" line floor. */
  val minLineWords: Int = 5
  /** C4's "at least 3 sentences" page floor, applied to kept lines. */
  val minKeptLines: Int = 3
  /** Terminal-punctuation tail: `.`, `!`, `?`, or a closing `"`. */
  val terminalPattern: String = "[.!?\"]$"
  /** Rendered-boilerplate tell (case-insensitive substring). */
  val jsWord: String = "javascript"
  /** Placeholder-page tell (case-insensitive substring). */
  val loremPhrase: String = "lorem ipsum"

  import graft.functions.TextFunctions.bound

  private def lineKeep(l: Column): Column =
    l.rlike(terminalPattern) &&
      size(split(l, " ")) >= minLineWords &&
      !lower(l).contains(jsWord)

  /** Per-document line filtering + doc gates: `(keyCol, n_lines,
    * n_kept, n_fail_punct, n_fail_words, n_fail_js, doc_keep,
    * clean_md5)`. `clean_md5` digests the kept lines re-joined with
    * `\n` (empty string when nothing survives — the q164 contract).
    */
  def c4Filter(df: DataFrame, keyCol: String, textCol: String): DataFrame = {
    val out = bound(split(col(textCol), "\n")) { lines =>
      def failCount(p: Column => Column): Column =
        size(filter(lines, l => !p(l))).cast("long")
      val kept = filter(lines, lineKeep(_))
      struct(
        size(lines).cast("long").as("n_lines"),
        size(kept).cast("long").as("n_kept"),
        failCount(_.rlike(terminalPattern)).as("n_fail_punct"),
        failCount(l => size(split(l, " ")) >= minLineWords)
          .as("n_fail_words"),
        failCount(l => !lower(l).contains(jsWord)).as("n_fail_js"),
        (size(kept) >= minKeptLines &&
          !lower(col(textCol)).contains(loremPhrase) &&
          !col(textCol).contains("{")).as("doc_keep"),
        md5(array_join(kept, "\n")).as("clean_md5"))
    }
    df.select(col(keyCol), out.as("c4"))
      .select(col(keyCol), col("c4.n_lines").as("n_lines"),
        col("c4.n_kept").as("n_kept"),
        col("c4.n_fail_punct").as("n_fail_punct"),
        col("c4.n_fail_words").as("n_fail_words"),
        col("c4.n_fail_js").as("n_fail_js"),
        col("c4.doc_keep").as("doc_keep"),
        col("c4.clean_md5").as("clean_md5"))
  }

  /** DuckDB spelling of [[c4Filter]] over relation `rel`: emits a CTE
    * `c4out(k, n_lines, n_kept, n_fail_punct, n_fail_words,
    * n_fail_js, doc_keep, clean_md5)`. Same thresholds, same
    * patterns, same `\n` join. */
  def sqlC4Filter(rel: String, keyExpr: String, textExpr: String): String = {
    val lineKeepSql =
      s"""l -> regexp_matches(l, '$terminalPattern') AND
         |  len(string_split(l, ' ')) >= $minLineWords AND
         |  NOT contains(lower(l), '$jsWord')""".stripMargin
    s"""c4l AS (
       |  SELECT $keyExpr AS k, $textExpr AS txt,
       |    string_split($textExpr, chr(10)) AS lines
       |  FROM $rel),
       |c4out AS (
       |  SELECT k,
       |    CAST(len(lines) AS BIGINT) AS n_lines,
       |    CAST(len(list_filter(lines, $lineKeepSql)) AS BIGINT)
       |      AS n_kept,
       |    CAST(len(list_filter(lines,
       |      l -> NOT regexp_matches(l, '$terminalPattern'))) AS BIGINT)
       |      AS n_fail_punct,
       |    CAST(len(list_filter(lines,
       |      l -> NOT (len(string_split(l, ' ')) >= $minLineWords)))
       |      AS BIGINT) AS n_fail_words,
       |    CAST(len(list_filter(lines,
       |      l -> contains(lower(l), '$jsWord'))) AS BIGINT) AS n_fail_js,
       |    (len(list_filter(lines, $lineKeepSql)) >= $minKeptLines
       |      AND NOT contains(lower(txt), '$loremPhrase')
       |      AND NOT contains(txt, '{')) AS doc_keep,
       |    md5(COALESCE(array_to_string(list_filter(lines, $lineKeepSql),
       |      chr(10)), '')) AS clean_md5
       |  FROM c4l)""".stripMargin
  }
}
