package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Scalar function layer (SURVEY §2.8). Everything is a pure Column
  * expression with a documented DuckDB spelling (ScalarQueries keeps
  * the two in sync).
  */
object Scalars {

  /** Generalized `parse_human_number` (X4 ★ — the reference strips a
    * trailing "B" by hand: `float(value[:-1]) * 10**9`,
    * `weekly_dag.py:313`; Yahoo-format strings like "1.2B" appear in
    * the key-metrics tables `weekly_dag.py:186-190`). Handles K/M/B/T
    * suffixes, plain numbers, and malformed input (→ null). */
  def parseHumanNumber(c: Column): Column = {
    // try_cast: ANSI mode errors on cast('' AS DOUBLE); the contract is
    // malformed → null (same as the oracle's NULLIF spelling).
    val num = regexp_extract(c, "^([0-9]+\\.?[0-9]*)", 1).try_cast("double")
    val suffix = regexp_extract(c, "([KMBT])$", 1)
    num * when(suffix === "K", 1e3)
      .when(suffix === "M", 1e6)
      .when(suffix === "B", 1e9)
      .when(suffix === "T", 1e12)
      .otherwise(1.0)
  }

  /** DuckDB spelling of parseHumanNumber — empty regexp match is ''
    * in both engines, and CAST('' AS DOUBLE) errors in DuckDB, so the
    * number part goes through NULLIF first (Spark's cast('' as
    * double) is already null). */
  def sqlParseHumanNumber(e: String): String =
    s"""CAST(NULLIF(regexp_extract($e, '^([0-9]+\\.?[0-9]*)', 1), '') AS DOUBLE)
       | * CASE regexp_extract($e, '([KMBT])$$', 1)
       |     WHEN 'K' THEN 1e3 WHEN 'M' THEN 1e6
       |     WHEN 'B' THEN 1e9 WHEN 'T' THEN 1e12 ELSE 1.0 END""".stripMargin

  /** NaN → SQL NULL normalization (X5, SURVEY §7.5.1): the engine
    * stores missing as NULL everywhere; NaN exists only transiently
    * when arithmetic produces it. */
  def nanToNull(c: Column): Column =
    when(isnan(c), lit(null).cast("double")).otherwise(c)

  def sqlNanToNull(e: String): String =
    s"CASE WHEN isnan($e) THEN NULL ELSE $e END"

  /** Engine-PORTABLE 60-bit hash: the first 15 hex chars of md5 as a
    * (nonnegative) long. md5 is the one hash both Spark and DuckDB
    * spell identically, so keys derived from this are oracle-checkable
    * — unlike xxhash64, which exists only in Spark. 15 hex chars = 60
    * bits keeps the value positive and overflow-free under ANSI.
    * Non-string inputs are cast to string first so both engines hash
    * the same rendered text. Computed by the fused codegen expression
    * [[graft.plans.PortableHash64]] — bit-identical to the composed
    * conv(substring(md5(…),1,15),16,10) chain (ScalarsSpec pins it)
    * without the per-call hex-string round trip. */
  def portableHash64(c: Column): Column =
    graft.plans.PortableHash64(c.cast("string"))

  /** DuckDB spelling of portableHash64 (hex-literal string cast). */
  def sqlPortableHash64(e: String): String =
    s"CAST('0x' || substr(md5(CAST($e AS VARCHAR)), 1, 15) AS BIGINT)"
}
