package graft.queries

import graft.{QuerySpec, Tables}
import graft.functions.{Exact, Scalars}
import org.apache.spark.sql.functions._

/** Scalar-function queries (SURVEY §2.8): parse_human_number and the
  * NaN/NULL normalization discipline, driven over warehouse columns so
  * every code path is distributed.
  */
object ScalarQueries {

  /** The test corpus has no suffixed-number strings, so q46 constructs
    * them deterministically from integer part keys (identical integer
    * arithmetic and string concatenation on both engines), then parses
    * them back — including a malformed case that must yield NULL
    * (X4/X5, `weekly_dag.py:313`). */
  val q46ParseHumanNumber: QuerySpec = QuerySpec(
    "q46_parse_human_number",
    s"""WITH raw AS (
       |  SELECT p_partkey,
       |    CASE WHEN p_partkey % 17 = 0 THEN 'N/A'
       |    ELSE CAST(p_partkey % 900 + 100 AS VARCHAR) || '.' ||
       |      CAST(p_partkey % 10 AS VARCHAR) ||
       |      CASE p_partkey % 5 WHEN 0 THEN 'K' WHEN 1 THEN 'M'
       |        WHEN 2 THEN 'B' WHEN 3 THEN 'T' ELSE '' END
       |    END AS human
       |  FROM part)
       |SELECT p_partkey, human,
       |  ${Scalars.sqlParseHumanNumber("human")} AS parsed
       |FROM raw ORDER BY p_partkey""".stripMargin) { (s, dir) =>
    Tables.part(s, dir)
      .select(col("p_partkey"),
        when(col("p_partkey") % 17 === 0, lit("N/A"))
          .otherwise(concat(
            (col("p_partkey") % 900 + 100).cast("string"), lit("."),
            (col("p_partkey") % 10).cast("string"),
            when(col("p_partkey") % 5 === 0, "K")
              .when(col("p_partkey") % 5 === 1, "M")
              .when(col("p_partkey") % 5 === 2, "B")
              .when(col("p_partkey") % 5 === 3, "T")
              .otherwise("")))
          .as("human"))
      .withColumn("parsed", Scalars.parseHumanNumber(col("human")))
      .orderBy(col("p_partkey"))
  }

  /** q47: the NaN→NULL normalization rule (SURVEY §7.5.1): NaN is
    * produced transiently (0/0 here), normalized to SQL NULL, and
    * never reaches an aggregate. The reference stores np.NaN for
    * missing (`weekly_dag.py:81-88`); the engine stores NULL. */
  val q47NanNull: QuerySpec = QuerySpec(
    "q47_nan_null",
    s"""WITH raw AS (
       |  SELECT c_mktsegment, c_custkey,
       |    CASE WHEN c_acctbal < 0 THEN 'NaN'::DOUBLE ELSE c_acctbal END AS bal
       |  FROM customer),
       |normalized AS (
       |  SELECT c_mktsegment, c_custkey,
       |    ${Scalars.sqlNanToNull("bal")} AS bal FROM raw)
       |SELECT c_mktsegment,
       |  COUNT(*) AS n,
       |  COUNT(bal) AS n_present,
       |  CAST(COUNT(*) - COUNT(bal) AS BIGINT) AS n_missing,
       |  ${Exact.sqlSum("COALESCE(bal, 0)")} AS total_bal
       |FROM normalized GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin) { (s, dir) =>
    Tables.customer(s, dir)
      .select(col("c_mktsegment"), col("c_custkey"),
        when(col("c_acctbal") < 0, lit(Double.NaN))
          .otherwise(col("c_acctbal")).as("bal"))
      .withColumn("bal", Scalars.nanToNull(col("bal")))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n"),
        count(col("bal")).as("n_present"),
        (count(lit(1)) - count(col("bal"))).cast("long").as("n_missing"),
        Exact.dsum(coalesce(col("bal"), lit(0))).as("total_bal"))
      .orderBy(col("c_mktsegment"))
  }

  val specs: Seq[QuerySpec] = Seq(q46ParseHumanNumber, q47NanNull)
}
