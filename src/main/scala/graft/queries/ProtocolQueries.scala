package graft.queries

import graft.{QuerySpec, Tables}
import graft.functions.Exact
import graft.operators.Relational
import org.apache.spark.sql.functions._

/** The reference's warehouse load protocols as PURE queries (SURVEY
  * §2.3 J2/J3, §3.3, §7.3 step 4): result = what the sink would
  * contain after the protocol runs. The side-effecting forms live in
  * operators.Sinks and are exercised by SinksSpec (including
  * idempotency laws); these query twins give the protocols a DuckDB
  * oracle.
  */
object ProtocolQueries {

  /** q48: dedup-append (insert-if-absent, J2/J3 — the rewrite of
    * `weekly_dag.py:420-427`): sink already holds pre-1997 monthly
    * rows; the candidate batch overlaps 1996–1997. Result = sink ∪
    * anti-joined candidates, aggregated per month. Candidate batch
    * values are perturbed (+1000) so a wrongly-applied overwrite or
    * double-append is caught by the totals, not just row counts. */
  val q48DedupAppend: QuerySpec = QuerySpec(
    "q48_dedup_append",
    s"""WITH sink AS (
       |  SELECT CAST(EXTRACT(year FROM o_orderdate) AS INTEGER) AS year,
       |    CAST(EXTRACT(month FROM o_orderdate) AS INTEGER) AS month,
       |    ${Exact.sqlSum("o_totalprice")} AS total
       |  FROM orders WHERE o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
       |  GROUP BY 1, 2),
       |candidates AS (
       |  SELECT CAST(EXTRACT(year FROM o_orderdate) AS INTEGER) AS year,
       |    CAST(EXTRACT(month FROM o_orderdate) AS INTEGER) AS month,
       |    ${Exact.sqlSum("o_totalprice + 1000")} AS total
       |  FROM orders WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
       |    AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
       |  GROUP BY 1, 2),
       |merged AS (
       |  SELECT * FROM sink
       |  UNION ALL
       |  SELECT * FROM candidates c WHERE NOT EXISTS (
       |    SELECT 1 FROM sink s WHERE s.year = c.year AND s.month = c.month))
       |SELECT year, month, total FROM merged ORDER BY year, month""".stripMargin) { (s, dir) =>
    def monthly(df: org.apache.spark.sql.DataFrame, bump: Double) = df
      .select(year(col("o_orderdate")).as("year"),
        month(col("o_orderdate")).as("month"),
        (col("o_totalprice") + bump).as("p"))
      .groupBy(col("year"), col("month"))
      .agg(Exact.dsum(col("p")).as("total"))
    val o = Tables.orders(s, dir)
    val sink = monthly(
      o.filter(col("o_orderdate") < to_timestamp(lit("1997-01-01 00:00:00"))), 0)
    val candidates = monthly(
      o.filter(col("o_orderdate") >= to_timestamp(lit("1996-01-01 00:00:00"))
        && col("o_orderdate") < to_timestamp(lit("1998-01-01 00:00:00"))), 1000)
    sink.unionByName(
        Relational.newKeysOnly(candidates, sink, Seq("year", "month")))
      .orderBy(col("year"), col("month"))
  }

  /** q49: replace-partition upsert intent (§3.3: absent→append,
    * changed→replace, identical→no-op): the 1997 partitions arrive
    * re-stated (values bumped), 1998 partitions are new, pre-1997
    * stays untouched. Result = base anti updates ∪ updates. */
  val q49UpsertPartition: QuerySpec = QuerySpec(
    "q49_upsert_partition",
    s"""WITH base AS (
       |  SELECT CAST(EXTRACT(year FROM o_orderdate) AS INTEGER) AS year,
       |    CAST(EXTRACT(month FROM o_orderdate) AS INTEGER) AS month,
       |    ${Exact.sqlSum("o_totalprice")} AS total, COUNT(*) AS n
       |  FROM orders WHERE o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
       |  GROUP BY 1, 2),
       |updates AS (
       |  SELECT CAST(EXTRACT(year FROM o_orderdate) AS INTEGER) AS year,
       |    CAST(EXTRACT(month FROM o_orderdate) AS INTEGER) AS month,
       |    ${Exact.sqlSum("o_totalprice * 2")} AS total, COUNT(*) AS n
       |  FROM orders WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
       |    AND o_orderdate < TIMESTAMP '1999-01-01 00:00:00'
       |  GROUP BY 1, 2),
       |merged AS (
       |  SELECT * FROM base b WHERE NOT EXISTS (
       |    SELECT 1 FROM updates u WHERE u.year = b.year AND u.month = b.month)
       |  UNION ALL
       |  SELECT * FROM updates)
       |SELECT year, month, total, n FROM merged ORDER BY year, month""".stripMargin) { (s, dir) =>
    def monthly(df: org.apache.spark.sql.DataFrame, scale: Double) = df
      .select(year(col("o_orderdate")).as("year"),
        month(col("o_orderdate")).as("month"),
        (col("o_totalprice") * scale).as("p"))
      .groupBy(col("year"), col("month"))
      .agg(Exact.dsum(col("p")).as("total"), count(lit(1)).as("n"))
    val o = Tables.orders(s, dir)
    val base = monthly(
      o.filter(col("o_orderdate") < to_timestamp(lit("1998-01-01 00:00:00"))), 1)
    val updates = monthly(
      o.filter(col("o_orderdate") >= to_timestamp(lit("1997-01-01 00:00:00"))
        && col("o_orderdate") < to_timestamp(lit("1999-01-01 00:00:00"))), 2)
    Relational.newKeysOnly(base, updates, Seq("year", "month"))
      .unionByName(updates)
      .orderBy(col("year"), col("month"))
  }

  val specs: Seq[QuerySpec] = Seq(q48DedupAppend, q49UpsertPartition)
}
