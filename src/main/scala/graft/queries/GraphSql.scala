package graft.queries

/** Shared DuckDB generator replaying
  * `Graph.pageRank(…, exactDecimalSum = true)` — the production
  * decimal mode whose order-insensitive sums both engines reproduce
  * bit-for-bit (see q124's registration note). q124 (the trade graph)
  * and q149 (the harvested domain link graph) both append this chain
  * after their own `ed(src, dst)` CTE, so the two queries' iteration
  * arithmetic cannot drift.
  */
object GraphSql {

  /** CTE chain from out-degrees through `r<iters>(node, rank)`.
    * Expects a CTE `ed(src, dst)` (already symmetrized / deduped as
    * the caller intends) in scope; the caller appends
    * `SELECT … FROM r<iters>`. Division mirrors Graph.pageRank
    * op-for-op: 1/N and (1−d)/N are computed, not precomputed
    * literals, on both sides. */
  def prCtes(iters: Int): String = {
    def iterCte(i: Int): String =
      s"""c$i AS (
         |  SELECT e.dst AS node,
         |    CAST(round(r${i - 1}.rank / e.outdeg * 1e15) AS DECIMAL(38,0))
         |      AS ci
         |  FROM eo e JOIN r${i - 1} ON e.src = r${i - 1}.node),
         |a$i AS (
         |  SELECT node, SUM(ci) AS si FROM c$i GROUP BY node),
         |r$i AS (
         |  SELECT nd.node, COALESCE(
         |    (CAST(1 AS DOUBLE) - 0.85) / (SELECT nn FROM nv)
         |      + 0.85 * (CAST(a$i.si AS DOUBLE) / 1e15),
         |    (CAST(1 AS DOUBLE) - 0.85) / (SELECT nn FROM nv)) AS rank
         |  FROM nodes nd LEFT JOIN a$i USING (node))""".stripMargin
    s"""outdeg AS (SELECT src, COUNT(*) AS outdeg FROM ed GROUP BY 1),
       |nodes AS (SELECT DISTINCT src AS node FROM ed),
       |nv AS (SELECT CAST(COUNT(*) AS DOUBLE) AS nn FROM nodes),
       |eo AS (SELECT e.src, e.dst, o.outdeg FROM ed e
       |       JOIN outdeg o USING (src)),
       |r0 AS (
       |  SELECT node, CAST(1 AS DOUBLE) / (SELECT nn FROM nv) AS rank
       |  FROM nodes),
       |${(1 to iters).map(iterCte).mkString(",\n")}""".stripMargin
  }

  /** CTE chain replaying `Graph.hits` — quantized decimal mutual-
    * reinforcement sums with ∞-norm normalization (see the operator's
    * Scaladoc for why max, not L2). Expects `ed(src, dst)` (directed,
    * deduped); leaves `h<iters>(node, h)` and `aa<iters>(node, a)` in
    * scope for the caller's final SELECT. */
  def hitsCtes(iters: Int): String = {
    def iterCte(i: Int): String =
      s"""ars$i AS (
         |  SELECT e.dst AS node,
         |    SUM(CAST(round(h.h * 1e15) AS DECIMAL(38,0))) AS si
         |  FROM ed e JOIN h${i - 1} h ON h.node = e.src GROUP BY e.dst),
         |arf$i AS (
         |  SELECT nd.node, COALESCE(CAST(s.si AS DOUBLE) / 1e15, 0.0) AS a
         |  FROM hnodes nd LEFT JOIN ars$i s USING (node)),
         |amx$i AS (SELECT MAX(a) AS m FROM arf$i),
         |aa$i AS (
         |  SELECT node, a / (SELECT m FROM amx$i) AS a FROM arf$i),
         |hrs$i AS (
         |  SELECT e.src AS node,
         |    SUM(CAST(round(aa.a * 1e15) AS DECIMAL(38,0))) AS si
         |  FROM ed e JOIN aa$i aa ON aa.node = e.dst GROUP BY e.src),
         |hrf$i AS (
         |  SELECT nd.node, COALESCE(CAST(s.si AS DOUBLE) / 1e15, 0.0) AS h
         |  FROM hnodes nd LEFT JOIN hrs$i s USING (node)),
         |hmx$i AS (SELECT MAX(h) AS m FROM hrf$i),
         |h$i AS (
         |  SELECT node, h / (SELECT m FROM hmx$i) AS h FROM hrf$i)"""
        .stripMargin
    s"""hnodes AS (SELECT src AS node FROM ed UNION SELECT dst FROM ed),
       |h0 AS (SELECT node, CAST(1 AS DOUBLE) AS h FROM hnodes),
       |${(1 to iters).map(iterCte).mkString(",\n")}""".stripMargin
  }
}
