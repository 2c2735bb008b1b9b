package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Robots-exclusion policy evaluation (training-data pipeline ★ — the
  * compliance gate a crawl-derived corpus must pass before anything
  * else touches it): RFC 9309 group-member semantics over a literal
  * rule set — among a host's rules whose path-prefix matches the URL
  * path, the LONGEST prefix wins; an allow and disallow of equal
  * length resolve to allow; a URL with no matching rule (or no rules
  * for its host) is allowed.
  *
  * Scale shape: the rule set is a LITERAL broadcast frame (crawl
  * policies are KBs, corpora are TBs); evaluation is one broadcast
  * left join on host plus a per-URL window over candidate rules
  * (bounded by the host's rule count) — the URL frame is hash-
  * partitioned by url once and never re-shuffled. Sort keys are
  * null-free by construction (unmatched rows rank with length −1), so
  * the rank order is engine-independent.
  */
object Robots {

  /** Verdicts for the DISTINCT URLs of `urls(urlCol)`:
    * `(url, host, path, allowed, rule_prefix)` where `rule_prefix` is
    * the winning rule's prefix (NULL when no rule matched). `rules`
    * rows are `(host, pathPrefix, allow)`. */
  def evaluate(urls: DataFrame, urlCol: String,
               rules: Seq[(String, String, Boolean)]): DataFrame = {
    require(rules.size <= 4096,
      s"rules.size=${rules.size} too large to broadcast as a literal frame")
    require(rules.forall(_._2.startsWith("/")),
      "every rule path-prefix must start with '/'")
    val spark = urls.sparkSession
    import spark.implicits._
    val ruleDf = rules.toDF("host", "prefix", "allow")
    val u = urls.select(col(urlCol).as("url")).distinct()
      .withColumn("host", graft.functions.TextFunctions.urlHost(col("url")))
      .withColumn("path",
        regexp_extract(col("url"), "^[a-z][a-z0-9+.-]*://[^/]*(/.*)?$", 1))
    val cand = u.join(broadcast(ruleDf), Seq("host"), "left")
      .withColumn("matched",
        col("prefix").isNotNull && col("path").startsWith(col("prefix")))
      .withColumn("mlen",
        when(col("matched"), length(col("prefix"))).otherwise(lit(-1)))
      .withColumn("aint",
        when(col("matched"), col("allow").cast("int")).otherwise(lit(-1)))
    Relational.topKPerGroup(cand, Seq(col("url")),
        Seq(col("mlen").desc, col("aint").desc,
          coalesce(col("prefix"), lit("")).asc), 1)
      .select(col("url"), col("host"), col("path"),
        when(col("mlen") >= 0, col("allow")).otherwise(lit(true))
          .as("allowed"),
        when(col("mlen") >= 0, col("prefix")).otherwise(lit(null))
          .as("rule_prefix"))
  }

  /** Crawl-frontier scheduling (training-data pipeline ★ — the wave
    * selection a polite crawler runs: candidate URLs with priorities
    * pass the robots gate ([[evaluate]]), each HOST contributes at
    * most `perHostCap` URLs (politeness — no host is hammered however
    * high its pages score), and the global wave takes the top
    * `budget` by (priority DESC, url). Re-discovered URLs collapse to
    * their MAX priority first (frontiers see the same link many
    * times).
    *
    * Scale shape: the max-priority collapse is one url-key aggregate;
    * the rule set broadcasts (≤4096 literal rows); the politeness cap
    * is a per-host window (hosts are many — no single-partition
    * window); the budget is TakeOrderedAndProject. Output:
    * `(url, host, priority, host_rank)`. */
  def frontier(cands: DataFrame, urlCol: String, priorityCol: String,
               rules: Seq[(String, String, Boolean)],
               perHostCap: Int, budget: Int): DataFrame = {
    require(perHostCap >= 1, s"perHostCap=$perHostCap")
    require(budget >= 1, s"budget=$budget")
    import org.apache.spark.sql.expressions.Window
    val uniq = cands.groupBy(col(urlCol).as("url"))
      .agg(max(col(priorityCol)).as("priority"))
    val verdict = evaluate(uniq, "url", rules)
      .filter(col("allowed")).select(col("url"), col("host"))
    val allowed = uniq.join(verdict, Seq("url"))
    val w = Window.partitionBy(col("host"))
      .orderBy(col("priority").desc, col("url"))
    allowed.withColumn("host_rank", row_number().over(w))
      .filter(col("host_rank") <= perHostCap)
      .orderBy(col("priority").desc, col("url"))
      .limit(budget)
      .select(col("url"), col("host"), col("priority"), col("host_rank"))
  }

  /** DuckDB replay of [[frontier]] over `candsRel(url, priority)`:
    * a full tail starting after the caller's WITH — emits CTEs ending
    * in `fwave` (the caller selects from it with the same total
    * order + LIMIT). */
  def sqlFrontier(candsRel: String,
                  rules: Seq[(String, String, Boolean)],
                  perHostCap: Int): String =
    s"""frontu AS (
       |  SELECT url, MAX(priority) AS priority FROM $candsRel
       |  GROUP BY 1),
       |${sqlEvaluate("frontu", rules)},
       |fallow AS (
       |  SELECT u.url, u.priority, v.host
       |  FROM frontu u JOIN rverdict v ON v.url = u.url AND v.allowed),
       |fwave AS (
       |  SELECT url, host, priority,
       |    CAST(row_number() OVER (PARTITION BY host
       |      ORDER BY priority DESC, url) AS INTEGER) AS host_rank
       |  FROM fallow
       |  QUALIFY host_rank <= $perHostCap)""".stripMargin

  /** DuckDB replay of [[evaluate]] over a CTE/table `urlsRel(url)`
    * (pre-parsed host + path identical to the Column side). */
  def sqlEvaluate(urlsRel: String,
                  rules: Seq[(String, String, Boolean)]): String = {
    def q(s: String) = s"'${s.replace("'", "''")}'"
    val ruleRows = rules.map { case (h, p, a) =>
      s"(${q(h)}, ${q(p)}, $a)"
    }.mkString(",\n    ")
    val hostSql = graft.functions.TextFunctions.sqlUrlHost("url")
    s"""rrules(host, prefix, allow) AS (VALUES
       |    $ruleRows),
       |ru AS (
       |  SELECT DISTINCT url FROM $urlsRel),
       |rup AS (
       |  SELECT url, $hostSql AS host,
       |    regexp_extract(url, '^[a-z][a-z0-9+.-]*://[^/]*(/.*)?$$', 1)
       |      AS path
       |  FROM ru),
       |rcand AS (
       |  SELECT u.url, u.host, u.path, r.prefix, r.allow,
       |    (r.prefix IS NOT NULL AND starts_with(u.path, r.prefix))
       |      AS matched
       |  FROM rup u LEFT JOIN rrules r ON u.host = r.host),
       |rrank AS (
       |  SELECT url, host, path, prefix, allow, matched,
       |    CASE WHEN matched THEN len(prefix) ELSE -1 END AS mlen,
       |    row_number() OVER (PARTITION BY url ORDER BY
       |      CASE WHEN matched THEN len(prefix) ELSE -1 END DESC,
       |      CASE WHEN matched THEN CAST(allow AS INTEGER) ELSE -1 END DESC,
       |      COALESCE(prefix, '')) AS rn
       |  FROM rcand),
       |rverdict AS (
       |  SELECT url, host, path,
       |    CASE WHEN mlen >= 0 THEN allow ELSE TRUE END AS allowed,
       |    CASE WHEN mlen >= 0 THEN prefix END AS rule_prefix
       |  FROM rrank WHERE rn = 1)""".stripMargin
  }
}
