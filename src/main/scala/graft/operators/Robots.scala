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
