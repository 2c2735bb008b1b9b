package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph analytics beyond connected components
  * ([[Dedup.connectedComponents]]): PageRank with a FIXED iteration
  * count and bit-reproducible float arithmetic, so the whole
  * computation — not just a tolerance band — is oracle-verifiable.
  *
  * Reproducibility contract (the q121 discipline): every per-node
  * inbound sum folds a SORTED (src, contribution) array instead of
  * using a parallel double SUM, pinning float addition order across
  * partitionings and engines; all other arithmetic (rank/outdeg,
  * damping multiply, base add) is scalar double ops with one
  * deterministic result. By induction every iteration's ranks are
  * bit-identical wherever they're computed.
  *
  * Scale shape: per iteration, ONE equi-join of the edge list against
  * the rank vector (shuffle on src) and ONE grouped aggregation
  * (shuffle on dst) — the standard distributed PageRank step. The
  * sorted-array fold bounds per-node state by in-degree; for
  * power-law graphs whose celebrity nodes make that array large, the
  * production variant swaps the fold for an order-insensitive exact
  * sum (decimal-space contributions) at the cost of the cross-engine
  * replay. Iteration count is fixed and small (the plan unrolls);
  * convergence-driven variants would localCheckpoint per round like
  * [[Dedup.connectedComponents]].
  */
object Graph {

  /** `(node, rank)` after `iterations` rounds of damped PageRank over
    * the DISTINCT directed edge set. Every node must have out-degree
    * ≥ 1 (symmetrize undirected graphs first): dangling nodes would
    * silently leak rank mass, so they're rejected up front — the
    * check is one metadata-sized count, the [[Similarity]] IVF /
    * as-of guard pattern. */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
               iterations: Int, damping: Double = 0.85): DataFrame = {
    require(iterations >= 1 && iterations <= 10,
      s"iterations=$iterations outside [1, 10] — the plan unrolls")
    require(damping > 0 && damping < 1, s"damping=$damping outside (0,1)")
    val e = edges.select(col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst")).distinct().cache()
    val outdeg = e.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct().cache()
    // ONE metadata-sized stats job: |V| (needed as the 1/N literal)
    // plus the dangling-node count (out-degree 0 would silently leak
    // rank mass)
    val stats = nodes
      .join(outdeg.select(col("src").as("node"), col("outdeg")),
        Seq("node"), "left")
      .agg(count(lit(1)).as("n"),
        sum(when(col("outdeg").isNull, 1L).otherwise(0L)).as("dangling"))
      .head()
    val n = stats.getLong(0)
    require(n > 0, "empty graph")
    val dangling = stats.getLong(1)
    require(dangling == 0,
      s"$dangling dangling node(s) — symmetrize or add self-loops first")
    val base = (1.0 - damping) / n.toDouble
    // consumed once per iteration — cache the joined edge list, not
    // just the raw edges
    val eo = e.join(outdeg, Seq("src")).cache()
    var rank = nodes.withColumn("rank", lit(1.0 / n.toDouble))
    for (_ <- 1 to iterations) {
      val contribs = eo.join(rank, eo("src") === rank("node"))
        .select(col("dst").as("node"),
          struct(col("src"), (col("rank") / col("outdeg")).as("c")).as("e"))
      val summed = contribs.groupBy(col("node"))
        .agg(array_sort(collect_list(col("e"))).as("es"))
        .select(col("node"),
          (lit(base) + lit(damping) *
            aggregate(col("es"), lit(0.0), (a, x) => a + x("c")))
            .as("rank"))
      rank = nodes.join(summed, Seq("node"), "left")
        .select(col("node"),
          coalesce(col("rank"), lit(base)).as("rank"))
    }
    rank
  }
}
