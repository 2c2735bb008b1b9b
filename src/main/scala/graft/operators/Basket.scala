package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Market-basket association rules (Agrawal & Srikant 1994's Apriori
  * measures over 2-itemsets) — the co-occurrence / lift analysis every
  * retail warehouse and recommender bootstrap runs: which item pairs
  * appear together more often than independence predicts.
  *
  * Scale shape: the basket×item frame is deduped once, single-item
  * support counts in one grouped pass, and the APRIORI PRUNE applies
  * BEFORE pair generation — only items meeting the support floor enter
  * the per-basket self-join, so the pair stream is bounded by
  * (frequent items per basket)² instead of basket size² on the raw
  * stream. The pair self-join is basket-key equi (one shuffle); rule
  * metrics join the pair counts back to the item counts on item keys.
  * Top-k rules plan as TakeOrderedAndProject, never a global sort.
  *
  * Determinism: all counts are exact; support / confidence / lift are
  * single IEEE divides of exact ints rounded to 6 (lift divides two
  * rounded quotients — also one op), so results hash-match the SQL
  * replay.
  */
object Basket {

  /** 2-itemset rules over `(basketCol, itemCol)` rows. `minPairCount`
    * is the absolute pair-support floor (applied to items first — the
    * Apriori property: a pair can't reach the floor if either item
    * doesn't). Returns one row per unordered frequent pair
    * (item_a < item_b) with both directed confidences and the lift,
    * top `k` by (pair count desc, item_a, item_b). */
  def pairRules(df: DataFrame, basketCol: String, itemCol: String,
                minPairCount: Long, k: Int = 100): DataFrame = {
    require(minPairCount >= 1, "minPairCount must be positive")
    require(k >= 1, "k must be positive")
    // deduped once, consumed three times (item counts, basket-universe
    // count, frequent join) — cached so the distinct shuffle runs once;
    // the harness drops per-query caches after materialization
    val items = df.select(col(basketCol).as("basket"),
      col(itemCol).as("item")).distinct().cache()
    val itemCounts = items.groupBy(col("item"))
      .agg(count(lit(1)).as("n_item"))
    // basket universe size rides the plan as a 1-row broadcast cross
    // (the q76 stats-attach shape) — no eager driver action at
    // operator-construction time
    val nBaskets = items.agg(
      countDistinct(col("basket")).as("n_baskets"))
    val frequent = items.join(
      itemCounts.filter(col("n_item") >= minPairCount), Seq("item"))
    val a = frequent.select(col("basket"), col("item").as("item_a"),
      col("n_item").as("n_a"))
    val b = frequent.select(col("basket"), col("item").as("item_b"),
      col("n_item").as("n_b"))
    val pairs = a.join(b, Seq("basket"))
      .filter(col("item_a") < col("item_b"))
      .groupBy(col("item_a"), col("item_b"), col("n_a"), col("n_b"))
      .agg(count(lit(1)).as("n_pair"))
      .filter(col("n_pair") >= minPairCount)
    val supA = round(col("n_a").cast("double") / col("n_baskets"), 6)
    val supB = round(col("n_b").cast("double") / col("n_baskets"), 6)
    val scored = pairs.crossJoin(broadcast(nBaskets))
      .select(col("item_a"), col("item_b"),
      col("n_pair"), col("n_a"), col("n_b"),
      round(col("n_pair").cast("double") / col("n_baskets"), 6)
        .as("support"),
      round(col("n_pair").cast("double") / col("n_a"), 6)
        .as("conf_a_b"),
      round(col("n_pair").cast("double") / col("n_b"), 6)
        .as("conf_b_a"),
      round(round(col("n_pair").cast("double") / col("n_a"), 6)
        / supB, 6).as("lift_a_b"),
      round(round(col("n_pair").cast("double") / col("n_b"), 6)
        / supA, 6).as("lift_b_a"))
    // orderBy + limit plans TakeOrderedAndProject (the q08 shape)
    scored.orderBy(col("n_pair").desc, col("item_a").asc,
      col("item_b").asc).limit(k)
  }
}
