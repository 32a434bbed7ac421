package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Association mining over grouped facts: co-occurrence counts and PMI
  * for item pairs that appear in the same basket — the market-basket /
  * token-association shape (also the "which sources co-occur in dup
  * clusters" diagnostic of an LLM-data pipeline). Extends the
  * reference's plain GROUP BY audit counts
  * (`/root/reference/pipeline/data_pipeline.py:117-124`) to
  * second-order statistics.
  *
  * Scale: the pair space is generated per basket with a self-equi-join
  * on the basket key, so expansion is Σ sz(b)² over baskets — bounded by
  * the largest basket (13 on TPC-H lineitem, capped upstream in a real
  * feed), never corpus². Counts are map-side-combined longs; the one
  * `ln` per output row is rounded at 1e-6 (the [[Text.charEntropy]]
  * convention) so the doubles are engine-portable.
  */
object Assoc {

  /** Deterministic per-basket size cap — the [[Graph.linkPredict]] hub
    * discipline applied to baskets: keep at most `cap` items per basket,
    * selected by the engine-portable multiplicative-hash order (exact
    * for baskets at or under the cap; a deterministic subsample above
    * it). Order baskets are structurally bounded (max 17 distinct parts
    * per order at sf0.1, measured), so the REGISTERED queries never cap;
    * this is the escape hatch for basket keys with no structural bound —
    * user-as-basket, session-as-basket — where one hot key would emit
    * sz² pairs. The `row_number <= cap` filter compiles to
    * WindowGroupLimit (map-side pre-prune before the pair join).
    *
    * PRECONDITION (same contract as [[Graph.linkPredict]]): item ids
    * must be numeric and below ~2^31.5 — `cast("long")` throws on
    * non-numeric ids under ANSI mode, and ids above that bound overflow
    * the 64-bit multiplicative-hash product. For string or unbounded
    * ids, order by `xxhash64(col("i"))` instead (not the default only
    * because the Knuth scheme is what the DuckDB oracles replay).
    */
  private def capBaskets(items: DataFrame, cap: Int): DataFrame = {
    val ord = org.apache.spark.sql.expressions.Window
      .partitionBy(col("b"))
      .orderBy(pmod(col("i").cast("long") * lit(2654435761L),
        lit(4294967296L)), col("i"))
    items.withColumn("__rnk", row_number().over(ord))
      .filter(col("__rnk") <= cap).drop("__rnk")
  }

  /** Pairwise co-occurrence with pointwise mutual information.
    * `minSupport` bounds the output to pairs seen at least that many
    * times (the standard support threshold — at 100 TB it is what keeps
    * the result table sized to the head of the distribution).
    * `maxBasketSize` (opt-in) bounds the per-basket pair fan-out on
    * feeds whose basket key has no structural size bound — see
    * [[capBaskets]] for the estimator contract.
    */
  def cooccurPmi(facts: DataFrame, basket: Column, item: Column,
                 minSupport: Long = 3,
                 maxBasketSize: Option[Int] = None): DataFrame = {
    val items0 = facts.select(basket.as("b"), item.as("i")).distinct()
    val items = maxBasketSize.fold(items0)(capBaskets(items0, _))
    val nBaskets = items.groupBy().agg(
      countDistinct(col("b")).as("n_baskets"))
    val itemCounts = items.groupBy(col("i")).agg(count(lit(1)).as("n_i"))
    val pairs = items.as("l")
      .join(items.as("r"), col("l.b") === col("r.b") &&
                           col("l.i") < col("r.i"))
      .groupBy(col("l.i").as("item_a"), col("r.i").as("item_b"))
      .agg(count(lit(1)).as("n_ab"))
      .filter(col("n_ab") >= minSupport)
    val ca = itemCounts.select(col("i").as("item_a"), col("n_i").as("n_a"))
    val cb = itemCounts.select(col("i").as("item_b"), col("n_i").as("n_b"))
    pairs
      .join(ca, "item_a")
      .join(cb, "item_b")
      .crossJoin(broadcast(nBaskets))
      .select(col("item_a"), col("item_b"), col("n_ab"), col("n_a"),
        col("n_b"),
        round(log(col("n_ab").cast("double") * col("n_baskets") /
          (col("n_a").cast("double") * col("n_b"))), 6).as("pmi"))
  }

  /** Directional association rules A→B with support / confidence /
    * lift — the market-basket surface proper ([[cooccurPmi]] is the
    * symmetric information-theoretic variant; recommenders and
    * cross-sell pipelines consume THIS parameterization). Each
    * qualifying unordered pair emits both directions.
    *
    * Determinism: all counts are exact longs; support and confidence
    * are single int/int IEEE divisions; lift forms the exact integer
    * product n_ab·N (DECIMAL-safe) before its one division — every
    * double is a fixed-shape function of exact integers, no rounding
    * needed.
    *
    * Scale: the [[cooccurPmi]] pair space (Σ basket², bounded by the
    * largest basket, never corpus²); `minSupport` keeps the output to
    * the head of the distribution.
    */
  def marketBasket(facts: DataFrame, basket: Column, item: Column,
                   minSupport: Long = 3,
                   maxBasketSize: Option[Int] = None): DataFrame = {
    val big = org.apache.spark.sql.types.DecimalType(38, 0)
    val items0 = facts.select(basket.as("b"), item.as("i")).distinct()
    val items = maxBasketSize.fold(items0)(capBaskets(items0, _))
    val nBaskets = items.groupBy().agg(
      countDistinct(col("b")).as("n_baskets"))
    val itemCounts = items.groupBy(col("i")).agg(count(lit(1)).as("n_i"))
    val pairs = items.as("l")
      .join(items.as("r"), col("l.b") === col("r.b") &&
                           col("l.i") < col("r.i"))
      .groupBy(col("l.i").as("item_a"), col("r.i").as("item_b"))
      .agg(count(lit(1)).as("n_ab"))
      .filter(col("n_ab") >= minSupport)
    // both directions of each unordered pair
    val directed = pairs.unionByName(pairs.select(
      col("item_b").as("item_a"), col("item_a").as("item_b"), col("n_ab")))
    val ca = itemCounts.select(col("i").as("item_a"), col("n_i").as("n_a"))
    val cb = itemCounts.select(col("i").as("item_b"), col("n_i").as("n_b"))
    directed
      .join(ca, "item_a")
      .join(cb, "item_b")
      .crossJoin(broadcast(nBaskets))
      .select(col("item_a"), col("item_b"), col("n_ab"), col("n_a"),
        col("n_b"), col("n_baskets"),
        (col("n_ab").cast("double") / col("n_baskets").cast("double"))
          .as("support"),
        (col("n_ab").cast("double") / col("n_a").cast("double"))
          .as("confidence"),
        ((col("n_ab").cast(big) * col("n_baskets").cast(big)).cast("double")
          / (col("n_a").cast(big) * col("n_b").cast(big)).cast("double"))
          .as("lift"))
  }
}
