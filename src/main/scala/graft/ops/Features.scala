package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** ML feature-engineering operators: the last mile between a curated
  * event feed and a training table. The reference stops at loading
  * cleaned rows (`/root/reference/pipeline/data_pipeline.py:242`);
  * a production training pipeline then derives per-entity temporal
  * features and encoded categoricals — these are that surface.
  */
object Features {

  /** Per-key temporal lag features: previous value, exact-cents delta,
    * and a trailing 3-event rolling sum/mean — the standard
    * feature-vector prefix for sequence models and gradient-boosted
    * trees.
    *
    * Determinism: the window orders by (ts, id) — a total order — and
    * every accumulated quantity is exact integer cents (a rolling SUM
    * of doubles would round differently under DuckDB's segment-tree
    * aggregation vs Spark's running add). The rolling mean is
    * cents→double then two fixed-order IEEE divisions of exact inputs.
    *
    * Scale: ONE shuffle on the key; all three features ride the same
    * sort (WindowExec evaluates the lag and both frames in one pass).
    */
  def lagFeatures(df: DataFrame, key: Column, ts: Column, id: Column,
                  value: Column): DataFrame = {
    val cents = round(value * lit(100)).cast("long")
    val w = Window.partitionBy(col("k")).orderBy(col("ts"), col("id"))
    val w3 = w.rowsBetween(-2, 0)
    df.select(key.as("k"), ts.as("ts"), id.as("id"), value.as("value"),
        cents.as("c"))
      .withColumn("lag1_value", lag(col("value"), 1).over(w))
      .withColumn("delta_cents", col("c") - lag(col("c"), 1).over(w))
      .withColumn("rolling3_sum_cents", sum(col("c")).over(w3))
      .withColumn("rolling3_n", count(lit(1)).over(w3))
      .select(col("k"), col("ts"), col("id"), col("value"),
        col("lag1_value"), col("delta_cents"), col("rolling3_sum_cents"),
        (col("rolling3_sum_cents").cast("double") / col("rolling3_n")
          / lit(100.0)).as("rolling3_mean"))
  }

  /** Leave-one-out target encoding of a categorical: each row gets the
    * mean target of its OWN category computed WITHOUT the row itself —
    * the encoding that feeds a target-aware categorical into a model
    * without leaking the row's label into its feature. Categories with
    * a single row emit NULL (no peers to average).
    *
    * Determinism: per-category Σtarget accumulates in exact
    * DECIMAL(38,0) cents; the per-row (S − x)/(n − 1)/100 is two
    * fixed-order IEEE divisions of exact inputs — no rounding needed.
    *
    * Scale: one map-side-combined aggregate to |categories| rows,
    * broadcast back over the feed — the [[Profile.flagAnomalies]]
    * join shape; the feed is never shuffled.
    */
  def targetEncode(df: DataFrame, category: Column, id: Column,
                   target: Column): DataFrame = {
    val big = DecimalType(38, 0)
    val cents = round(target * lit(100)).cast("long").cast(big)
    val stats = df.select(category.as("cat"), cents.as("c"))
      .groupBy(col("cat"))
      .agg(count(lit(1)).as("n_cat"), sum(col("c")).as("s_cat"))
    df.select(id.as("id"), category.as("cat"), target.as("target"),
        cents.as("c"))
      .join(broadcast(stats), "cat")
      .select(col("id"), col("cat"), col("target"),
        when(col("n_cat") === 1, lit(null).cast("double"))
          .otherwise((col("s_cat") - col("c")).cast("double")
            / (col("n_cat") - lit(1)) / lit(100.0)).as("loo_mean"))
  }

  /** Deterministic negative sampling for contrastive / two-tower
    * training: every observed (user, item) positive spawns `k`
    * pseudo-random candidate negatives from the item key space, and
    * candidates that collide with a TRUE positive of the same user are
    * dropped (the standard "sampled negatives minus accidental hits"
    * semantics). No RNG anywhere — the candidate is a pure function of
    * (user, item, j) through the engine's portable hash, so the same
    * training set regenerates bit-identically on any cluster, any
    * partitioning, any day ([[Shard.splitCol]] philosophy).
    *
    * Scale: positives×k is a projection (explode + hash, no shuffle);
    * the collision filter is one left-anti join on (user, candidate)
    * against the positive set — key-sized, broadcastable when the
    * interaction table's distinct half fits. `itemCount` must be the
    * CONTIGUOUS item-id domain size (TPC-H part keys are 1..P).
    */
  def negativeSampling(interactions: DataFrame, user: Column, item: Column,
                       items: DataFrame, itemKey: Column,
                       k: Int = 4): DataFrame = {
    val pos = interactions.select(user.as("u"), item.as("p")).distinct()
    val domain = items.agg(max(itemKey).as("np"))
    val cand = pos
      .crossJoin(broadcast(domain))
      .select(col("u"), col("p"), col("np"),
        explode(sequence(lit(0L), lit(k.toLong - 1))).as("j"))
      .withColumn("neg",
        lit(1) + pmod(Shard.portableHash(
          col("u") * lit(31L) + col("p") * lit(k.toLong) + col("j")),
          col("np")))
    cand.join(pos.select(col("u"), col("p").as("neg")),
        Seq("u", "neg"), "left_anti")
      .select(col("u").as("custkey"), col("p").as("pos_part"), col("j"),
        col("neg").as("neg_part"))
  }

  /** Quantile (rank) normalization of a numeric feature within its
    * group: each row maps to its percentile position
    * (rank − 1)/(n − 1) ∈ [0, 1] — the distribution-free transform that
    * makes features comparable across groups with different scales
    * (and the first half of cross-sample quantile normalization).
    * Singleton groups emit NULL (no span to place the row on).
    *
    * Determinism: `rank()` orders by exact cents ONLY, so ties share a
    * rank and the result is independent of tie order; the percentile is
    * one int/int IEEE division — the explicit formula rather than
    * engine `percent_rank` so the n = 1 case is pinned by contract.
    *
    * Scale: one shuffle on the group for the rank window; the count
    * rides the same partition. No joins.
    */
  def quantileNormalize(df: DataFrame, group: Column, id: Column,
                        value: Column): DataFrame = {
    val w = Window.partitionBy(col("g")).orderBy(col("c"))
    val wg = Window.partitionBy(col("g"))
    df.select(group.as("g"), id.as("id"), value.as("value"),
        round(value * lit(100)).cast("long").as("c"))
      .withColumn("rk", rank().over(w))
      .withColumn("n_part", count(lit(1)).over(wg))
      .select(col("g"), col("id"), col("value"),
        when(col("n_part") === 1, lit(null).cast("double"))
          .otherwise((col("rk") - lit(1)).cast("double")
            / (col("n_part") - lit(1)).cast("double")).as("q_norm"))
  }

  /** Mutual-information feature-relevance table: bucket a numeric
    * feature into fixed-width cents bins (top bin open-ended) and emit,
    * per (bucket, label) cell, the exact count, the lift
    * n*N / (n_b * n_t), and the cell's MI contribution
    * (n/N) * ln(lift) — the ranking signal behind "which feature
    * actually separates the classes" in curation and filter design.
    *
    * Per-cell output on purpose: summing ln terms across cells would
    * make the result depend on a floating-point fold ORDER; each cell's
    * value here is a fixed two-op IEEE sequence (one division feeding
    * one ln, one multiply), rounded at 1e-6 — the engine's ln
    * convention. All counts are exact via three window sums over the
    * CELL table (|buckets| x |labels| rows, not the corpus); the single
    * corpus-sized shuffle is the cell groupBy.
    */
  def featureMi(df: DataFrame, feature: Column, label: Column,
                bucketCents: Long = 5000L, maxBucket: Int = 5): DataFrame = {
    val cents = round(feature * lit(100)).cast("long")
    val cells = df
      .select(least((cents / lit(bucketCents)).cast("long"),
          lit(maxBucket.toLong)).as("bucket"),
        label.as("label"))
      .groupBy(col("bucket"), col("label"))
      .agg(count(lit(1)).as("n"))
    val wb = Window.partitionBy(col("bucket"))
    val wt = Window.partitionBy(col("label"))
    val wAll = Window.partitionBy()
    val lift = (col("n") * col("n_all")).cast("double") /
      (col("n_b") * col("n_t")).cast("double")
    cells
      .withColumn("n_b", sum(col("n")).over(wb))
      .withColumn("n_t", sum(col("n")).over(wt))
      .withColumn("n_all", sum(col("n")).over(wAll))
      .select(col("bucket"), col("label"), col("n"),
        round(lift, 6).as("lift"),
        round(col("n").cast("double") / col("n_all").cast("double")
          * log(lift), 6).as("mi_contrib"))
  }
}
