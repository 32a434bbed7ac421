package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-profiling operators: the diagnostics a pipeline owner runs
  * before trusting a new feed — per-column stats and key-skew reports.
  * Both are single-scan aggregations (profiling 100 TB must not cost
  * more than one read).
  */
object Profile {

  /** Key-distribution skew report: the top-N heaviest keys with their
    * absolute counts and share of all rows. THE first diagnostic when a
    * shuffle stage straggles — a key with share ≫ 1/partitions is the
    * salting candidate. Two-level hash aggregation (partial map-side
    * combine), then a top-N sort of the (already tiny) per-key counts.
    * The total is summed from the per-key counts, not re-counted from
    * `df`: both branches share the per-key aggregation's exchange, so
    * ReuseExchange plans exactly ONE scan of the input (asserted by
    * ProfileSpec) — profiling 100 TB must not cost two reads.
    */
  def heavyHitters(df: DataFrame, key: Column, topN: Int = 10): DataFrame = {
    val counts = df.groupBy(key.as("key")).agg(count(lit(1)).as("n"))
    val total = counts.agg(sum(col("n")).as("total"))
    counts.crossJoin(total)
      .withColumn("share", col("n").cast("double") / col("total"))
      .orderBy(col("n").desc, col("key").asc)
      .limit(topN)
      .select(col("key"), col("n"), col("share"))
  }

  /** Per-column profile of numeric columns: min / max / null count /
    * distinct count, one output row per column — the schema-contract
    * companion (Quality.dqReport validates expectations; this MEASURES
    * the feed). ONE scan: a single aggregate row fans out into per-column
    * rows via an inline explode, not one job per column. Stats are cast
    * to DOUBLE for a uniform row schema (min/max of stored values are
    * exact — no arithmetic happens on them).
    */
  def profileNumeric(df: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs = cols.flatMap { c =>
      Seq(min(col(c)).cast("double").as(s"${c}__min"),
        max(col(c)).cast("double").as(s"${c}__max"),
        // sum over zero rows is NULL — an empty feed has zero nulls, not
        // unknown nulls
        coalesce(sum(when(col(c).isNull, 1L).otherwise(0L)), lit(0L))
          .as(s"${c}__nulls"),
        count_distinct(col(c)).as(s"${c}__distinct"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val rows = cols.map { c =>
      struct(lit(c).as("column"),
        col(s"${c}__min").as("min_value"),
        col(s"${c}__max").as("max_value"),
        col(s"${c}__nulls").as("n_nulls"),
        col(s"${c}__distinct").as("n_distinct"))
    }
    one.select(explode(array(rows: _*)).as("p")).select(col("p.*"))
  }
}
