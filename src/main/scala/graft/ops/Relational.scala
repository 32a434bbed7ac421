package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Relational analytics surface (SURVEY §2.5-2.7 + [EXT] E6). The
  * reference's only aggregate is `len(df)` for the audit trail
  * (`pipeline/data_pipeline.py:227,260`) — BigQuery was its analytics
  * engine. Here the aggregations are first-class.
  *
  * Determinism note (oracle parity): money sums are computed over
  * `DECIMAL` casts, never raw doubles — double summation order varies
  * with partitioning (and differs from DuckDB), decimal sums are exact
  * and engine-independent. Averages are derived as
  * `CAST(decimal_sum AS DOUBLE) / count` so both engines perform one
  * identical IEEE division.
  *
  * Result-type note: the exact decimal sums are CAST to DOUBLE in the
  * final projection. Spark widens `sum(DECIMAL(p,s))` to `DECIMAL(p+10,s)`
  * while DuckDB widens to `DECIMAL(38,s)`; the values are identical but
  * downstream readers render the two decimal types differently (trailing
  * zeros, scale). A double is the same 8 bytes everywhere — and since the
  * summed value is exact in decimal, the one decimal→double conversion is
  * the same correctly-rounded IEEE value in both engines.
  */
object Relational {

  /** Audit record-count op (`data_pipeline.py:219-242`): one row per
    * table, `(table_name, record_count)`.
    */
  def aggCounts(dfs: Seq[(String, DataFrame)]): DataFrame =
    dfs.map { case (name, df) =>
      df.agg(count(lit(1)).as("record_count")).select(
        lit(name).as("table_name"), col("record_count"))
    }.reduce(_.unionByName(_))

  /** TPC-H Q1-shaped pricing rollup over lineitem: partial + final hash
    * aggregation, one shuffle on two low-cardinality keys.
    */
  def pricingRollup(lineitem: DataFrame): DataFrame = {
    val dec = DecimalType(18, 2)
    lineitem
      .filter(col("l_shipdate") <= to_timestamp(lit("1998-09-02 00:00:00")))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity").cast(dec)).as("sum_qty"),
        sum(col("l_extendedprice").cast(dec)).as("sum_base_price"),
        sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .cast(DecimalType(28, 10))).as("sum_disc_price"),
        count(lit(1)).as("count_order"))
      .withColumn("avg_qty",
        col("sum_qty").cast("double") / col("count_order"))
      .withColumn("avg_price",
        col("sum_base_price").cast("double") / col("count_order"))
      .withColumn("sum_qty", col("sum_qty").cast("double"))
      .withColumn("sum_base_price", col("sum_base_price").cast("double"))
      // sum_disc_price: round to the business scale (2) before the
      // double cast. A ~1e7 value at scale 2 has ~9 significant digits,
      // exactly representable in a double on both Spark and DuckDB —
      // sidestepping both the scale-10 last-ulp divergence and
      // cross-engine decimal string rendering.
      .withColumn("sum_disc_price", round(col("sum_disc_price"), 2).cast("double"))
  }

  /** Top-k per group via ranking window: top `k` orders by price within
    * each priority class. Deterministic tiebreak on the key.
    */
  def topKPerGroup(orders: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    orders
      .select(col("o_orderpriority"), col("o_orderkey"), col("o_totalprice"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
  }

  /** CUBE rollup: revenue by (returnflag, linestatus) with all grouping-set
    * subtotals. `grouping_id` disambiguates subtotal rows from NULL data.
    */
  def cubeRollup(lineitem: DataFrame): DataFrame =
    lineitem
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity").cast(DecimalType(18, 2))).as("sum_qty"),
        count(lit(1)).as("n"),
        grouping_id().as("gid"))
      .withColumn("sum_qty", col("sum_qty").cast("double"))

  /** ROLLUP grouping sets: hierarchical subtotals (flag, flag+status,
    * grand total) — the drill-down companion to [[cubeRollup]].
    */
  def rollupSets(lineitem: DataFrame): DataFrame =
    lineitem
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity").cast(DecimalType(18, 2))).as("sum_qty"),
        count(lit(1)).as("n"),
        grouping_id().as("gid"))
      .withColumn("sum_qty", col("sum_qty").cast("double"))

  /** FULL OUTER join surface: every customer and every order, including
    * customers without orders and (synthetic) orders without customers;
    * scalar projection keeps both null sides visible.
    */
  def fullOuterOrders(customer: DataFrame, orders: DataFrame): DataFrame =
    customer.select(col("c_custkey"), col("c_name"))
      .join(orders.select(col("o_orderkey"), col("o_custkey")),
        col("c_custkey") === col("o_custkey"), "full_outer")
      .select(
        col("c_custkey"), col("c_name"), col("o_orderkey"),
        when(col("c_custkey").isNull, "order_only")
          .when(col("o_orderkey").isNull, "customer_only")
          .otherwise("matched").as("side"))

  /** Exact distinct-count per group (Catalyst's expand + two-phase plan —
    * the thing you swap for approx_count_distinct/HLL sketches at 100 TB
    * when exactness stops being worth the shuffle).
    */
  def distinctUsers(events: DataFrame): DataFrame =
    events.groupBy(col("event_type"))
      .agg(count_distinct(col("user_id")).as("n_users"),
           count(lit(1)).as("n_events"))

  /** Pivot: events count per user x event_type — columnar contingency
    * table. Explicit value list keeps the schema static (a dynamic pivot
    * would need a driver-side distinct pass first).
    */
  def pivotEventCounts(events: DataFrame, types: Seq[String]): DataFrame =
    events.groupBy(col("user_id"))
      .pivot("event_type", types)
      .agg(count(lit(1)))

  /** 2-D Pareto frontier (skyline): rows no other row dominates, where
    * q dominates p iff q.cost <= p.cost AND q.gain >= p.gain with at
    * least one strict. Equal (cost, gain) duplicates never dominate each
    * other, so all survive — matching the NOT EXISTS oracle exactly.
    *
    * Scale shape: dominance against smaller costs decomposes into
    * (a) a per-cost max-gain pre-aggregation, (b) a running max WITHIN
    * each cost bucket (parallel windows, partitioned by bucket), and
    * (c) a running max ACROSS buckets — a window over the bucket-count-
    * sized frame only. No global per-row window, no self-join: the only
    * single-reducer step is over ~cost_range/bucketWidth rows.
    */
  def skylinePareto(df: DataFrame, cost: Column, gain: Column,
                    idCol: Column, bucketWidth: Double): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
    val pb = floor(cost / lit(bucketWidth)).cast("long")
    val byCost = df.groupBy(pb.as("pb"), cost.as("c")).agg(max(gain).as("mx"))
    val bucketMax = byCost.groupBy(col("pb")).agg(max(col("mx")).as("bmx"))
      .withColumn("bm_lt", max(col("bmx")).over( // strictly smaller buckets
        w.orderBy(col("pb").asc).rowsBetween(Long.MinValue, -1)))
    val runLt = byCost // max gain over strictly smaller costs
      .withColumn("in_lt", max(col("mx")).over(
        w.partitionBy(col("pb")).orderBy(col("c").asc).rowsBetween(Long.MinValue, -1)))
      .join(broadcast(bucketMax.select(col("pb"), col("bm_lt"))), "pb")
      .select(col("c"), col("mx"),
        greatest(coalesce(col("in_lt"), lit(Long.MinValue)),
          coalesce(col("bm_lt"), lit(Long.MinValue))).as("run_lt"))
    df.select(idCol.as("id"), cost.as("cost"), gain.as("gain"))
      .join(runLt, col("cost") === col("c"))
      // frontier: nothing cheaper has >= gain, nothing equal-cost has more
      .filter(col("run_lt") < col("gain") && col("gain") === col("mx"))
      .select(col("id"), col("cost"), col("gain"))
  }

  /** Star-schema join + rollup: revenue per nation. Dimension sides
    * (nation, region) are explicitly broadcast — no shuffle for the
    * dimension joins even at 100 TB fact scale; only the customer⋈orders
    * equi-join shuffles (AQE picks broadcast there too when customer
    * fits).
    */
  def revenueByNation(spark: SparkSession, dir: String): DataFrame = {
    val c = graft.Tables.customer(spark, dir)
    val o = graft.Tables.orders(spark, dir)
    val n = graft.Tables.nation(spark, dir)
    val r = graft.Tables.region(spark, dir)
    o.join(c, o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(
        sum(col("o_totalprice").cast(DecimalType(18, 2))).as("revenue"),
        count(lit(1)).as("n_orders"))
      .withColumn("revenue", col("revenue").cast("double"))
  }

  /** Survivorship / golden record: collapse an entity's conflicting
    * records into one row under per-field rules — the MDM merge that
    * follows entity resolution ([[graft.ops.TextDedup]]'s clusters say
    * WHICH records are one entity; this decides what the merged entity
    * SAYS). Rules here: recency-wins for status and priority (max_by
    * over the (ts, id) version order — deterministic under equal
    * timestamps), extremum for first-seen/top-value, exact-DECIMAL sum
    * for lifetime spend.
    *
    * Scale: ONE map-side-combined aggregation on the entity key —
    * max_by carries a single (value, version) candidate per partition,
    * never a window buffer; no shuffle beyond the key exchange.
    */
  def goldenRecord(orders: DataFrame): DataFrame = {
    val ver = struct(col("o_orderdate"), col("o_orderkey"))
    orders.groupBy(col("o_custkey"))
      .agg(
        max_by(col("o_orderstatus"), ver).as("latest_status"),
        max_by(col("o_orderpriority"), ver).as("latest_priority"),
        min(col("o_orderdate").cast("date")).as("first_order_day"),
        max(col("o_totalprice")).as("top_order_value"),
        sum(col("o_totalprice").cast(DecimalType(18, 2)))
          .cast("double").as("lifetime_spend"),
        count(lit(1)).as("n_orders"))
  }

  /** Revenue-concentration audit per nation: the Gini coefficient and
    * top-decile share of customer lifetime spend — the "how skewed is
    * this key" statistic that decides whether a downstream join needs
    * salting, and (on a corpus) whether a handful of sources dominate a
    * training mix. Output: one row per nation.
    *
    * Determinism: spend is exact cents; customers rank by
    * (spend, custkey) so ties are total-ordered; the Gini numerator
    * 2·Σi·xᵢ − (n+1)·Σx and denominator n·Σx accumulate in
    * DECIMAL(38,0) (every product < 2^63 while per-nation spend stays
    * under ~$9e16 — document-scale safe), and each emitted ratio is ONE
    * decimal→double conversion pair + ONE IEEE division, rounded 1e-6.
    * The top decile is the integer-arithmetic tail i > n − n/10
    * (floor division) of the same ranking — no percentile
    * interpolation.
    *
    * Scale: one shuffle to per-customer spend, one window ranking
    * partitioned by nation (customer-sized, spread across nations), one
    * map-side-combined final aggregate to |nations| rows.
    */
  def giniConcentration(orders: DataFrame, customer: DataFrame,
                        nation: DataFrame): DataFrame = {
    val big = DecimalType(38, 0)
    val cents = round(col("o_totalprice") * lit(100)).cast("long").cast(big)
    val spend = orders.groupBy(col("o_custkey"))
      .agg(sum(cents).as("spend"))
    val byNation = spend
      .join(customer.select(col("c_custkey"), col("c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation.select(col("n_nationkey"), col("n_name"))),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("n_name").as("nation"), col("o_custkey").as("custkey"),
        col("spend"))
    val w = Window.partitionBy(col("nation"))
      .orderBy(col("spend").asc, col("custkey").asc)
    val wn = Window.partitionBy(col("nation"))
    val ranked = byNation
      .withColumn("i", row_number().over(w).cast("long").cast(big))
      .withColumn("n_part", count(lit(1)).over(wn))
    val agg = ranked.groupBy(col("nation")).agg(
      count(lit(1)).as("n_customers"),
      sum(col("spend")).as("sx"),
      sum(col("i") * col("spend")).as("six"),
      sum(when(col("i") > (col("n_part") - expr("n_part div 10"))
          .cast("long").cast(big), col("spend"))
        .otherwise(lit(0).cast(big))).as("top_x"))
    val nB = col("n_customers").cast(big)
    val den = nB * col("sx")
    def ratio(num: Column): Column =
      when(den === 0, lit(null).cast("double"))
        .otherwise(round(num.cast("double") / den.cast("double"), 6))
    agg.select(col("nation"), col("n_customers"),
      col("sx").cast("double").as("total_cents"),
      ratio(lit(2).cast(big) * col("six") - (nB + lit(1).cast(big)) * col("sx"))
        .as("gini"),
      when(col("sx") === 0, lit(null).cast("double"))
        .otherwise(round(col("top_x").cast("double") /
          col("sx").cast("double"), 6)).as("top_decile_share"))
  }

  /** Largest-remainder proration: allocate a per-order integer-cents
    * budget (here `pctNum/pctDen` of the order's line total, e.g. a 5%
    * rebate) across its lines proportionally to line value, in WHOLE
    * CENTS, such that the per-order allocations sum EXACTLY to the
    * budget — the classic finance requirement where naive rounding
    * drifts by a cent and reconciliation fails. Method: each line gets
    * floor(budget*line/total); the remaining r cents (r < #lines) go one
    * each to the r lines with the largest remainders
    * (budget*line mod total), ties broken by line number.
    *
    * Determinism: all arithmetic is integral (products are bounded by
    * per-ORDER magnitudes — budget*line_cents ~ 1e17 << 2^63 — so LONG
    * is exact regardless of corpus scale). Scale: one window partition
    * per order key — the natural key partitioning, no global state; the
    * output is line-grained like the input.
    */
  def prorateAllocate(lineitem: DataFrame, pctNum: Long = 5L,
                      pctDen: Long = 100L): DataFrame = {
    require(pctNum >= 0 && pctDen > 0, s"bad pct $pctNum/$pctDen")
    val cents = round(col("l_extendedprice") * lit(100)).cast("long")
    val wo = Window.partitionBy(col("l_orderkey"))
    val wr = Window.partitionBy(col("l_orderkey"))
      .orderBy(col("rem").desc, col("l_linenumber").asc)
    val base = lineitem
      .select(col("l_orderkey"), col("l_linenumber"), cents.as("line_cents"))
      .withColumn("tot", sum(col("line_cents")).over(wo))
      .withColumn("budget", expr(s"(tot * $pctNum) div $pctDen"))
      .withColumn("num", col("budget") * col("line_cents"))
      .withColumn("fl", when(col("tot") === 0, lit(0L))
        .otherwise(expr("num div tot")))
      .withColumn("rem", when(col("tot") === 0, lit(0L))
        .otherwise(expr("num % tot")))
    base
      .withColumn("extra_rank", row_number().over(wr).cast("long"))
      .withColumn("short", col("budget") - sum(col("fl")).over(wo))
      .select(col("l_orderkey"), col("l_linenumber"), col("line_cents"),
        col("budget"),
        (col("fl") + when(col("extra_rank") <= col("short"), lit(1L))
          .otherwise(lit(0L))).as("alloc_cents"))
  }
}
