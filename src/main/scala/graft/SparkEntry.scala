package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.ops._

/** Driver contract — one entry per implemented operator from SURVEY.md §2.
  *
  * Determinism rules (every query must hash-match its DuckDB oracle):
  *  - every window/keep-first op has an explicit total order (tiebreaks);
  *  - money aggregates sum DECIMAL casts, never raw doubles (FP sum order
  *    differs across engines/partitionings);
  *  - timestamps are compared at microsecond precision — oracle SQL casts
  *    DuckDB's TIMESTAMP_NS/_MS to TIMESTAMP;
  *  - no wall clocks: `add_metadata` pins its clock parameter.
  */
object SparkEntry {

  /** Flagship: the reference's crown-jewel semantics (flatten + latest-wins
    * window dedup + MERGE upsert, `data_pipeline.py:177-206`) end-to-end on
    * events. Driver smoke-checks rows>0 on sf0.001.
    */
  def entry(spark: SparkSession): DataFrame =
    queries("merge_upsert_latest")(spark, "/root/testdata/sf0.001")

  // ---- shared builders -------------------------------------------------

  /** events with ts at Spark's microsecond precision; props parsed. */
  private def eventsBase(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"),
              col("value"), col("props"))

  private val eventKeys = Seq("user_id", "event_type")

  // ---- driver contract -------------------------------------------------

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // P1: json_normalize(sep="_") analog (data_pipeline.py:74)
    "flatten_json" -> ((s, dir) =>
      Flatten.flattenJsonColumn(
        Tables.events(s, dir), "props",
        new StructType().add("k", LongType))),

    // D2/W1: latest-wins window dedup (data_pipeline.py:180-187)
    "window_latest" -> ((s, dir) =>
      Dedup.dedupLatest(eventsBase(s, dir), eventKeys,
        col("ts"), Seq(col("event_id")))),

    // D1: keep-first exact dedup on key subset (data_pipeline.py:84-85)
    "dedup_exact" -> ((s, dir) =>
      // tiebreak columns form a total order (synthetic lineitem has
      // duplicate (l_orderkey, l_linenumber) pairs)
      Dedup.dedupExact(Tables.lineitem(s, dir), Seq("l_orderkey"),
        Seq(col("l_linenumber"), col("l_partkey"), col("l_suppkey"),
            col("l_extendedprice")))),

    // M1: MERGE upsert (data_pipeline.py:159-175); staging = modified
    // subset of orders, target = disjoint-ish subset.
    "merge_upsert" -> ((s, dir) => {
      val o = Tables.orders(s, dir)
      val target = o.filter(col("o_orderkey") % 2 === 0)
      val source = o.filter(col("o_orderkey") % 3 === 0)
        .withColumn("o_orderstatus", lit("U"))
        .withColumn("o_totalprice", col("o_totalprice") + lit(1.0))
      Merge.mergeUpsert(target, source, Seq("o_orderkey"))
    }),

    // M2 = D2 ∘ M1: MERGE with window-deduped source (data_pipeline.py:177-206)
    "merge_upsert_latest" -> ((s, dir) => {
      val e = eventsBase(s, dir)
      val target = Dedup.dedupLatest(e.filter(col("event_id") % 2 === 0),
        eventKeys, col("ts"), Seq(col("event_id")))
      val source = e.filter(col("event_id") % 2 === 1)
      Merge.mergeUpsertLatest(target, source, eventKeys,
        col("ts"), Seq(col("event_id")))
    }),

    // P4: type normalization with coerce→NULL (data_pipeline.py:131-136)
    "normalize_types" -> ((s, dir) =>
      Tables.events(s, dir)
        .select(col("event_id"),
          when(col("event_id") % 10 === 0, lit("not-a-date"))
            .otherwise(date_format(col("ts"), "yyyy-MM-dd")).as("visit_date_raw"),
          col("user_id"), col("ts"))
        .select(col("event_id"),
          Meta.coerceDate(col("visit_date_raw")).as("visit_date"),
          Meta.coerceString(col("user_id")).as("visit_id"),
          col("ts").as("load_ts"))),

    // P3: residual complex cells → JSON strings (data_pipeline.py:20-23)
    "sanitize_complex" -> ((s, dir) =>
      Meta.sanitizeComplex(
        Tables.events(s, dir).select(col("event_id"),
          array(col("user_id"), col("event_id")).as("ids"),
          struct(col("event_type").as("t"), col("user_id").as("u")).as("meta")))),

    // P2: lineage metadata columns (data_pipeline.py:79-81); clock pinned
    // for oracle verifiability (SURVEY §7.3).
    "add_metadata" -> ((s, dir) =>
      Meta.addMetadata(
        Tables.events(s, dir).select("event_id", "event_type"),
        clock = to_timestamp(lit("2026-01-01 00:00:00")),
        sourceFile = lit("events.parquet"))),

    // Q1-Q5: all DQ checks in one scan (data_pipeline.py:91-124)
    "dq_report" -> ((s, dir) =>
      Quality.dqReport(Tables.orders(s, dir),
        Quality.DqContract(
          requiredCols = Seq("o_orderkey", "o_custkey", "o_totalprice"),
          keys = Seq("o_orderkey")))),

    // A1: audit record counts (data_pipeline.py:227)
    "agg_counts" -> ((s, dir) =>
      Relational.aggCounts(Seq(
        "orders"   -> Tables.orders(s, dir),
        "lineitem" -> Tables.lineitem(s, dir),
        "events"   -> Tables.events(s, dir),
        "customer" -> Tables.customer(s, dir)))),

    // E6: pricing rollup (TPC-H Q1 shape)
    "agg_rollup" -> ((s, dir) =>
      Relational.pricingRollup(Tables.lineitem(s, dir))),

    // E6: ranking window, top-k per group
    "window_rank" -> ((s, dir) =>
      Relational.topKPerGroup(Tables.orders(s, dir), 10)),

    // E6: star-schema join + rollup with broadcast dimensions
    "join_revenue" -> ((s, dir) => Relational.revenueByNation(s, dir))
  )

  // ---- oracle SQL (DuckDB) --------------------------------------------

  /** All events columns at microsecond ts precision (DuckDB reads the
    * parquet as TIMESTAMP_NS; Spark truncates to micros).
    */
  private val evBase =
    "SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type, value, props FROM events"

  private val latestWin =
    "row_number() OVER (PARTITION BY user_id, event_type ORDER BY ts DESC, event_id DESC)"

  def oracleSql: Map[String, String] = Map(

    "flatten_json" ->
      """SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type, value,
         CAST(json_extract_string(props, '$.k') AS BIGINT) AS props_k
         FROM events""",

    "window_latest" ->
      s"""WITH base AS ($evBase)
          SELECT * FROM base QUALIFY $latestWin = 1""",

    "dedup_exact" ->
      """SELECT l_orderkey, l_partkey, l_suppkey, l_linenumber, l_quantity,
           l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus,
           CAST(l_shipdate AS TIMESTAMP) AS l_shipdate
         FROM lineitem
         QUALIFY row_number() OVER (PARTITION BY l_orderkey
           ORDER BY l_linenumber ASC, l_partkey ASC, l_suppkey ASC, l_extendedprice ASC) = 1""",

    "merge_upsert" ->
      """WITH tgt AS (
           SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
                  CAST(o_orderdate AS TIMESTAMP) AS o_orderdate, o_orderpriority
           FROM orders WHERE o_orderkey % 2 = 0),
         src AS (
           SELECT o_orderkey, o_custkey, 'U' AS o_orderstatus, o_totalprice + 1.0 AS o_totalprice,
                  CAST(o_orderdate AS TIMESTAMP) AS o_orderdate, o_orderpriority
           FROM orders WHERE o_orderkey % 3 = 0)
         SELECT * FROM src
         UNION ALL
         SELECT * FROM tgt
         WHERE NOT EXISTS (SELECT 1 FROM src WHERE src.o_orderkey = tgt.o_orderkey)""",

    "merge_upsert_latest" ->
      s"""WITH base AS ($evBase),
          tgt AS (SELECT * FROM base WHERE event_id % 2 = 0 QUALIFY $latestWin = 1),
          src AS (SELECT * FROM base WHERE event_id % 2 = 1 QUALIFY $latestWin = 1)
          SELECT * FROM src
          UNION ALL
          SELECT * FROM tgt
          WHERE NOT EXISTS (SELECT 1 FROM src
                            WHERE src.user_id = tgt.user_id
                              AND src.event_type = tgt.event_type)""",

    "normalize_types" ->
      """SELECT event_id,
           TRY_CAST(CASE WHEN event_id % 10 = 0 THEN 'not-a-date'
                         ELSE strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d') END AS DATE) AS visit_date,
           CAST(user_id AS VARCHAR) AS visit_id,
           CAST(ts AS TIMESTAMP) AS load_ts
         FROM events""",

    "sanitize_complex" ->
      """SELECT event_id,
           CAST(to_json([user_id, event_id]) AS VARCHAR) AS ids,
           CAST(to_json(struct_pack(t := event_type, u := user_id)) AS VARCHAR) AS meta
         FROM events""",

    "add_metadata" ->
      """SELECT event_id, event_type,
           TIMESTAMP '2026-01-01 00:00:00' AS load_timestamp,
           'events.parquet' AS source_file
         FROM events""",

    "dq_report" ->
      """WITH s AS (SELECT count(*) AS cnt,
                    CAST(sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_keys,
                    count(DISTINCT o_orderkey) AS distinct_keys
             FROM orders)
         SELECT 'empty_input' AS check_name, cnt AS metric, cnt > 0 AS passed FROM s
         UNION ALL SELECT 'required_columns', CAST(0 AS BIGINT), true FROM s
         UNION ALL SELECT 'null_keys', null_keys, null_keys = 0 FROM s
         UNION ALL SELECT 'duplicate_keys', cnt - distinct_keys, cnt - distinct_keys = 0 FROM s
         UNION ALL SELECT 'low_volume', cnt, cnt >= 5 FROM s""",

    "agg_counts" ->
      """SELECT 'orders' AS table_name, count(*) AS record_count FROM orders
         UNION ALL SELECT 'lineitem', count(*) FROM lineitem
         UNION ALL SELECT 'events', count(*) FROM events
         UNION ALL SELECT 'customer', count(*) FROM customer""",

    "agg_rollup" ->
      """SELECT l_returnflag, l_linestatus,
           sum(CAST(l_quantity AS DECIMAL(18,2))) AS sum_qty,
           sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS sum_base_price,
           sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(28,10))) AS sum_disc_price,
           count(*) AS count_order,
           CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_qty,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_price
         FROM lineitem
         WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
         GROUP BY l_returnflag, l_linestatus""",

    "window_rank" ->
      """SELECT o_orderpriority, o_orderkey, o_totalprice,
           row_number() OVER (PARTITION BY o_orderpriority
                              ORDER BY o_totalprice DESC, o_orderkey ASC) AS rnk
         FROM orders QUALIFY rnk <= 10""",

    "join_revenue" ->
      """SELECT r_name, n_name,
           sum(CAST(o_totalprice AS DECIMAL(18,2))) AS revenue,
           count(*) AS n_orders
         FROM orders
         JOIN customer ON o_custkey = c_custkey
         JOIN nation ON c_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         GROUP BY r_name, n_name"""
  )
}
