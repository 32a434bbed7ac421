package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal operators beyond the reference's surface: sessionization and
  * as-of joins — the two time-series shapes every event pipeline
  * eventually needs. Both compose built-in window functions (SURVEY
  * §4.3 preference (a)): one shuffle on the entity key, sort within
  * partition, no custom physical operator required.
  */
object Temporal {

  /** Gaps-and-islands sessionization: events for the same key belong to
    * one session while consecutive gaps stay <= `gapSeconds`. Returns one
    * row per session with start/end/count.
    *
    * Scale: single shuffle on `key`, sort by ts within partitions
    * (WindowExec spills if a key's history exceeds memory). Skewed power
    * users are the known hazard — AQE skew handling applies to the
    * exchange, and the downstream groupBy is on (key, session_id) which
    * subdivides the skew.
    */
  def sessionize(df: DataFrame, key: Column, ts: Column,
                 gapSeconds: Long): DataFrame = {
    val w = Window.partitionBy(col("key")).orderBy(col("ts").asc)
    val gap = col("ts").cast("long") - lag(col("ts"), 1).over(w).cast("long")
    df.select(key.as("key"), ts.as("ts"))
      .withColumn("new_session",
        when(gap.isNull || (gap > gapSeconds), 1L).otherwise(0L))
      .withColumn("session_id",
        sum(col("new_session")).over(
          Window.partitionBy(col("key")).orderBy(col("ts").asc)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("key"), col("session_id"))
      .agg(min(col("ts")).as("session_start"),
           max(col("ts")).as("session_end"),
           count(lit(1)).as("n_events"))
  }

  /** Range join via time-bucketing: pairs of events for the same key
    * within `windowSeconds` of each other (a < b). Spark has no native
    * band-join optimization — a naive `|ta - tb| <= w` theta join is a
    * per-key cross product. The scalable shape: equi-join on
    * (key, floor(ts / w)) plus the neighbor bucket, then filter the exact
    * predicate — each row joins at most two buckets, so the join stays
    * hash-based and linear in matches.
    */
  def rangeJoinPairs(df: DataFrame, key: Column, ts: Column, idCol: Column,
                     windowSeconds: Long): DataFrame = {
    val base = df.select(key.as("key"), ts.as("ts"), idCol.as("id"))
      .withColumn("sec", col("ts").cast("long"))
      .withColumn("bucket", floor(col("sec") / windowSeconds))
    // pairs are ordered by id (not time), so the left side probes its own
    // bucket AND both neighbors; distinct() collapses double matches
    val left = base.select(col("key"), col("id").as("id_a"),
      col("sec").as("sec_a"), col("bucket"))
    val probe = left
      .withColumn("bucket", explode(array(
        col("bucket") - 1, col("bucket"), col("bucket") + 1)))
    val right = base.select(col("key"), col("id").as("id_b"),
      col("sec").as("sec_b"), col("bucket"))
    probe.join(right, Seq("key", "bucket"))
      .filter(col("id_a") < col("id_b") &&
        abs(col("sec_a") - col("sec_b")) <= windowSeconds)
      .select(col("key"), col("id_a"), col("id_b"),
        (col("sec_b") - col("sec_a")).as("dt_sec"))
      .distinct()
  }

  /** Typed grouped-map surface (`KeyValueGroupedDataset.flatMapGroups`):
    * per-key min-max normalization of a value column. This is the batch
    * analog of pandas `groupby().apply()` — arbitrary per-group logic
    * with a typed iterator, for transforms that don't decompose into
    * window functions. Min-max (not z-score) keeps it engine-portable:
    * min/max are exact, so the one division is deterministic.
    *
    * Scale: one shuffle on the key; each group streams through an
    * iterator (materialized here for the two-pass min/max — bounded by
    * the largest single key's history, same bound as any window over the
    * key).
    */
  def groupedMinMaxNormalize(events: DataFrame): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    events.select(col("event_id"), col("user_id"), col("value"))
      .as[(Long, Long, Double)]
      .groupByKey(_._2)
      .flatMapGroups { (user: Long, it: Iterator[(Long, Long, Double)]) =>
        val rows = it.toVector
        val lo = rows.iterator.map(_._3).min
        val hi = rows.iterator.map(_._3).max
        rows.iterator.map { case (id, _, v) =>
          (id, user, if (hi == lo) 0.0 else (v - lo) / (hi - lo))
        }
      }
      .toDF("event_id", "user_id", "norm_value")
  }

  /** Backward as-of join within one table: for each `right`-typed event,
    * attach the most recent prior `left`-typed event of the same key.
    * Implemented with the union trick: tag both sides, sort by (key, ts),
    * carry the last left value forward with `last(..., ignoreNulls)` —
    * one shuffle + sort, no range-join explosion, no custom SparkPlan.
    *
    * This is the standard scalable shape for as-of joins (a naive
    * `leftTs <= rightTs` theta join is quadratic per key).
    */
  /** [[asofPrior]] with a freshness tolerance: a prior match older than
    * `maxAgeSeconds` is treated as no match (both asof columns null) —
    * the standard guard against attributing to stale context (a view
    * from last month shouldn't claim this purchase). Same single
    * shuffle; the tolerance is a post-window projection, so the plan is
    * identical to the untolerated join plus one codegen'd filter
    * expression.
    */
  def asofPriorTolerance(events: DataFrame, key: Column, ts: Column,
                         idCol: Column, leftPred: Column, rightPred: Column,
                         maxAgeSeconds: Long): DataFrame = {
    val base = asofPrior(events, key, ts, idCol, leftPred, rightPred)
    val fresh = col("asof_ts").isNotNull &&
      (col("ts").cast("long") - col("asof_ts").cast("long") <= maxAgeSeconds)
    base.select(col("key"), col("id"), col("ts"),
      when(fresh, col("asof_id")).as("asof_id"),
      when(fresh, col("asof_ts")).as("asof_ts"))
  }

  def asofPrior(events: DataFrame, key: Column, ts: Column, idCol: Column,
                leftPred: Column, rightPred: Column): DataFrame = {
    val tagged = events
      .filter(leftPred || rightPred)
      .select(key.as("key"), ts.as("ts"), idCol.as("id"),
        when(leftPred, ts).as("left_ts"),
        when(leftPred, idCol).as("left_id"),
        rightPred.as("is_right"))
    val w = Window.partitionBy(col("key"))
      .orderBy(col("ts").asc, col("id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tagged
      .withColumn("asof_ts", last(col("left_ts"), ignoreNulls = true).over(w))
      .withColumn("asof_id", last(col("left_id"), ignoreNulls = true).over(w))
      .filter(col("is_right"))
      .select(col("key"), col("id"), col("ts"), col("asof_id"), col("asof_ts"))
  }

  /** Cohort retention matrix: users grouped by first-activity week
    * (cohort), activity counted per whole-week offset from the cohort
    * week — the standard "do week-0 users come back in week N" table.
    * Two shuffles, both on `user`: the first-seen aggregation and the
    * join back reuse the same hash partitioning, so Catalyst plans one
    * exchange for each side and no extra repartition. Week arithmetic is
    * all integer date math — deterministic across engines.
    */
  def retentionCohorts(events: DataFrame, user: Column, ts: Column): DataFrame = {
    val days = events.select(user.as("u"), ts.cast("date").as("day"))
    val cohorts = days.groupBy(col("u"))
      .agg(min(col("day")).as("first_day"))
      .select(col("u"), date_trunc("week", col("first_day")).cast("date").as("cohort_week"))
    days.join(cohorts, "u")
      .groupBy(col("cohort_week"),
        // floor() before the int cast: double->int casting truncates in
        // Spark but rounds in DuckDB; floor makes both exact
        floor(datediff(col("day"), col("cohort_week")) / lit(7))
          .cast("int").as("week_offset"))
      .agg(count_distinct(col("u")).as("n_users"), count(lit(1)).as("n_events"))
  }

  /** Per-user engagement rollup over sessionized activity: session
    * count, total active seconds, and the longest session. Sessions for
    * one user are disjoint by construction (the sessionizer merges
    * anything closer than the gap), so the total is a plain sum of
    * exact second durations — one hash aggregation over the session
    * frame, already partitioned by the user key.
    */
  def userActiveTime(sessions: DataFrame): DataFrame = {
    val dur = col("session_end").cast("long") - col("session_start").cast("long")
    sessions.groupBy(col("key"))
      .agg(count(lit(1)).as("n_sessions"),
        sum(dur).as("active_seconds"),
        max(dur).as("longest_session_seconds"))
  }

  /** Peak session concurrency per day — the capacity-planning sweep
    * line: each session emits a +1 boundary at its start and a -1 at its
    * end; the running sum in time order is the live-session count, and
    * its per-day max is the answer. Session ends sort BEFORE starts at
    * the same instant (end-exclusive intervals: a back-to-back handoff
    * is not concurrency). Both boundaries land on the session's START
    * day, so days partition the sweep and the windows run parallel —
    * sessions are assumed intraday (the 30-min-gap sessions the
    * sessionizer emits virtually always are; a midnight-crossing session
    * is attributed to its start day). The max is order-independent
    * within same-(t, delta) groups, so the explicit key tiebreak makes
    * the whole profile deterministic.
    */
  def concurrencyProfile(sessions: DataFrame): DataFrame = {
    // a single-event session has start == end — an EMPTY half-open
    // interval that the sweep would never count (its -1 sorts before its
    // +1), leaving a day with sessions but zero peak concurrency. Treat
    // point sessions as occupying one second: active for the instant of
    // their only event.
    val endAdj = when(col("session_end") === col("session_start"),
      col("session_start") + expr("INTERVAL 1 SECOND"))
      .otherwise(col("session_end"))
    val b = sessions.select(col("key"),
        to_date(col("session_start")).as("day"),
        explode(array(
          struct(col("session_start").as("t"), lit(1L).as("delta")),
          struct(endAdj.as("t"), lit(-1L).as("delta")))).as("e"))
      .select(col("day"), col("e.t").as("t"), col("e.delta").as("delta"), col("key"))
    val w = Window.partitionBy(col("day"))
      .orderBy(col("t").asc, col("delta").asc, col("key").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    b.withColumn("running", sum(col("delta")).over(w))
      .groupBy(col("day"))
      .agg(max(col("running")).as("max_concurrent"),
        (count(lit(1)) / 2).cast("long").as("n_sessions"))
  }

  /** First-order behavioral transition matrix: counts and conditional
    * probabilities of event-type bigrams per user timeline (ordered by
    * ts with the id as the deterministic tiebreak). One shuffle on the
    * user key for the lag window; the (prev, next) aggregation is
    * hash-combined map-side. The probability is a single division of two
    * exact longs — reproducible bit-for-bit.
    */
  def eventTransitions(events: DataFrame, user: Column, ts: Column,
                       idCol: Column, typeCol: Column): DataFrame = {
    val w = Window.partitionBy(user).orderBy(ts.asc, idCol.asc)
    val counts = events
      .select(typeCol.as("next_type"), lag(typeCol, 1).over(w).as("prev_type"))
      .filter(col("prev_type").isNotNull)
      .groupBy(col("prev_type"), col("next_type"))
      .agg(count(lit(1)).as("n"))
    counts.withColumn("p",
      col("n").cast("double") /
        sum(col("n")).over(Window.partitionBy(col("prev_type"))))
  }

  /** Apply a change batch to an existing SCD2 dimension (the
    * MERGE-INTO-slowly-changing-dimension pattern): closed history rows
    * pass through untouched; each key's OPEN row re-enters the
    * versioning window together with the batch's changes, so the open
    * row closes at the key's first batch change and the batch chains
    * into new versions, the last one open. Because versioning is a pure
    * (ts, id)-ordered lead() per key, the merged table provably equals
    * a full rebuild over history ∪ batch — the incremental-equals-full
    * invariant ([[graft.ops.Changelog.maintainAgg]]'s discipline), and
    * exactly what the oracle checks.
    *
    * Scale: history (the bulk of an SCD2 table) is NEVER shuffled —
    * only open rows + the batch enter the window, both
    * change-sized. The reference's MERGE
    * (`/root/reference/pipeline/data_pipeline.py:159-206`) overwrites
    * in place; SCD2 is the auditable upgrade.
    */
  def scd2Merge(dim: DataFrame, batch: DataFrame, keys: Seq[String],
                ts: Column, idCol: Column,
                payload: Seq[String]): DataFrame = {
    val history = dim.filter(!col("is_current"))
    val open = dim.filter(col("is_current"))
      .select(keys.map(col) ++ payload.map(col) :+
        col("valid_from") :+ col("id"): _*)
    val changes = batch
      .select(keys.map(col) ++ payload.map(col) :+
        ts.as("valid_from") :+ idCol.as("id"): _*)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("valid_from").asc, col("id").asc)
    val versioned = open.unionByName(changes)
      .select(keys.map(col) ++ payload.map(col) :+ col("id") :+
        col("valid_from") :+
        lead(col("valid_from"), 1).over(w).as("valid_to") :+
        lead(col("valid_from"), 1).over(w).isNull.as("is_current"): _*)
    history.unionByName(versioned)
  }

  /** Per-entity exponential smoothing (EWMA) of an ordered value stream,
    * as one aggregation: each entity's (ts, id, value) rows are
    * collected, sorted, and folded left-to-right with
    * `s ← (1−α)·s + α·x` — the classic smoothing/forecast-baseline
    * primitive. α defaults to 0.5, a DYADIC coefficient: halving a
    * double is exact, so every fold step is one exact scale plus one
    * correctly-rounded add — a fixed sequential rounding sequence both
    * engines reproduce bit-identically (the same reasoning as
    * [[graft.ops.Text.charEntropy]]'s fixed fold order). Returns the
    * final smoothed level and the last raw value per entity.
    *
    * Scale: one shuffle on the entity key; per-entity history is
    * collected into the aggregation buffer, so this is for BOUNDED
    * per-entity streams (sessions, daily rollups). For unbounded
    * histories run it over [[tsGapfill]]'s daily table — the fold input
    * is then calendar-sized, not event-sized.
    */
  def ewmaSmooth(events: DataFrame, entity: Column, ts: Column,
                 idCol: Column, value: Column,
                 alpha: Double = 0.5): DataFrame = {
    val ordered = array_sort(collect_list(
      struct(ts.as("ts"), idCol.as("id"), value.as("v"))))
    events
      .groupBy(entity.as("entity"))
      .agg(count(lit(1)).as("n_events"), ordered.as("xs"))
      .select(col("entity"), col("n_events"),
        element_at(col("xs"), -1).getField("v").as("last_value"),
        // standard seed: s1 = x1, then fold x2..xn
        aggregate(
          slice(col("xs"), lit(2), greatest(size(col("xs")) - 1, lit(0))),
          element_at(col("xs"), 1).getField("v"),
          (s, x) => s * lit(1.0 - alpha) + x.getField("v") * lit(alpha))
          .as("ewma"))
  }

  /** Time-window-constrained funnel: the first `step1` event anchors the
    * user's funnel; step 2 must occur within `windowSec` AFTER that
    * anchor, step 3 within `windowSec` after the matched step 2 —
    * earliest-completion semantics (each step matches its FIRST eligible
    * event), the standard conversion-attribution rule. Unlike the plain
    * first-touch funnel (`events_funnel`), an out-of-window step breaks
    * the chain. Returns the per-user funnel table with matched
    * timestamps and the furthest step reached.
    *
    * Scale: three aggregations on the user key; each re-scan is filtered
    * to one event type BEFORE its shuffle, and all three shuffles share
    * the user-key partitioning (co-partitioned joins downstream). All
    * comparisons are microsecond-integer timestamp arithmetic.
    */
  def funnelWindowed(events: DataFrame, user: Column, ts: Column,
                     typeCol: Column, steps: (String, String, String),
                     windowSec: Long): DataFrame = {
    val (s1, s2, s3) = steps
    val e = events.select(user.as("user_id"), ts.as("ts"),
      typeCol.as("et"))
    val a1 = e.filter(col("et") === s1)
      .groupBy(col("user_id")).agg(min(col("ts")).as("t1"))
    val a2 = e.filter(col("et") === s2).join(a1, "user_id")
      .filter(col("ts") >= col("t1") &&
        col("ts") <= col("t1") + expr(s"INTERVAL $windowSec SECONDS"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("t2"))
    val a3 = e.filter(col("et") === s3)
      .join(a2, "user_id")
      .filter(col("ts") >= col("t2") &&
        col("ts") <= col("t2") + expr(s"INTERVAL $windowSec SECONDS"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("t3"))
    a1.join(a2, Seq("user_id"), "left").join(a3, Seq("user_id"), "left")
      .select(col("user_id"), col("t1"), col("t2"), col("t3"),
        (when(col("t3").isNotNull, 3)
          .when(col("t2").isNotNull, 2)
          .otherwise(1)).as("reached_step"))
  }

  /** Time-series regularization: resample each entity's event stream
    * onto the full corpus day calendar (gap days materialized with
    * count 0) and forward-fill the day's closing value across the gaps
    * — the resample+ffill step every per-entity daily feature pipeline
    * runs before model training.
    *
    * Scale: the calendar is `days` rows (tiny — broadcast by
    * construction as a cross join against the distinct-entity set, so
    * the grid is entity-partitioned, never collected); the event feed
    * is aggregated to (entity, day) BEFORE the grid join, so the
    * expensive side shuffles once on the entity key and the
    * forward-fill window sorts short per-entity day vectors. The
    * closing value is `max_by(value, (ts, id))` — the id tiebreak makes
    * it deterministic under equal timestamps, same discipline as
    * [[eventTransitions]].
    */
  def tsGapfill(events: DataFrame, entity: Column, ts: Column,
                idCol: Column, value: Column): DataFrame = {
    val daily = events
      .select(entity.as("entity"), ts.cast("date").as("day"),
        ts.as("ts"), idCol.as("id"), value.as("v"))
      .groupBy(col("entity"), col("day"))
      .agg(count(lit(1)).as("n"),
        max_by(col("v"), struct(col("ts"), col("id"))).as("close"))
    val span = daily.agg(min(col("day")).as("lo"), max(col("day")).as("hi"))
    val calendar = span.select(
      explode(sequence(col("lo"), col("hi"))).as("day"))
    val grid = daily.select(col("entity")).distinct().crossJoin(calendar)
    val filled = grid.join(daily, Seq("entity", "day"), "left")
    val ffill = Window.partitionBy(col("entity")).orderBy(col("day").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    filled.select(col("entity"), col("day"),
      coalesce(col("n"), lit(0L)).as("n"),
      last(col("close"), ignoreNulls = true).over(ffill).as("close_ffill"))
  }

  /** Holt's linear (double-exponential) smoothing over each group's
    * daily count series: level + trend, the forecast baseline one step
    * richer than [[ewmaSmooth]] (which cannot follow a trending feed —
    * its lag is proportional to the slope; Holt's trend term removes
    * it). Standard init l₁=x₁, b₁=x₂−x₁; then
    * lₜ = α·xₜ + (1−α)(lₜ₋₁+bₜ₋₁), bₜ = β(lₜ−lₜ₋₁) + (1−β)bₜ₋₁,
    * forecast = lₙ + h·bₙ.
    *
    * Determinism: α=β=1/2 are DYADIC — every multiply by 1/2 is an
    * exact exponent decrement, so each fold step is a fixed sequence of
    * correctly-rounded adds both engines reproduce bit-identically (the
    * [[ewmaSmooth]] argument, extended to a two-component state). The
    * oracle replays the identical recurrence as a per-group recursive
    * CTE — same association order, same doubles. No rounding needed.
    *
    * Scale: the fold input is the DAILY table (calendar-sized, not
    * event-sized) — one count aggregation over the feed, then a
    * per-group sorted fold in one aggregation buffer. Groups fold
    * independently; a year of days is a 365-element array per group.
    */
  def holtForecast(events: DataFrame, group: Column, ts: Column,
                   horizon: Int = 7): DataFrame = {
    val daily = events.groupBy(group.as("g"), ts.cast("date").as("day"))
      .agg(count(lit(1)).cast("double").as("x"))
    val xsCol = array_sort(collect_list(struct(col("day"), col("x"))))
    def l(s: Column) = s.getField("l")
    def b(s: Column) = s.getField("b")
    daily.groupBy(col("g"))
      .agg(count(lit(1)).as("n_days"), xsCol.as("xs"))
      .select(col("g"), col("n_days"),
        // fold from element 2: with init (l₁=x₁, b₁=x₂−x₁) the t=2 step
        // lands l₂ = ½x₂ + ½(x₁+(x₂−x₁)) = x₂ EXACTLY (counts are
        // integers, so x₁+(x₂−x₁) reconstructs x₂ without rounding) —
        // the textbook init, reached through the uniform recurrence
        aggregate(
          slice(col("xs"), lit(2), greatest(size(col("xs")) - 1, lit(0))),
          struct(
            element_at(col("xs"), 1).getField("x").as("l"),
            // try_: a single-day group has no x₂ (ANSI element_at throws)
            (coalesce(try_element_at(col("xs"), lit(2)).getField("x"),
              element_at(col("xs"), 1).getField("x")) -
              element_at(col("xs"), 1).getField("x")).as("b")),
          (s, e) => {
            // newL appears twice; it is the SAME expression both times,
            // so both engines evaluate the identical rounding sequence
            val x = e.getField("x")
            val newL = lit(0.5) * x + lit(0.5) * (l(s) + b(s))
            struct(newL.as("l"),
              (lit(0.5) * (newL - l(s)) + lit(0.5) * b(s)).as("b"))
          }).as("st"))
      .select(col("g"), col("n_days"),
        l(col("st")).as("level"), b(col("st")).as("trend"),
        (l(col("st")) + lit(horizon.toDouble) * b(col("st")))
          .as("forecast"))
  }

  /** First-touch attribution: every user's conversion revenue is
    * credited to the channel of their FIRST event (ts, id ordered — the
    * acquisition touchpoint), the standard marketing-attribution
    * readout. Revenue is the exact-cents sum of the user's `purchase`
    * events ([[graft.ops.Profile]] money discipline: cents as
    * DECIMAL(38,0), ONE cast to double at the end — a corpus-scale
    * revenue sum stays well inside double's 2^53 exact-integer range).
    *
    * Scale: two aggregations that share the user-key exchange shape —
    * first-touch via min_by (map-side combined, no window buffer), the
    * revenue sum map-side combined; the channel rollup output is
    * channel-count-sized. No event-sized window state anywhere.
    */
  def attributionFirstTouch(events: DataFrame, user: Column, ts: Column,
                            idCol: Column, channel: Column, value: Column,
                            convType: String = "purchase"): DataFrame = {
    val big = org.apache.spark.sql.types.DecimalType(38, 0)
    val perUser = events
      .select(user.as("u"), ts.as("ts"), idCol.as("id"),
        channel.as("ch"), value.as("v"))
      .groupBy(col("u"))
      .agg(
        min_by(col("ch"), struct(col("ts"), col("id"))).as("first_channel"),
        sum(when(col("ch") === convType,
          round(col("v") * lit(100)).cast("long")).otherwise(0L).cast(big))
          .as("cents"),
        max(when(col("ch") === convType, 1L).otherwise(0L)).as("converted"))
    perUser.groupBy(col("first_channel"))
      .agg(count(lit(1)).as("n_users"),
        sum(col("converted")).as("n_converters"),
        (sum(col("cents")).cast("double") / lit(100.0)).as("revenue"))
  }

  /** Cohort LTV curve: users cohorted by first-seen week
    * ([[retentionCohorts]]' grid), each (cohort, week-offset) cell
    * carrying that week's conversion revenue, the RUNNING total, and
    * LTV = cumulative revenue / cohort size — the payback-period table
    * every growth team reads. Money stays exact cents (DECIMAL sums)
    * until the final division; cumulative sums are window sums of exact
    * integers, so the curve is engine-portable with two IEEE divisions
    * per cell as the only float ops.
    *
    * Scale: the user-key aggregation (first day + per-user-week cents)
    * dominates and map-side combines; everything after is
    * cohort×offset-sized. The cumulative window partitions by cohort —
    * hundreds of rows per partition, never data-sized.
    */
  def cohortLtv(events: DataFrame, user: Column, ts: Column,
                channel: Column, value: Column,
                convType: String = "purchase"): DataFrame = {
    val big = org.apache.spark.sql.types.DecimalType(38, 0)
    val base = events.select(user.as("u"), ts.cast("date").as("day"),
      channel.as("ch"), value.as("v"))
    val cohorts = base.groupBy(col("u"))
      .agg(min(col("day")).as("first_day"))
      .select(col("u"),
        date_trunc("week", col("first_day")).cast("date").as("cohort_week"))
    val sizes = cohorts.groupBy(col("cohort_week"))
      .agg(count(lit(1)).as("cohort_users"))
    val cells = base.join(cohorts, "u")
      .groupBy(col("cohort_week"),
        // floor() before the int cast: double->int casting truncates in
        // Spark but rounds in DuckDB; floor makes both exact
        floor(datediff(col("day"), col("cohort_week")) / lit(7))
          .cast("int").as("week_offset"))
      .agg(count_distinct(col("u")).as("n_active"),
        sum(when(col("ch") === convType,
          round(col("v") * lit(100)).cast("long")).otherwise(0L).cast(big))
          .as("cents"))
    val wCum = Window.partitionBy(col("cohort_week"))
      .orderBy(col("week_offset"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cells
      .withColumn("cum_cents", sum(col("cents")).over(wCum))
      .join(sizes, "cohort_week")
      .select(col("cohort_week"), col("week_offset"), col("cohort_users"),
        col("n_active"),
        (col("cents").cast("double") / lit(100.0)).as("revenue"),
        (col("cum_cents").cast("double") / lit(100.0)).as("cum_revenue"),
        (col("cum_cents").cast("double") / lit(100.0) / col("cohort_users"))
          .as("ltv"))
  }

  /** RFM customer segmentation: quartile scores for Recency (days since
    * last order, vs the feed's last day), Frequency (order count) and
    * Monetary (exact-decimal lifetime spend), concatenated into the
    * classic "444" segment label — the standard activation/churn
    * cut that marketing and retention pipelines key on.
    *
    * Determinism: every score is `ntile(4)` over a TOTAL order (metric,
    * then custkey) — ntile's bucket arithmetic is integer and identical
    * across engines, and each ordering ends in the unique key so equal
    * metrics cannot permute. Orderings put the BEST value last so score
    * 4 always reads "best" (most recent / most frequent / biggest
    * spend). Monetary is an exact DECIMAL(18,2) sum; its one
    * decimal→double conversion is the same IEEE value in both engines.
    *
    * Scale: one map-side-combined aggregate to the per-customer table;
    * the global-max-day window and three ntile rankings then run on
    * |customers| rows in a single ordered partition — the
    * oracle-checkable exact-quartile semantics. On a 100 TB feed the
    * same scores come from range-partitioned sort + precomputed quartile
    * BOUNDARIES (one 3-value broadcast per metric); the single-partition
    * window here is the small-table formulation, not the cluster plan.
    */
  def rfmSegments(orders: DataFrame): DataFrame = {
    val perCust = orders.groupBy(col("o_custkey"))
      .agg(max(col("o_orderdate").cast("date")).as("last_day"),
        count(lit(1)).as("frequency"),
        sum(col("o_totalprice")
          .cast(org.apache.spark.sql.types.DecimalType(18, 2)))
          .cast("double").as("monetary"))
    val wAll = Window.partitionBy(lit(1))
    val wr = Window.partitionBy(lit(1))
      .orderBy(col("recency_days").desc, col("o_custkey").asc)
    val wf = Window.partitionBy(lit(1))
      .orderBy(col("frequency").asc, col("o_custkey").asc)
    val wm = Window.partitionBy(lit(1))
      .orderBy(col("monetary").asc, col("o_custkey").asc)
    perCust
      .withColumn("recency_days",
        datediff(max(col("last_day")).over(wAll), col("last_day")))
      .withColumn("r_score", ntile(4).over(wr))
      .withColumn("f_score", ntile(4).over(wf))
      .withColumn("m_score", ntile(4).over(wm))
      .select(col("o_custkey"), col("recency_days"), col("frequency"),
        col("monetary"), col("r_score"), col("f_score"), col("m_score"),
        concat(col("r_score").cast("string"), col("f_score").cast("string"),
          col("m_score").cast("string")).as("segment"))
  }

  /** Frequent 3-step behavioral paths: each user's event stream in
    * (ts, id) order yields its sliding event-type trigrams, counted
    * corpus-wide with the distinct-user breadth beside the raw count —
    * the path-mining extension of [[eventTransitions]] (bigram Markov
    * counts) that product analytics reads as "the journeys users
    * actually take".
    *
    * Determinism: the trigram is a pure function of the totally-ordered
    * stream (two lags over (ts, id)); counts are exact longs;
    * `minCount` bounds the output to the head (at 100 TB the tail of
    * k-grams is the data — the support threshold is what keeps the
    * result table sized to what a human reads).
    *
    * Scale: one shuffle on the user key for the lag windows, one
    * map-side-combined count on the path string. No joins.
    */
  def sequenceNgrams(events: DataFrame, user: Column, ts: Column,
                     id: Column, step: Column,
                     minCount: Long = 5): DataFrame = {
    val w = Window.partitionBy(col("u")).orderBy(col("ts"), col("id"))
    events.select(user.as("u"), ts.as("ts"), id.as("id"), step.as("s"))
      .withColumn("s1", lag(col("s"), 2).over(w))
      .withColumn("s2", lag(col("s"), 1).over(w))
      .filter(col("s1").isNotNull)
      .select(col("u"),
        concat_ws(">", col("s1"), col("s2"), col("s")).as("path"))
      .groupBy(col("path"))
      .agg(count(lit(1)).as("n"), countDistinct(col("u")).as("n_users"))
      .filter(col("n") >= minCount)
  }

  /** Churn label generation: users active in the trailing-but-one week
    * (w1 = days max−13..max−7) get label 1 iff they are silent in the
    * final week (w2 = days max−6..max) — the standard
    * observation/outcome-window labeling that turns an event feed into
    * a supervised training table. Only w1-active users are emitted
    * (the labelable population).
    *
    * Determinism: both windows derive from the feed's own max day (no
    * wall clock — the [[graft.ops.Meta]] pinned-clock rule); activity
    * is exact distinct-day counts.
    *
    * Scale: one 1-row max-day aggregate broadcast back, then one
    * map-side-combined per-user aggregate over the 14-day slice —
    * the date filter prunes everything older at the scan.
    */
  def churnLabel(events: DataFrame, user: Column, ts: Column): DataFrame = {
    val days = events.select(user.as("u"), ts.cast("date").as("day"))
    val maxDay = days.agg(max(col("day")).as("max_day"))
    days.crossJoin(broadcast(maxDay))
      .filter(col("day") >= date_sub(col("max_day"), 13))
      .groupBy(col("u"))
      .agg(
        countDistinct(when(col("day") <= date_sub(col("max_day"), 7),
          col("day"))).as("days_w1"),
        countDistinct(when(col("day") > date_sub(col("max_day"), 7),
          col("day"))).as("days_w2"))
      .filter(col("days_w1") > 0)
      .select(col("u").as("user_id"), col("days_w1"), col("days_w2"),
        when(col("days_w2") === 0, lit(1)).otherwise(lit(0)).as("churned"))
  }

  /** Time-weighted average value per key (TWAP): each observation's
    * value holds until the NEXT observation, so the mean weights each
    * value by its holding duration — the correct average for
    * piecewise-constant state (a price, a gauge, a fleet size), where
    * the plain mean over-counts bursts of updates. The final
    * observation has no successor and is excluded (no holding window).
    *
    * Determinism: durations are whole epoch seconds (floor(b) − floor(a)
    * counts the same second boundaries in both engines even for
    * fractional timestamps); the duration×cents products accumulate in
    * DECIMAL(38,0); the TWAP is one exact→double conversion pair and a
    * fixed /total/100 division chain. Keys whose total duration is 0
    * (all observations in one second) emit NULL.
    *
    * Scale: one shuffle on the key for the lead window, one
    * map-side-combined aggregate. Nothing downstream is data-sized.
    */
  def timeWeightedAvg(events: DataFrame, key: Column, ts: Column,
                      id: Column, value: Column): DataFrame = {
    val big = org.apache.spark.sql.types.DecimalType(38, 0)
    val w = Window.partitionBy(col("u")).orderBy(col("ts"), col("id"))
    val holds = events.select(key.as("u"), ts.as("ts"), id.as("id"),
        round(value * lit(100)).cast("long").as("c"))
      .withColumn("dur",
        lead(col("ts"), 1).over(w).cast("long") - col("ts").cast("long"))
      .filter(col("dur").isNotNull)
    holds.groupBy(col("u")).agg(
        count(lit(1)).as("n_holds"),
        sum(col("dur")).as("total_seconds"),
        sum(col("dur").cast(big) * col("c").cast(big)).as("sw"))
      .select(col("u").as("key"), col("n_holds"), col("total_seconds"),
        when(col("total_seconds") === 0, lit(null).cast("double"))
          .otherwise(col("sw").cast("double") / col("total_seconds")
            / lit(100.0)).as("twap"))
  }

  /** Classical seasonal decomposition of per-group daily totals —
    * value = trend + seasonal + residual — in EXACT scaled-integer
    * arithmetic: the trend is a centered 7-slot rolling mean, so
    * working in units of cents/700 makes every component an integer
    * until one final division. Only interior days (full 7-slot frame)
    * are emitted — a partial frame is not a 7-day mean.
    *
    * Determinism: t7 (the 7-day cents sum) and r7 = 7·c − t7 are exact
    * longs; the weekday is pure integer arithmetic (epoch-day mod 7 —
    * no engine dayofweek convention); the per-(group, weekday) seasonal
    * sum accumulates in DECIMAL(38,0). Each emitted double is a fixed
    * chain over exact inputs: trend = t7/700, seasonal = Σr7/(n·700),
    * residual = r7/700 − seasonal.
    *
    * Scale: one shuffle to the daily table; the rolling window and the
    * weekday aggregation run on days×groups-sized data. At 100 TB the
    * daily table IS the small output of the first aggregate — the
    * decomposition costs nothing beyond it.
    */
  def seasonalDecompose(events: DataFrame, group: Column, ts: Column,
                        value: Column): DataFrame = {
    val big = org.apache.spark.sql.types.DecimalType(38, 0)
    val daily = events.select(group.as("g"), ts.cast("date").as("day"),
        round(value * lit(100)).cast("long").as("c"))
      .groupBy(col("g"), col("day")).agg(sum(col("c")).as("c"))
    val wOrd = Window.partitionBy(col("g")).orderBy(col("day"))
    val w7 = wOrd.rowsBetween(-3, 3)
    val wg = Window.partitionBy(col("g"))
    val interior = daily
      .withColumn("t7", sum(col("c")).over(w7))
      .withColumn("rn", row_number().over(wOrd))
      .withColumn("n_part", count(lit(1)).over(wg))
      .filter(col("rn") >= 4 && col("rn") <= col("n_part") - 3)
      .withColumn("r7", lit(7) * col("c") - col("t7"))
      .withColumn("wd",
        pmod(datediff(col("day"), lit("1970-01-01").cast("date")), lit(7)))
    val seasonal = interior.groupBy(col("g"), col("wd")).agg(
      count(lit(1)).as("n_wd"),
      sum(col("r7").cast(big)).as("s_r7"))
    interior.join(seasonal, Seq("g", "wd"))
      .select(col("g"), col("day"),
        (col("c").cast("double") / lit(100.0)).as("value"),
        (col("t7").cast("double") / lit(700.0)).as("trend"),
        (col("s_r7").cast("double") / (col("n_wd") * lit(700L)))
          .as("seasonal"),
        (col("r7").cast("double") / lit(700.0)
          - col("s_r7").cast("double") / (col("n_wd") * lit(700L)))
          .as("residual"))
  }

  /** Autocorrelation function of a daily aggregate series at lags
    * 1..`maxLag` — the diagnostic behind every seasonality decision
    * ([[seasonalDecompose]]'s period and [[holtForecast]]'s smoothing
    * choice should be READ off an ACF, not guessed). r_k =
    * sum((x_t-m)(x_{t+k}-m)) / sum((x_t-m)^2) with m = S/n; multiplying
    * both sides by n^2 clears the rational mean:
    * num_k = n^2*Sxy_k - n*S*(Sh_k+St_k) + (n-k)*S^2 and
    * den = n^2*Sxx - n*S^2, all EXACT DECIMAL(38,0) on integer cents, so
    * each r_k is one rounded division — bit-reproducible.
    *
    * Scale: one hash aggregate to daily grain, then the lag pairing is
    * an equi-join of the AGGREGATED series to itself on idx = idx + k
    * (series-sized, maxLag copies via a sequence explode — never
    * row-data-sized); the dense index is the one global window, over the
    * aggregated series (the [[Profile.aucRank]] domain discipline).
    */
  def acfLags(df: DataFrame, ts: Column, metric: Column,
              maxLag: Int = 7): DataFrame = {
    require(maxLag >= 1, s"maxLag must be >= 1, got $maxLag")
    val big = org.apache.spark.sql.types.DecimalType(38, 0)
    val daily = df
      .select(ts.cast("date").as("day"),
        round(metric * lit(100)).cast("long").as("c"))
      .groupBy(col("day")).agg(sum(col("c")).as("x"))
    val widx = Window.orderBy(col("day"))
    val series = daily
      .select(row_number().over(widx).cast("long").as("idx"),
        col("x").cast(big).as("x"))
    val tot = series.agg(
      count(lit(1)).cast(big).as("n"),
      sum(col("x")).as("s"),
      sum(col("x") * col("x")).as("sxx"))
    val heads = series
      .select(col("idx"), col("x"),
        explode(sequence(lit(1L), lit(maxLag.toLong))).as("k"))
      .select(col("k"), (col("idx") + col("k")).as("j"), col("x").as("xh"))
    val pairs = heads.join(
      series.select(col("idx").as("j"), col("x").as("xt")), "j")
    val byLag = pairs.groupBy(col("k")).agg(
      count(lit(1)).cast(big).as("np"),
      sum(col("xh") * col("xt")).as("sxy"),
      sum(col("xh")).as("sh"), sum(col("xt")).as("st"))
    byLag.crossJoin(broadcast(tot))
      .select(col("k").as("lag"), col("np").cast("long").as("n_pairs"),
        round((col("n") * col("n") * col("sxy")
          - col("n") * col("s") * (col("sh") + col("st"))
          + col("np") * col("s") * col("s")).cast("double")
          / (col("n") * col("n") * col("sxx")
            - col("n") * col("s") * col("s")).cast("double"), 6).as("acf"))
      .orderBy(col("lag"))
  }

  /** Kaplan–Meier survival curve over entity activity lifetimes — the
    * standard right-censored churn/retention estimator (Kaplan & Meier
    * 1958). Lifetime t = whole hours between an entity's first and last
    * event (exact integer microsecond division). An entity whose last
    * event precedes the corpus's final timestamp by more than
    * `horizonHours` is an EVENT (churned at t); anyone active within
    * the horizon is CENSORED at t (observation ended first). For each
    * distinct event time t_i: n_i (at risk) = entities with lifetime
    * ≥ t_i, d_i = events at t_i, and S(t_i) = Π_{j≤i} (n_j − d_j)/n_j.
    *
    * Determinism: everything up to S is exact integers (micros, counts,
    * window cumsums). S is computed as an ORDERED PREFIX FOLD over the
    * sorted event-time array — both engines multiply the same doubles
    * in the same order — then rounded 1e-6 (the engine's
    * transcendental convention).
    *
    * Scale: ONE entity-keyed aggregation touches the feed; everything
    * downstream lives on the distinct-lifetime table, bounded by the
    * observation window in hours (not by entities), where the global
    * window and the prefix fold are driver-trivial. The 1-row corpus
    * max rides a broadcast.
    */
  def kaplanMeier(events: DataFrame, entity: Column, ts: Column,
                  horizonHours: Int = 12): DataFrame = {
    val us = events.select(entity.as("u"), unix_micros(ts).as("m"))
      .groupBy(col("u"))
      .agg(min(col("m")).as("f"), max(col("m")).as("l"))
    val mx = us.agg(max(col("l")).as("mt"))
    val lab = us.crossJoin(broadcast(mx))
      .select(expr("(l - f) div 3600000000").as("t"),
        (col("l") < col("mt") - lit(horizonHours.toLong * 3600000000L))
          .as("died"))
    val tot = lab.agg(count(lit(1)).as("n_tot"))
    val byT = lab.groupBy(col("t"))
      .agg(sum(when(col("died"), 1L).otherwise(0L)).as("d"),
        count(lit(1)).as("ended"))
    val w = Window.orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val risk = byT.crossJoin(broadcast(tot))
      .withColumn("n",
        col("n_tot") - coalesce(sum(col("ended")).over(w), lit(0L)))
      .filter(col("d") > 0)
      .select(col("t"), col("n"), col("d"))
    val arr = risk.agg(
      array_sort(collect_list(struct(col("t"), col("n"), col("d"))))
        .as("a"))
    val prefix = slice(col("a"), lit(1), col("i") + lit(1))
    arr.select(col("a"), posexplode(col("a")).as(Seq("i", "x")))
      .select(col("x.t").as("t"), col("x.n").as("n_risk"),
        col("x.d").as("n_events"),
        round(aggregate(
          transform(prefix, y =>
            (y.getField("n") - y.getField("d")).cast("double")
              / y.getField("n")),
          lit(1.0), (acc, v) => acc * v), 6).as("survival"))
  }
}
