package graft.ops

import org.apache.spark.sql.{Column, DataFrame}

/** MERGE / upsert over plain parquet-backed DataFrames.
  *
  * The reference delegates this to BigQuery SQL:
  *  - simple upsert: `MERGE target USING staging ON keys; MATCHED →
  *    UPDATE, NOT MATCHED → INSERT` (`pipeline/data_pipeline.py:159-175`)
  *  - upsert with window-deduped source (`:177-206`)
  *
  * Vanilla Spark has no MERGE INTO over bare parquet paths, so we express
  * it as a library-level composition (SURVEY §4.3): source-wins
  * anti-join + union. With all non-key columns updated on match this is
  * exactly the reference's UPDATE/INSERT shape.
  *
  * Scale: `left_anti` is a single equi-join — Catalyst broadcasts the
  * source side when it is small (typical incremental load: small staging
  * vs huge target) and falls back to shuffled hash/sort-merge otherwise;
  * AQE re-plans at runtime. The union is a no-shuffle narrow op. For a
  * partitioned 100 TB target you would additionally restrict the rewrite
  * to affected partitions (dynamic partition overwrite) — see
  * [[graft.sources.Sinks]].
  */
object Merge {

  /** Upsert `source` into `target` on equality of `keys`: matched target
    * rows are replaced by the source row, unmatched target rows are kept,
    * unmatched source rows are inserted.
    *
    * NULL-key semantics match SQL MERGE (ref joins on possibly-NULL
    * `visit_date`, `data_pipeline.py:163` after coerce `:132`): a NULL
    * key never matches, so NULL-keyed target rows are always kept and
    * NULL-keyed source rows always insert.
    */
  def mergeUpsert(target: DataFrame, source: DataFrame, keys: Seq[String]): DataFrame =
    source.unionByName(target.join(source, keys, "left_anti"))

  /** MERGE with latest-wins deduped source — the reference's second MERGE
    * (`data_pipeline.py:177-206`): `ROW_NUMBER() OVER (PARTITION BY keys
    * ORDER BY ts DESC) = 1` subquery, then upsert.
    */
  def mergeUpsertLatest(target: DataFrame, source: DataFrame, keys: Seq[String],
                        ts: Column, tiebreak: Seq[Column]): DataFrame =
    mergeUpsert(target, Dedup.dedupLatest(source, keys, ts, tiebreak), keys)

  /** FULL-SYNC merge — SQL MERGE's third clause family, `WHEN NOT
    * MATCHED BY SOURCE THEN DELETE`: the target becomes an exact mirror
    * of the source's key set (matched rows replaced by the source row,
    * new source rows inserted, target rows absent from the source
    * DROPPED). This is the dimension-table refresh / full-feed
    * replication shape the upsert family can't express (upsert never
    * deletes); with a CDC feed you'd use [[Changelog]] instead — this
    * is for sources that send full state, not deltas.
    *
    * With source-wins-on-match semantics the result is simply the
    * source itself, SO the op also emits the change audit a real sync
    * job logs: each output row is tagged `action` ∈ insert/update/
    * delete/keep by a full-outer key comparison — one join, no second
    * scan; deleted rows carry the TARGET's columns, everything else the
    * source's. NULL keys never match (SQL semantics): a NULL-keyed
    * target row deletes, a NULL-keyed source row inserts.
    *
    * PRECONDITIONS: (1) keys are unique on BOTH sides — SQL MERGE
    * raises on a multi-match; this full-outer formulation would instead
    * silently fan rows out (dedup first, e.g. [[Dedup.dedupLatest]], if
    * the feed can repeat keys). (2) the target's schema is a superset
    * of the source's non-key columns — a missing target column fails
    * analysis (as an unresolved `__t_<col>` attribute) at plan time.
    */
  def mergeFullSync(target: DataFrame, source: DataFrame,
                    keys: Seq[String]): DataFrame = {
    import org.apache.spark.sql.functions._
    val dataCols = source.columns.filterNot(keys.contains).toSeq
    // presence markers, not column nullness: data columns may be
    // legitimately NULL on either side
    val s = source.withColumn("__s", lit(true))
    val t = target.select(
        (keys.map(k => target(k).as(s"__tk_$k")) ++
          dataCols.map(c => target(c).as(s"__t_$c"))): _*)
      .withColumn("__t", lit(true))
    // plain (non-null-safe) equality: a NULL key never matches, so
    // NULL-keyed target rows delete and NULL-keyed source rows insert
    val cond = keys.map(k => s(k) === t(s"__tk_$k")).reduce(_ && _)
    s.join(t, cond, "full_outer")
      .select(
        keys.map(k => coalesce(s(k), t(s"__tk_$k")).as(k)) ++
          dataCols.map(c =>
            when(s("__s").isNotNull, s(c)).otherwise(t(s"__t_$c")).as(c)) :+
          when(s("__s").isNull, "delete")
            .when(t("__t").isNull, "insert")
            .otherwise("update").as("action"): _*)
  }
}
