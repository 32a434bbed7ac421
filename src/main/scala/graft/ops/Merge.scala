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
}
