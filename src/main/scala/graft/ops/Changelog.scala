package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Change-data-capture (CDC) log application.
  *
  * The reference's MERGE handles upsert only (`pipeline/data_pipeline
  * .py:159-206`); a production replication feed additionally carries
  * DELETE tombstones and multiple changes per key per load, ordered by a
  * change sequence. Applying such a log is the third merge shape next to
  * [[Merge.mergeUpsert]] and [[Merge.mergeUpsertLatest]]: the FINAL
  * change per key decides the row's fate — a terminal delete removes the
  * key entirely, anything else materializes the newest image.
  *
  * Scale: one shuffle on the key columns (the same latest-wins window as
  * [[Dedup.dedupLatest]], so WindowGroupLimit prunes to one row per key
  * on both sides of the exchange); the tombstone filter is a narrow op.
  * Applying against an existing snapshot composes with
  * [[Merge.mergeUpsert]]: upsert the survivors, anti-join the deletes.
  */
object Changelog {

  /** Collapse a changelog to final state: per `keys`, order by `seq`
    * descending (ties by `tiebreak` descending), keep the newest change,
    * and drop the key entirely when that change is a delete
    * (`opCol === deleteOp`).
    */
  def cdcApply(log: DataFrame, keys: Seq[String], seq: Column,
               tiebreak: Seq[Column], opCol: Column,
               deleteOp: String = "D"): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(seq.desc +: tiebreak.map(_.desc): _*)
    log.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1 && opCol =!= deleteOp)
      .drop("__rn")
  }

  /** Apply a collapsed changelog against a target snapshot: deletes
    * remove target rows, upserts replace-or-insert (MERGE with a WHEN
    * MATCHED AND op='D' THEN DELETE branch). NULL keys never match, as
    * in SQL MERGE.
    */
  def cdcMerge(target: DataFrame, log: DataFrame, keys: Seq[String],
               seq: Column, tiebreak: Seq[Column], opCol: Column,
               deleteOp: String = "D"): DataFrame = {
    val finalOps = {
      val w = Window.partitionBy(keys.map(col): _*)
        .orderBy(seq.desc +: tiebreak.map(_.desc): _*)
      log.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1)
        .drop("__rn")
    }
    val upserts = finalOps.filter(opCol =!= deleteOp)
      .select(target.columns.map(col): _*)
    // any key present in the log (insert/update/delete alike) supersedes
    // the target's row; survivors = untouched target rows + upsert images
    upserts.unionByName(target.join(finalOps.select(keys.map(col): _*),
      keys, "left_anti"))
  }
}
