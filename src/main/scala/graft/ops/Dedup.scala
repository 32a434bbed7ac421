package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators.
  *
  * The reference has two shapes:
  *  - exact keep-first dedup on a key subset:
  *    `drop_duplicates(subset=[...])` (`pipeline/data_pipeline.py:84-85`)
  *  - latest-wins window dedup: `ROW_NUMBER() OVER (PARTITION BY ... ORDER
  *    BY load_timestamp DESC) = 1` (`pipeline/data_pipeline.py:180-187`)
  *
  * Both are nondeterministic in the reference (pandas keep-first depends
  * on input order; ROW_NUMBER ties are arbitrary). We make them
  * deterministic by requiring an explicit ordering (SURVEY §7.3), which
  * also makes them oracle-verifiable.
  *
  * Scale: one shuffle on the key columns (WindowExec sorts within
  * partitions and spills if needed). AQE handles skewed keys. For a
  * 100 TB run the partition count follows `spark.sql.shuffle.partitions`;
  * no driver-side state.
  */
object Dedup {

  private def keep(df: DataFrame, keys: Seq[String], order: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Keep-first dedup on a key subset, "first" defined by `orderBy` asc. */
  def dedupExact(df: DataFrame, keys: Seq[String], orderBy: Seq[Column]): DataFrame =
    keep(df, keys, orderBy.map(_.asc))

  /** Latest-wins dedup: newest row per key by `ts` desc, ties broken by
    * `tiebreak` desc (deterministic ROW_NUMBER, ref `:180-187`).
    */
  def dedupLatest(df: DataFrame, keys: Seq[String], ts: Column,
                  tiebreak: Seq[Column]): DataFrame =
    keep(df, keys, ts.desc +: tiebreak.map(_.desc))

  /** Whole-row exact dedup (`SELECT DISTINCT`) — content-level dedup when
    * the key is every column.
    */
  def distinctRows(df: DataFrame): DataFrame = df.distinct()
}
