package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

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

  /** Advance a TOMBSTONE-RETAINING CDC state by one batch: the state
    * keeps every key's newest change image INCLUDING deletes (the `op`
    * column survives), and the batch wins a key iff its newest change is
    * strictly newer than the state's. Because "keep the max-version row
    * per key" is associative, commutative, and idempotent, ANY slicing
    * of a changelog into batches — in any order, with replays — lands
    * the identical state, and filtering `op != 'D'` at read time equals
    * [[cdcApply]] over the full log. Retaining tombstones is what makes
    * out-of-order application safe: dropping a deleted key outright
    * (as [[cdcMerge]]'s one-shot semantics do) would let a late-arriving
    * OLDER update resurrect it.
    *
    * Scale: one latest-wins window on the batch (batch-sized), then a
    * key full-outer join of two key-sized tables; rows travel as one
    * packed struct so the join carries each image once regardless of
    * column count.
    */
  def cdcAdvance(state: DataFrame, batch: DataFrame, keys: Seq[String],
                 seqCols: Seq[String]): DataFrame = {
    val cols = state.columns.toSeq
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(seqCols.map(col(_).desc): _*)
    val newest = batch.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
    def pack(df: DataFrame, as: String): DataFrame =
      df.select(keys.map(col) :+ struct(cols.map(col): _*).as(as): _*)
    def ver(c: Column): Column = struct(seqCols.map(c.getField): _*)
    pack(state, "__s").join(pack(newest, "__b"), keys, "full_outer")
      .select(when(col("__s").isNull ||
          (col("__b").isNotNull && ver(col("__b")) > ver(col("__s"))),
        col("__b")).otherwise(col("__s")).as("__r"))
      .select(cols.map(n => col("__r").getField(n).as(n)): _*)
  }

  /** Incremental JOIN-view maintenance — the join sibling of
    * [[maintainAgg]]: a materialized equi-join view J = A ⋈ₖ B is
    * advanced by one tick's inserts on EITHER side via the classic
    * delta rule (Blakeley et al., SIGMOD 1986)
    *
    *   ΔJ = ΔA ⋈ (B_old ∪ ΔB)  ∪  A_old ⋈ ΔB
    *
    * (folding the ΔA ⋈ ΔB cross-term into the first join), so the
    * accumulated-⋈-accumulated work is NEVER redone: every join in a
    * tick is delta-sized on at least one side — at 100 TB the view and
    * the accumulated sides are storage, and a tick shuffles only the
    * delta plus matching keys. Insert-only by contract (deletes need
    * the multiset-count generalization); late-arriving B rows pick up
    * their earlier A matches through the A_old ⋈ ΔB term, which is
    * what makes this strictly stronger than re-joining each batch
    * against a static dimension.
    */
  def maintainJoin(view: DataFrame, aOld: DataFrame, bOld: DataFrame,
                   dA: DataFrame, dB: DataFrame,
                   keys: Seq[String]): DataFrame =
    view
      .unionByName(dA.join(bOld.unionByName(dB), keys))
      .unionByName(aOld.join(dB, keys))

  /** Drive [[maintainJoin]] through a whole insert-only history split
    * into `ticks` arrival batches (rows with tick t arrive at step t):
    * the view after the last tick equals the one-shot A ⋈ B by the
    * delta-rule invariant — which is exactly what the oracle recomputes.
    * The view is localCheckpoint-ed per tick (the iterative-loop
    * lineage discipline: each tick's plan references the prior view
    * once and must not replay the whole history).
    */
  def maintainJoinTicks(a: DataFrame, b: DataFrame, keys: Seq[String],
                        aTick: Column, bTick: Column,
                        ticks: Int): DataFrame = {
    var view = a.join(b, keys).limit(0)
    for (t <- 0 until ticks) {
      view = maintainJoin(view,
        aOld = a.filter(aTick < t), bOld = b.filter(bTick < t),
        dA = a.filter(aTick === t), dB = b.filter(bTick === t),
        keys).localCheckpoint()
    }
    view
  }

  /** Incremental aggregate maintenance — the materialized-view shape of
    * incremental ETL: a per-key (n, sum) aggregate table built from the
    * existing corpus is advanced by a NEW batch without re-reading the
    * corpus. Counts and sums are decomposable, so
    * maintain(agg(corpus), batch) == agg(corpus ∪ batch) exactly — the
    * invariant the oracle checks (full recompute) and the whole point:
    * at 100 TB the corpus is never rescanned, each tick aggregates only
    * the batch (map-side combined) and full-outer-merges two key-sized
    * tables. Money sums are DECIMAL (the engine's exact-money rule);
    * min/max are also decomposable and ride along; AVG is derived at
    * read time as sum/n, never stored.
    */
  def maintainAgg(aggTable: DataFrame, batch: DataFrame, keys: Seq[String],
                  value: Column): DataFrame = {
    val delta = batch
      .groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n"),
        sum(value.cast(DecimalType(38, 2))).as("s"),
        min(value).as("mn"), max(value).as("mx"))
    aggTable.select(keys.map(col) :+ col("n").as("n0") :+ col("s").as("s0")
        :+ col("mn").as("mn0") :+ col("mx").as("mx0"): _*)
      .join(delta, keys, "full_outer")
      .select(keys.map(col) ++ Seq(
        (coalesce(col("n0"), lit(0L)) + coalesce(col("n"), lit(0L))).as("n"),
        (coalesce(col("s0"), lit(BigDecimal(0)).cast(DecimalType(38, 2))) +
          coalesce(col("s"), lit(BigDecimal(0)).cast(DecimalType(38, 2))))
          .cast(DecimalType(38, 2)).as("s"),
        least(coalesce(col("mn0"), col("mn")), coalesce(col("mn"), col("mn0")))
          .as("mn"),
        greatest(coalesce(col("mx0"), col("mx")), coalesce(col("mx"), col("mx0")))
          .as("mx")): _*)
  }

  /** Snapshot regression diff — what changed between two loads of the
    * same table: keys only in the new snapshot (`added`), only in the
    * old (`removed`), and present in both with different payloads
    * (`changed`). Unchanged rows are filtered out — at 100 TB they are
    * almost all the rows, and a diff must be change-sized. Payload
    * comparison is a sha2 over the concatenated payload
    * columns — 64 bytes per row through the join regardless of row
    * width.
    */
  def snapshotDiff(oldDf: DataFrame, newDf: DataFrame, keys: Seq[String],
                   payload: Seq[String]): DataFrame = {
    def hashed(df: DataFrame, as: String): DataFrame =
      df.select(keys.map(col) :+
        sha2(concat_ws("", payload.map(c => col(c).cast("string")): _*), 256)
          .as(as): _*)
    val j = hashed(oldDf, "h_old")
      .join(hashed(newDf, "h_new"), keys, "full_outer")
    j.select(keys.map(col) :+
        when(col("h_old").isNull, "added")
          .when(col("h_new").isNull, "removed")
          .when(col("h_old") =!= col("h_new"), "changed")
          .otherwise("unchanged").as("status"): _*)
      .filter(col("status") =!= "unchanged")
  }

  /** Build the [[maintainAgg]] aggregate table from scratch. */
  def buildAgg(df: DataFrame, keys: Seq[String], value: Column): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n"),
        sum(value.cast(DecimalType(38, 2))).as("s"),
        min(value).as("mn"), max(value).as("mx"))
}
