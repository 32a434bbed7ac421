package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import java.sql.Timestamp

/** Structured Streaming surface (SURVEY §2.9). The reference is pure
  * batch; its incremental-load pattern (fetch-new → dedup → MERGE) is the
  * batch analog of a streaming `foreachBatch` upsert, so the streaming ops
  * here are free design: tumbling-window counts with a watermark, driven
  * through a MemoryStream for deterministic local verification.
  *
  * At scale this is `spark.readStream.parquet(rawZone)` with the same
  * transform graph — the query below is source-agnostic.
  */
object Streaming {

  final case class Ev(event_id: Long, ts: Timestamp, event_type: String, value: Double)

  private var counter = 0

  /** Tumbling 1-hour windowed counts per event_type, with a 1-hour
    * watermark. Complete output mode ⇒ the final table equals the batch
    * `groupBy(window(ts))` result, making the op oracle-verifiable.
    */
  def windowedCounts(spark: SparkSession, events: DataFrame): DataFrame = {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val data = events.select(col("event_id"), col("ts"), col("event_type"),
      col("value")).as[Ev].collect().toSeq

    val stream = MemoryStream[Ev]
    val name = synchronized { counter += 1; s"graft_stream_$counter" }
    val query = stream.toDF()
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        // decimal sum: exact + engine-portable (see SparkEntry scaladoc)
        sum(col("value").cast(org.apache.spark.sql.types.DecimalType(18, 2)))
          .as("sum_value"))
      .writeStream.format("memory").queryName(name)
      .outputMode("complete").start()

    // feed in two batches so the watermark actually advances mid-stream
    val (first, rest) = data.splitAt(data.size / 2)
    stream.addData(first)
    query.processAllAvailable()
    stream.addData(rest)
    query.processAllAvailable()
    query.stop()

    spark.table(name).select(
      col("window.start").as("window_start"),
      col("event_type"), col("n"),
      // exact decimal accumulation, DOUBLE result type (Relational scaladoc)
      col("sum_value").cast("double").as("sum_value"))
  }

  /** The reference's incremental-load pattern as a stream (SURVEY §2.9):
    * each micro-batch upserts into the running target snapshot via
    * `foreachBatch` — conditional latest-wins merge
    * (`dedupLatest(target ∪ batch)`), which is associative, so the final
    * snapshot is independent of how rows were batched and equals the
    * batch latest-wins result over all events.
    *
    * `target`/`source` split: target starts as the deduped even-id
    * events; odd-id events arrive as the stream in three batches.
    */
  def streamingUpsert(spark: SparkSession, events: DataFrame,
                      keys: Seq[String]): DataFrame = {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import graft.ops.Dedup

    def latest(df: DataFrame): DataFrame =
      Dedup.dedupLatest(df, keys, col("ts"), Seq(col("event_id")))

    val base = events.select(col("event_id"), col("ts"), col("user_id"),
      col("event_type"), col("value"))
    var target = latest(base.filter(col("event_id") % 2 === 0)).persist()
    target.count()

    val odds = base.filter(col("event_id") % 2 === 1)
      .as[(Long, Timestamp, Long, String, Double)].collect().toSeq

    val stream = MemoryStream[(Long, Timestamp, Long, String, Double)]
    val query = stream.toDF()
      .toDF("event_id", "ts", "user_id", "event_type", "value")
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        val next = latest(target.unionByName(batch)).persist()
        next.count() // materialize before dropping the old snapshot
        target.unpersist()
        target = next
        ()
      }
      .outputMode("update").start()

    odds.grouped(math.max(1, odds.size / 3 + 1)).foreach { chunk =>
      stream.addData(chunk)
      query.processAllAvailable()
    }
    query.stop()
    target
  }

  /** Per-key session state: closed sessions + the open one (epoch seconds
    * for gap logic, epoch micros for exact timestamps), plus an update
    * counter so the final emission per key is identifiable.
    */
  final case class SessionAcc(lastSec: Long, curStart: Long, curEnd: Long,
                              curN: Long,
                              closed: List[(Long, Long, Long)], // startUs, endUs, n
                              updates: Long)

  final case class SessionRow(key: Long, update: Long, session_id: Long,
                              start_us: Long, end_us: Long, n_events: Long)

  /** Stateful streaming sessionization via `flatMapGroupsWithState`
    * (SURVEY §2.9 custom-state surface): events arrive in event-time
    * order per key (micro-batches preserve the feed order), state carries
    * the open session, and every update re-emits the full session list
    * tagged with an update counter — the rows from each key's LAST update
    * are the final sessions, equal to the batch gaps-and-islands result.
    *
    * At scale the same code runs against a real source with watermark +
    * EventTimeTimeout evicting closed sessions; the mock feed keeps state
    * small (one open session + closed list per key).
    */
  def statefulSessionize(spark: SparkSession, events: DataFrame,
                         gapSeconds: Long): DataFrame = {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val data = events.select(col("event_id"), col("ts"), col("user_id"))
      .orderBy(col("event_id")) // feed order = event-time order per key
      .as[(Long, Timestamp, Long)].collect().toSeq

    def update(key: Long, it: Iterator[(Long, Timestamp, Long)],
               state: GroupState[SessionAcc]): Iterator[SessionRow] = {
      val sorted = it.toSeq.sortBy(r => (r._2.getTime, r._1))
      var acc = state.getOption.getOrElse(SessionAcc(Long.MinValue, 0, 0, 0, Nil, 0))
      sorted.foreach { case (_, ts, _) =>
        // getTime carries millis and getNanos the full fractional second —
        // build micros from whole seconds + nanos to avoid double-counting
        val us = math.floorDiv(ts.getTime, 1000L) * 1000000L + ts.getNanos / 1000
        val sec = us / 1000000
        acc =
          if (acc.lastSec == Long.MinValue)
            acc.copy(lastSec = sec, curStart = us, curEnd = us, curN = 1)
          else if (sec - acc.lastSec > gapSeconds)
            acc.copy(lastSec = sec, curStart = us, curEnd = us, curN = 1,
              closed = (acc.curStart, acc.curEnd, acc.curN) :: acc.closed)
          else
            acc.copy(lastSec = sec, curEnd = us, curN = acc.curN + 1)
      }
      acc = acc.copy(updates = acc.updates + 1)
      state.update(acc)
      val all = ((acc.curStart, acc.curEnd, acc.curN) :: acc.closed).reverse
      all.zipWithIndex.iterator.map { case ((s, e, n), i) =>
        SessionRow(key, acc.updates, i + 1L, s, e, n)
      }
    }

    val stream = MemoryStream[(Long, Timestamp, Long)]
    val name = synchronized { counter += 1; s"graft_sessions_$counter" }
    val query = stream.toDS()
      .groupByKey(_._3)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(update)
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()

    data.grouped(math.max(1, data.size / 3 + 1)).foreach { chunk =>
      stream.addData(chunk)
      query.processAllAvailable()
    }
    query.stop()

    // final = each key's last update
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("key"))
    spark.table(name)
      .withColumn("last_update", max(col("update")).over(w))
      .filter(col("update") === col("last_update"))
      .select(col("key"), col("session_id"),
        expr("timestamp_micros(start_us)").as("session_start"),
        expr("timestamp_micros(end_us)").as("session_end"),
        col("n_events"))
  }
}
