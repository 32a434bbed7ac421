package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

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
      col("event_type"), col("n"), col("sum_value"))
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
}
