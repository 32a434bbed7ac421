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
}
