package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.Streaming

/** The streaming harness is file-backed (several real micro-batches); each
  * op must converge to its batch equivalent regardless of how the files
  * were batched into triggers.
  */
class StreamingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"
  private def scratch(name: String) =
    java.nio.file.Files.createTempDirectory(s"graft-$name").toString + "/src"

  private def events = Tables.events(spark, sf)
    .select(col("event_id"), col("ts"), col("user_id"), col("event_type"),
      col("value"), col("props"))

  test("streamingDedup of the doubled feed equals the feed") {
    val out = Streaming.streamingDedup(spark, events, scratch("dedup"))
    assert(out.count() === events.count())
    assert(out.select("event_id").distinct().count() === events.count())
  }

  test("windowedCounts equals the batch window aggregation") {
    val out = Streaming.windowedCounts(spark, events, scratch("win"))
      .as[(java.sql.Timestamp, String, Long, Double)].collect().toSet
    val batch = events
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(org.apache.spark.sql.types.DecimalType(18, 2)))
          .cast("double").as("sum_value"))
      .select(col("window.start"), col("event_type"), col("n"), col("sum_value"))
      .as[(java.sql.Timestamp, String, Long, Double)].collect().toSet
    assert(out === batch)
  }

  test("statefulSessionize equals batch gaps-and-islands for any batching") {
    val out = Streaming.statefulSessionize(spark, events, 1800L, scratch("sess"))
      .select(col("key"), col("session_id"), col("n_events"))
      .as[(Long, Long, Long)].collect().toSet
    val batch = graft.ops.Temporal.sessionize(events, col("user_id"), col("ts"), 1800L)
      .select(col("key"), col("session_id"), col("n_events"))
      .as[(Long, Long, Long)].collect().toSet
    assert(out === batch)
  }
}
