package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Features, Profile, Temporal}

/** Round-6 seventeenth wave: time-weighted average, quantile
  * normalization, seasonal decomposition, live heavy hitters.
  */
class Wave17Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(day: Int, h: Int = 10, m: Int = 0) =
    java.sql.Timestamp.valueOf(f"2024-03-$day%02d $h%02d:$m%02d:00")

  test("timeWeightedAvg: holding-duration weights; zero-span key is NULL") {
    val e = Seq(
      // user 1: 1.00 held 600 s, 3.00 held 600 s, last point excluded
      (1L, ts(1, 10, 0), 10L, 1.00),
      (1L, ts(1, 10, 10), 11L, 3.00),
      (1L, ts(1, 10, 20), 12L, 99.0),
      // user 2: both events in the same second -> dur 0 -> NULL
      (2L, ts(2), 20L, 5.00), (2L, ts(2), 21L, 7.00)
    ).toDF("user_id", "ts", "event_id", "value")
    val out = Temporal.timeWeightedAvg(e, col("user_id"), col("ts"),
        col("event_id"), col("value"))
      .as[(Long, Long, Long, Option[Double])].collect()
      .map(r => r._1 -> r).toMap
    assert(out(1L) === ((1L, 2L, 1200L, Some(2.0))))
    assert(out(2L) === ((2L, 1L, 0L, None)))
  }

  test("quantileNormalize: ties share a rank; singleton group is NULL") {
    val e = Seq((1L, "a", 0.10), (2L, "a", 0.20), (3L, "a", 0.20),
      (4L, "a", 0.30), (5L, "b", 9.0))
      .toDF("event_id", "event_type", "value")
    val out = Features.quantileNormalize(e, col("event_type"),
        col("event_id"), col("value"))
      .as[(String, Long, Double, Option[Double])].collect()
      .map(r => r._2 -> r._4).toMap
    assert(out(1L) === Some(0.0))
    assert(out(2L) === Some(1.0 / 3.0))
    assert(out(3L) === Some(1.0 / 3.0))
    assert(out(4L) === Some(1.0))
    assert(out(5L) === None)
  }

  test("seasonalDecompose: weekly spike splits exactly into " +
       "trend/seasonal/residual") {
    // 21 daily points, 8.00 on epoch-day%7==0 else 1.00: every centered
    // 7-frame holds one spike -> trend 2.00 everywhere; seasonal +6.00
    // on the spike weekday, -1.00 elsewhere; residual 0.
    val base = java.time.LocalDate.of(2024, 3, 1)
    val rows = (0 until 21).map { i =>
      val d = base.plusDays(i)
      val v = if (d.toEpochDay % 7 == 0) 8.00 else 1.00
      (i.toLong, java.sql.Timestamp.valueOf(d.atTime(10, 0)), "a", v)
    }
    val e = rows.toDF("event_id", "ts", "event_type", "value")
    val out = Temporal.seasonalDecompose(e, col("event_type"), col("ts"),
        col("value"))
      .select(col("day").cast("string"), col("value"), col("trend"),
        col("seasonal"), col("residual"))
      .as[(String, Double, Double, Double, Double)].collect()
    assert(out.length === 15) // interior days 4..18 of 21
    out.foreach { case (day, v, trend, seasonal, residual) =>
      assert(trend === 2.0, day)
      val spike = java.time.LocalDate.parse(day).toEpochDay % 7 == 0
      assert(seasonal === (if (spike) 6.0 else -1.0), day)
      assert(residual === 0.0, day)
      assert(v === trend + seasonal + residual, day)
    }
  }

  test("streamingHeavyHitters: live count merges equal the batch op") {
    val e = (1 to 60).map(i => (i.toLong, (i % 7).toLong))
      .toDF("event_id", "user_id")
    val scratch = java.nio.file.Files
      .createTempDirectory("hhstream").toString
    val live = graft.streaming.Streaming
      .streamingHeavyHitters(spark, e, scratch, topN = 5)
      .as[(Long, Long, Double)].collect().toSet
    val batch = Profile.heavyHitters(e, col("user_id"), topN = 5)
      .as[(Long, Long, Double)].collect().toSet
    assert(live === batch)
    assert(live.size === 5)
  }
}
