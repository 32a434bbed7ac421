package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Relational, Similarity, Temporal}

/** Round-6 thirteenth wave: cohort LTV, similarity calibration
  * histogram, survivorship golden record.
  */
class Wave13Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(day: Int, h: Int = 10) =
    java.sql.Timestamp.valueOf(f"2024-03-$day%02d $h%02d:00:00")

  test("cohortLtv: exact cents, running totals, ltv = cum / cohort size") {
    // 2024-03-04 is a Monday. Users 1,2 first seen that week (cohort
    // 03-04); user 1 buys 10.00 in week 0 and 2.50 in week 1; user 2
    // never buys but stays active in week 1.
    val e = Seq(
      (1L, ts(4), "purchase", 10.0),
      (2L, ts(5), "view", 0.0),
      (1L, ts(11), "purchase", 2.50),
      (2L, ts(12), "view", 0.0)
    ).toDF("user_id", "ts", "event_type", "value")
    val out = Temporal.cohortLtv(e, col("user_id"), col("ts"),
        col("event_type"), col("value"))
      .as[(java.sql.Date, Int, Long, Long, Double, Double, Double)]
      .collect().map(r => r._2 -> r).toMap
    val w0 = out(0); val w1 = out(1)
    assert(w0._1.toString === "2024-03-04" && w0._3 === 2L)
    assert((w0._4, w0._5, w0._6, w0._7) === ((2L, 10.0, 10.0, 5.0)))
    assert((w1._4, w1._5, w1._6, w1._7) === ((2L, 2.50, 12.50, 6.25)))
  }

  test("similarityHistogram: known cosines land in the right buckets; " +
       "probes are the sampleMod key-space slice") {
    // ids 0,20 are probes (mod 20). Pairs counted once with a < b.
    val e = Seq(
      (0L, Array(1f, 0f)),   // probe
      (20L, Array(0f, 1f)),  // probe; cos(0,20) = 0
      (21L, Array(1f, 0f)),  // cos(0,21)=1 -> bucket 10; cos(20,21)=0
      (3L, Array(-1f, 0f))   // NOT a probe and id < both probes: the
                             // (3,20)/(3,21) pairs need a probe FIRST —
                             // a<b keeps only probe-led pairs (0|20) < b
    ).toDF("vec_id", "embedding")
    val out = Similarity.similarityHistogram(e, sampleMod = 20, halfBins = 10)
      .as[(Long, Double, Long, Double)].collect()
      .map(r => r._1 -> r).toMap
    // pairs: (0,20) cos 0 -> b0; (0,21) cos 1 -> b10; (0,3) cos -1 -> b-10;
    // (20,21) cos 0 -> b0. 4 pairs total.
    assert(out(0L) === ((0L, 0.0, 2L, 0.5)))
    assert(out(10L) === ((10L, 1.0, 1L, 0.25)))
    assert(out(-10L) === ((-10L, -1.0, 1L, 0.25)))
    assert(out.values.map(_._3).sum === 4L)
  }

  test("goldenRecord: recency-wins fields, exact lifetime spend, extrema") {
    val o = Seq(
      (1L, 100L, "O", 50.00, ts(1), "3-MEDIUM"),
      (1L, 200L, "F", 10.00, ts(5), "1-URGENT"), // latest by date
      (2L, 300L, "P", 99.99, ts(2), "2-HIGH")
    ).toDF("o_custkey", "o_orderkey", "o_orderstatus", "o_totalprice",
      "o_orderdate", "o_orderpriority")
    val out = Relational.goldenRecord(o)
      .as[(Long, String, String, java.sql.Date, Double, Double, Long)]
      .collect().map(r => r._1 -> r).toMap
    assert(out(1L) === ((1L, "F", "1-URGENT", java.sql.Date.valueOf("2024-03-01"),
      50.00, 60.00, 2L)))
    assert(out(2L) === ((2L, "P", "2-HIGH", java.sql.Date.valueOf("2024-03-02"),
      99.99, 99.99, 1L)))
  }
}
