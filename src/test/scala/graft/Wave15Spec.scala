package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Assoc, Features, Profile}

/** Round-6 fifteenth wave: winsorized stats, correlation matrix, market
  * basket rules, lag features, leave-one-out target encoding.
  */
class Wave15Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(day: Int, h: Int = 10) =
    java.sql.Timestamp.valueOf(f"2024-03-$day%02d $h%02d:00:00")

  test("winsorizedStats: integer-rank cuts clamp the outlier; exact means") {
    // 1..19 dollars plus a 1000-dollar outlier: k05 = ceil(0.05*20) = 1
    // -> p05 = 100 cents; k95 = 19 -> p95 = 1900; outlier clamps to 1900
    val df = ((1 to 19).map(_.toDouble) :+ 1000.0).map(("A", _))
      .toDF("g", "v")
    val out = Profile.winsorizedStats(df, col("g"), col("v"))
      .as[(String, Long, Long, Long, Double, Double)].collect()
    assert(out.toSeq === Seq(("A", 20L, 100L, 1900L, 59.5, 10.45)))
  }

  test("corrMatrix: exact +1/-1 on linear pairs, one row per pair") {
    val df = Seq((1.0, 2.0, -1.0), (2.0, 4.0, -2.0), (3.0, 6.0, -3.0))
      .toDF("x", "y", "z")
    val out = Profile.corrMatrix(df,
        Seq("a" -> col("x"), "b" -> col("y"), "c" -> col("z")))
      .as[(String, Double, Long)].collect().map(r => r._1 -> r).toMap
    assert(out("a_b") === (("a_b", 1.0, 3L)))
    assert(out("a_c") === (("a_c", -1.0, 3L)))
    assert(out("b_c") === (("b_c", -1.0, 3L)))
    assert(out.size === 3)
  }

  test("marketBasket: directional support/confidence/lift by hand") {
    // baskets: 1{A,B} 2{A,B} 3{A,C}; only (A,B) reaches support 2
    val df = Seq((1L, "A"), (1L, "B"), (2L, "A"), (2L, "B"), (3L, "A"),
      (3L, "C")).toDF("b", "i")
    val out = Assoc.marketBasket(df, col("b"), col("i"), minSupport = 2)
      .select(col("item_a"), col("item_b"), col("n_ab"), col("support"),
        col("confidence"), col("lift"))
      .as[(String, String, Long, Double, Double, Double)].collect()
      .map(r => (r._1, r._2) -> r).toMap
    assert(out(("A", "B")) === (("A", "B", 2L, 2.0 / 3.0, 2.0 / 3.0, 1.0)))
    assert(out(("B", "A")) === (("B", "A", 2L, 2.0 / 3.0, 1.0, 1.0)))
    assert(out.size === 2)
  }

  test("lagFeatures: lag/delta/rolling ride one (ts, id) order") {
    val e = Seq(
      (1L, ts(1), 10L, 1.00), (1L, ts(2), 11L, 3.00), (1L, ts(3), 12L, 2.00),
      (2L, ts(1), 20L, 5.00)
    ).toDF("user_id", "ts", "event_id", "value")
    val out = Features.lagFeatures(e, col("user_id"), col("ts"),
        col("event_id"), col("value"))
      .select(col("id"), col("lag1_value"), col("delta_cents"),
        col("rolling3_sum_cents"), col("rolling3_mean"))
      .as[(Long, Option[Double], Option[Long], Long, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(out(10L) === ((10L, None, None, 100L, 1.0)))
    assert(out(11L) === ((11L, Some(1.0), Some(200L), 400L, 2.0)))
    assert(out(12L) === ((12L, Some(3.0), Some(-100L), 600L, 2.0)))
    assert(out(20L) === ((20L, None, None, 500L, 5.0)))
  }

  test("targetEncode: own row excluded; singleton category is NULL") {
    val e = Seq((1L, "a", 1.00), (2L, "a", 2.00), (3L, "a", 3.00),
      (4L, "b", 9.00)).toDF("event_id", "event_type", "value")
    val out = Features.targetEncode(e, col("event_type"), col("event_id"),
        col("value"))
      .as[(Long, String, Double, Option[Double])].collect()
      .map(r => r._1 -> r._4).toMap
    assert(out(1L) === Some(2.5)) // (2+3)/2
    assert(out(2L) === Some(2.0)) // (1+3)/2
    assert(out(3L) === Some(1.5))
    assert(out(4L) === None)
  }
}
