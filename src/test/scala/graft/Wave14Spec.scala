package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Profile, Relational, Similarity, Temporal}

/** Round-6 fourteenth wave: OLS trend, Benford audit, Gini
  * concentration, RFM segmentation, kNN label classification.
  */
class Wave14Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(day: Int, h: Int = 10) =
    java.sql.Timestamp.valueOf(f"2024-03-$day%02d $h%02d:00:00")

  test("olsTrend: exact fit on a linear daily series; single-day group " +
       "emits NULL coefficients") {
    // type a: daily totals 100, 200, 300 cents on days 0,1,2 -> slope
    // 100 cents/day, intercept 100 at the first day. type b: one day.
    val e = Seq(
      (1L, ts(1), "a", 1.00), (2L, ts(2), "a", 2.00), (3L, ts(3), "a", 3.00),
      (4L, ts(5), "b", 9.00)
    ).toDF("event_id", "ts", "event_type", "value")
    val out = Profile.olsTrend(e, col("event_type"), col("ts"), col("value"))
      .select(col("g"), col("first_day").cast("string"), col("n_days"),
        col("slope"), col("intercept"))
      .as[(String, String, Long, Option[Double], Option[Double])]
      .collect().map(r => r._1 -> r).toMap
    assert(out("a") === (("a", "2024-03-01", 3L, Some(100.0), Some(100.0))))
    assert(out("b") === (("b", "2024-03-05", 1L, None, None)))
  }

  test("benfordDigits: exact counts, rounded expectation, fixed-shape chi2") {
    // leading digits of cents: 1.00->100 (1), 25.00->2500 (2), 1.50->150
    // (1), 9.99->999 (9)
    val df = Seq(1.00, 25.00, 1.50, 9.99).toDF("v")
    val out = Profile.benfordDigits(df, col("v"))
      .as[(Int, Long, Double, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(out(1)._2 === 2L && out(2)._2 === 1L && out(9)._2 === 1L)
    assert(out(1)._3 === 0.5)
    assert(out(1)._4 === 0.30103) // round(log10(2), 6)
    // chi2 component from the ROUNDED constant: exp = 0.30103*4
    val exp1 = 0.30103 * 4
    assert(out(1)._5 ===
      BigDecimal((2.0 - exp1) * (2.0 - exp1) / exp1)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("giniConcentration: equal spends -> 0; known 2-customer split; " +
       "integer top-decile tail") {
    val orders = Seq(
      (1L, 101L, 1.00), (2L, 102L, 3.00), // nation A: 100 vs 300 cents
      (3L, 201L, 2.00), (4L, 202L, 2.00)  // nation B: equal
    ).toDF("o_orderkey", "o_custkey", "o_totalprice")
    val customer = Seq((101L, 0), (102L, 0), (201L, 1), (202L, 1))
      .toDF("c_custkey", "c_nationkey")
    val nation = Seq((0, "A"), (1, "B")).toDF("n_nationkey", "n_name")
    val out = Relational.giniConcentration(orders, customer, nation)
      .as[(String, Long, Double, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    // A: ranks (100)=1,(300)=2; num=2*(100+600)-3*400=200; den=800
    assert(out("A") === (("A", 2L, 400.0, 0.25, 0.0)))
    // B: perfectly equal -> gini 0; n//10=0 -> empty decile tail
    assert(out("B") === (("B", 2L, 400.0, 0.0, 0.0)))
  }

  test("rfmSegments: quartile scores rank best = 4 on every axis") {
    // 4 customers, strictly ordered on each metric; customer 4 is the
    // best on all three -> segment "444", customer 1 the worst -> "111"
    val orders = (1 to 4).flatMap { c =>
      (1 to c).map(i => (c * 10L + i, c.toLong, c * 100.0, ts(c * 2)))
    }.toDF("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate")
    val out = Temporal.rfmSegments(orders)
      .select(col("o_custkey"), col("recency_days"), col("frequency"),
        col("monetary"), col("segment"))
      .as[(Long, Int, Long, Double, String)].collect()
      .map(r => r._1 -> r).toMap
    assert(out(4L) === ((4L, 0, 4L, 1600.0, "444")))
    assert(out(1L) === ((1L, 6, 1L, 100.0, "111")))
    assert(out(2L)._5 === "222" && out(3L)._5 === "333")
  }

  test("knnClassify: majority label wins; vote ties go to the smaller " +
       "label; probes are the sampleMod slice") {
    // probe 0 (id % 25 == 0). cosine order from (1,0): id1 > id3 > id2.
    // k=3 -> labels {7,5,7}: majority 7. True label 5 -> wrong.
    val e = Seq(
      (0L, Array(1f, 0f), 5),
      (1L, Array(1f, 0.1f), 7),
      (2L, Array(1f, 0.5f), 7),
      (3L, Array(1f, 0.3f), 5),
      (4L, Array(-1f, 0f), 9) // far away, outside k
    ).toDF("vec_id", "embedding", "label")
    val out = Similarity.knnClassify(e, sampleMod = 25, k = 3)
      .as[(Long, Int, Int, Long, Int)].collect()
    assert(out.toSeq === Seq((0L, 5, 7, 2L, 0)))
    // tie case: k=2 -> one vote each for 7 and 5 -> smaller label 5 wins
    val tie = Similarity.knnClassify(e, sampleMod = 25, k = 2)
      .as[(Long, Int, Int, Long, Int)].collect()
    assert(tie.toSeq === Seq((0L, 5, 5, 1L, 1)))
  }
}
