package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Features, Profile, Similarity, Temporal}

/** Round-6 sixteenth wave: negative sampling, histogram quantile
  * sketch, sequence trigrams, churn labels, robust scaling.
  */
class Wave16Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(day: Int, h: Int = 10) =
    java.sql.Timestamp.valueOf(f"2024-03-$day%02d $h%02d:00:00")

  test("negativeSampling: hash-deterministic candidates; accidental " +
       "positives dropped") {
    // user 1 positives {1, 6}; item domain 1..10. For BOTH positives the
    // candidate set is {6, 9, 2, 5} (j = 0..3) and 6 is a true positive
    // -> dropped, 3 negatives survive per positive.
    val inter = Seq((1L, 1L), (1L, 6L)).toDF("u", "p")
    val items = (1L to 10L).toDF("p_partkey")
    val out = Features.negativeSampling(inter, col("u"), col("p"),
        items, col("p_partkey"), k = 4)
      .as[(Long, Long, Long, Long)].collect()
    val byPos = out.groupBy(_._2).view.mapValues(_.map(_._4).toSet).toMap
    assert(byPos(1L) === Set(9L, 2L, 5L))
    assert(byPos(6L) === Set(9L, 2L, 5L))
    assert(out.length === 6)
  }

  test("histogramQuantiles: bucket-edge estimate brackets the exact " +
       "rank-selected truth") {
    // 1..100 dollars, $10 buckets: true p50 = 5000c, p95 = 9500c;
    // cum(5) = 59 >= 50 -> est p50 = 6000c; cum(9) = 99 >= 95 -> 10000c
    val df = (1 to 100).map(d => ("A", d.toDouble)).toDF("g", "v")
    val out = Profile.histogramQuantiles(df, col("g"), col("v"),
        bucketCents = 1000L)
      .as[(String, Long, Long, Long, Long, Long)].collect()
    assert(out.toSeq === Seq(("A", 100L, 5000L, 6000L, 9500L, 10000L)))
  }

  test("sequenceNgrams: sliding trigrams over the (ts, id) order") {
    val e = Seq(
      (1L, ts(1), 10L, "a"), (1L, ts(2), 11L, "b"), (1L, ts(3), 12L, "c"),
      (1L, ts(4), 13L, "b"), (1L, ts(5), 14L, "c")
    ).toDF("user_id", "ts", "event_id", "event_type")
    val out = Temporal.sequenceNgrams(e, col("user_id"), col("ts"),
        col("event_id"), col("event_type"), minCount = 1)
      .as[(String, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(out("a>b>c") === (("a>b>c", 1L, 1L)))
    assert(out("b>c>b") === (("b>c>b", 1L, 1L)))
    assert(out("c>b>c") === (("c>b>c", 1L, 1L)))
    assert(out.size === 3)
  }

  test("churnLabel: w1-active users labeled by w2 silence; others excluded") {
    // max day = 20: w1 = days 7..13, w2 = days 14..20
    val e = Seq(
      (1L, ts(10)), (1L, ts(18)),          // active both -> churned 0
      (2L, ts(8)), (2L, ts(9)),            // silent in w2 -> churned 1
      (3L, ts(20)),                        // w2 only -> excluded
      (4L, ts(1))                          // before the slice -> excluded
    ).toDF("user_id", "ts")
    val out = Temporal.churnLabel(e, col("user_id"), col("ts"))
      .as[(Long, Long, Long, Int)].collect().map(r => r._1 -> r).toMap
    assert(out(1L) === ((1L, 1L, 1L, 0)))
    assert(out(2L) === ((2L, 2L, 0L, 1)))
    assert(out.size === 2)
  }

  test("robustScale: discrete-rank quartiles; IQR-zero dim is NULL") {
    // dim 0: [1,2,3,100] -> q1=1, med=2, q3=3, IQR=2; dim 1: constant
    val e = Seq(
      (1L, Array(1f, 7f)), (2L, Array(2f, 7f)),
      (3L, Array(3f, 7f)), (4L, Array(100f, 7f))
    ).toDF("vec_id", "embedding")
    val out = Similarity.robustScale(e)
      .as[(Long, Int, Double, Option[Double])].collect()
      .map(r => (r._1, r._2) -> r._4).toMap
    assert(out((1L, 0)) === Some(-0.5))
    assert(out((2L, 0)) === Some(0.0))
    assert(out((3L, 0)) === Some(0.5))
    assert(out((4L, 0)) === Some(49.0))
    assert((1L to 4L).forall(v => out((v, 1)).isEmpty))
  }
}
