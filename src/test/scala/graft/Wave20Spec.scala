package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Profile, Text}

/** Round-6 twentieth wave: Kneser-Ney smoothing, KMV set sketches,
  * exact weighted percentiles.
  */
class Wave20Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("kneserNeyLm: hand-computed probabilities; context mass sums to 1") {
    // bigrams: (a,b) x2, (a,c) x1 -> c_a=3, t_a=2, cont_b=cont_c=1, T=2
    // p(b|a) = 5/12 + 6/24 = 2/3 ; p(c|a) = 1/12 + 6/24 = 1/3
    val docs = Seq((1L, "a b"), (2L, "a b"), (3L, "a c"))
      .toDF("doc_id", "text")
    val out = Text.kneserNeyLm(docs, topN = 10)
      .as[(String, String, Long, Long, Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r).toMap
    assert(out(("a", "b"))._7 === 0.666667)
    assert(out(("a", "c"))._7 === 0.333333)
    assert(out.values.forall(r => r._4 === 3L && r._5 === 2L))
    // interpolated KN is a proper distribution over seen continuations
    // plus backoff mass -- here all continuations are seen, so sum = 1
    assert(math.abs(out.values.map(_._7).sum - 1.0) < 1e-5)
  }

  test("kmvSketch: sub-k groups give exact counts and intersections") {
    // g1 = users 1..10, g2 = users 6..15: overlap 5, union 15 -- all
    // below k=64 so every estimate is exact
    val rows = (1L to 10L).map(u => ("g1", u)) ++
      (6L to 15L).map(u => ("g2", u))
    val df = rows.toDF("g", "u")
    val r = Profile.kmvSketch(df, col("g"), col("u"))
      .as[(String, String, Long, Double, Double, Double, Double)].head()
    assert(r === (("g1", "g2", 5L, 10.0, 10.0, 15.0, 5.0)))
  }

  test("kmvSketch: over-k estimate matches the (k-1)*M/h_k closed form") {
    val df = ((1L to 1000L).map(u => ("big", u)) ++
      (1L to 5L).map(u => ("small", u))).toDF("g", "u")
    val r = Profile.kmvSketch(df, col("g"), col("u"))
      .as[(String, String, Long, Double, Double, Double, Double)].head()
    val hashes = (1L to 1000L).map(u => (u * 1000003L) % 1000000007L)
      .sorted
    val h64 = hashes(63)
    val expected = BigDecimal(63.0 * 1000000007.0 / h64)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r._1 === "big" && r._2 === "small")
    assert(r._4 === expected)
    assert(r._5 === 5.0) // sub-k side stays exact
    // a 64-min sketch of 1000 uniform draws should land near the truth
    assert(expected > 700 && expected < 1400)
  }

  test("weightedQuantiles: cumulative-weight thresholds, not row ranks") {
    val df = Seq(("x", 1.00, 1L), ("x", 2.00, 2L), ("x", 3.00, 1L))
      .toDF("g", "v", "w")
    val r = Profile.weightedQuantiles(df, col("g"), col("v"), col("w"))
      .as[(String, Long, Double, Double, Double)].head()
    assert(r === (("x", 4L, 1.0, 2.0, 2.0)))
  }

  test("weightedQuantiles: duplicate values pre-merge their weights") {
    // two rows of the same value must act as one value with weight 5
    val df = Seq(("y", 2.00, 2L), ("y", 2.00, 3L), ("y", 9.00, 1L))
      .toDF("g", "v", "w")
    val r = Profile.weightedQuantiles(df, col("g"), col("v"), col("w"))
      .as[(String, Long, Double, Double, Double)].head()
    assert(r === (("y", 6L, 2.0, 2.0, 2.0)))
  }
}
