package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Profile

/** Round-6 nineteenth wave: the experimentation suite — delta-method
  * ratio CI, deterministic Poisson bootstrap, MDE, stratified effects.
  *
  * Hash-parity fact used throughout: for u <= 999,
  * u * 1000003 < 1000000007, so no mod reduction happens and the arm is
  * simply u's parity (odd -> treatment, even -> control).
  */
class Wave19Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def t(s: String) = java.sql.Timestamp.valueOf(s + " 00:00:00")

  test("ratioMetricCi: exactly proportional units collapse the CI") {
    // y = $1 per denominator unit for every unit -> ratio 1, se 0
    val df = Seq(
      (1L, 1.00, 1L), (1L, 1.00, 1L),
      (2L, 3.00, 3L), (3L, 6.00, 6L))
      .toDF("user_id", "num", "den")
    val r = Profile.ratioMetricCi(df, col("user_id"), col("num"),
        col("den"))
      .as[(Long, Double, Double, Double, Double)].head()
    assert(r === ((3L, 1.0, 0.0, 1.0, 1.0)))
  }

  test("poissonBootstrap: constant metric gives a zero-width CI") {
    // every unit totals $3 -> every replicate mean is exactly 3.0
    val df = (1L to 50L).map(u => (u, 3.00)).toDF("user_id", "value")
    val r = Profile.poissonBootstrap(df, col("user_id"), col("value"))
      .as[(Long, Double, Double, Double)].head()
    assert(r === ((40L, 3.0, 3.0, 3.0)))
  }

  test("poissonBootstrap: weights are the documented hash thresholds") {
    // recompute one replicate's mean by hand from the fixed scheme
    val df = (1L to 20L).map(u => (u, u.toDouble)).toDF("user_id", "value")
    val out = Profile.poissonBootstrap(df, col("user_id"), col("value"))
      .as[(Long, Double, Double, Double)].head()
    def wOf(u: Long, b: Long): Long = {
      val h = ((u * 131 + b) * 1000003L) % 1000000007L
      if (h < 367879444L) 0L else if (h < 735758887L) 1L
      else if (h < 919698609L) 2L else 3L
    }
    val means = (0L until 40L).flatMap { b =>
      val ws = (1L to 20L).map(u => (wOf(u, b), u * 100L))
      val nw = ws.map(_._1).sum
      if (nw == 0) None
      else Some(ws.map { case (w, c) => w * c }.sum.toDouble / nw / 100.0)
    }.sorted
    val lo = BigDecimal(means(1))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val hi = BigDecimal(means(38))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out._1 === 40L)
    assert(out._3 === lo)
    assert(out._4 === hi)
  }

  test("powerMde: matches the closed form on four units") {
    // units 1..4 (odd=treatment, even=control), totals $1..$4
    val df = Seq((1L, 1.00), (2L, 2.00), (3L, 3.00), (4L, 4.00))
      .toDF("user_id", "value")
    val r = Profile.powerMde(df, col("user_id"), col("value"))
      .as[(Long, Long, Double, Double, Double)].head()
    val vp = 50000.0 / 3.0 / 10000.0 // cents moments -> dollars^2
    val mde = 2.801585 * math.sqrt(vp / 2 + vp / 2)
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r._1 === 2L && r._2 === 2L)
    assert(r._3 === r6(math.sqrt(vp)))
    assert(r._4 === r6(mde))
    assert(r._5 === r6(mde / 2.5))
  }

  test("propensityStrata: constant per-arm outcomes give diff 5 in " +
       "every stratum") {
    // 20 units, pre x = $u (so strata are u-ranges of 4), post y = $10
    // for odd (treatment), $5 for even (control)
    val rows = (1L to 20L).flatMap { u =>
      Seq((u, t("2024-01-05"), u.toDouble),
        (u, t("2024-01-20"), if (u % 2 == 1) 10.00 else 5.00))
    }
    val df = rows.toDF("user_id", "ts", "value")
    val out = Profile.propensityStrata(df, col("user_id"), col("ts"),
        col("value"), "2024-01-16")
      .as[(Long, Long, Long, Long, Option[Double], Option[Double],
        Option[Double])].collect().sortBy(_._1)
    assert(out.map(_._1).toSeq === (0L to 4L))
    assert(out.forall(s => s._2 === 4L && s._3 === 2L && s._4 === 2L))
    assert(out.forall(s => s._5 === Some(5.0) && s._6 === Some(10.0)
      && s._7 === Some(5.0)))
  }

  test("propensityStrata: a single-arm stratum reports NULL, not a crash") {
    // two units, both odd -> both treatment; one stratum per unit
    val rows = Seq(
      (1L, t("2024-01-05"), 1.00), (1L, t("2024-01-20"), 2.00),
      (3L, t("2024-01-05"), 9.00), (3L, t("2024-01-20"), 4.00))
    val df = rows.toDF("user_id", "ts", "value")
    val out = Profile.propensityStrata(df, col("user_id"), col("ts"),
        col("value"), "2024-01-16", strata = 2)
      .as[(Long, Long, Long, Long, Option[Double], Option[Double],
        Option[Double])].collect()
    assert(out.forall(s => s._3 === 0L && s._5 === None && s._7 === None))
  }
}
