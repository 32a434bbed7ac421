package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Eval, Profile}

/** Round-8 wave 30: Mann-Whitney U, Spearman's rho, ROUGE-N.
  *
  * All three are oracle-verified at every SF; these specs add the
  * independent evidence — hand-derived expectations and a plain-Scala
  * BigInt replay of the U decision on constructed inputs.
  */
class Wave30Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // --- mannWhitney -----------------------------------------------------

  private def mw(rows: Seq[(Int, Double)]) =
    Profile.mannWhitney(rows.toDF("s", "value"), side = col("s"),
        value = col("value"))
      .as[(Long, Long, Long, Double, Boolean)].collect().head

  test("mannWhitney: hand-computed half-tie case (A={1,2}, B={2,3,3} " +
       "cents -> 2U=1, r=-5/6, keep)") {
    val got = mw(Seq((0, 0.01), (0, 0.02), (1, 0.02), (1, 0.03), (1, 0.03)))
    // U_A: a=1 beats nothing; a=2 half-ties the one b=2 -> U_A = 0.5
    assert(got._1 === 2L && got._2 === 3L && got._3 === 1L)
    assert(math.abs(got._4 - (-5.0 / 6.0)) < 1e-12)
    // z^2 = 3*25*20/648 = 2.31 < 3.8416
    assert(!got._5)
  }

  test("mannWhitney: complete separation rejects (z^2 = 3*na*nb/(n+1))") {
    // A strictly below B: U_A = 0, z^2 = 3*5*5/11 = 6.8 > 3.8416
    val rows = (1 to 5).map(c => (0, c / 100.0)) ++
      (11 to 15).map(c => (1, c / 100.0))
    val got = mw(rows)
    assert(got._3 === 0L && got._5)
  }

  test("mannWhitney: identical distributions give D=0 and keep") {
    val rows = Seq(1, 2, 3).flatMap(c => Seq((0, c / 100.0), (1, c / 100.0)))
    val got = mw(rows)
    // D = 2U - na*nb = 0 exactly under full symmetry
    assert(got._3 === got._1 * got._2 && !got._5)
    assert(got._4 === 0.0)
  }

  test("mannWhitney: BigInt replay of 2U, ties, and the z^2 decision " +
       "on a 30-row constructed feed") {
    val vals = (0 until 30).map(i => (i % 2, ((i * 7 + 3) % 11) / 100.0))
    val a = vals.filter(_._1 == 0).map(v => math.round(v._2 * 100))
    val b = vals.filter(_._1 == 1).map(v => math.round(v._2 * 100))
    val u2 = a.map(x => 2L * b.count(_ < x) + b.count(_ == x)).sum
    val all = a ++ b
    val ties = all.groupBy(identity).values
      .map(g => BigInt(g.size).pow(3) - g.size).sum
    val na = BigInt(a.size); val nb = BigInt(b.size); val n = na + nb
    val d = BigInt(u2) - na * nb
    val lhs = BigInt(1875) * d * d * n * (n - 1)
    val rhs = BigInt(2401) * na * nb * (n.pow(3) - n - ties)
    val got = mw(vals)
    assert(got._3 === u2)
    assert(got._5 === (lhs > rhs))
  }

  // --- spearmanRho -----------------------------------------------------

  private def ranks(rows: Seq[(Long, Int)]) = rows.toDF("id", "rank")

  test("spearmanRho: identity is +1, full reversal is -1") {
    val a = ranks(Seq((1L, 1), (2L, 2), (3L, 3), (4L, 4)))
    val same = Eval.spearmanRho(a, a)
      .as[(Long, Long, Double)].collect().head
    assert(same === ((4L, 0L, 1.0)))
    val rev = ranks(Seq((1L, 4), (2L, 3), (3L, 2), (4L, 1)))
    val got = Eval.spearmanRho(a, rev).as[(Long, Long, Double)]
      .collect().head
    // d^2 = 9+1+1+9 = 20; rho = 1 - 120/(4*15) = -1
    assert(got === ((4L, 20L, -1.0)))
  }

  test("spearmanRho: non-contiguous ranks are densely re-ranked within " +
       "the common subset first") {
    // Common ids {1, 5}; raw ranks leave gaps (2 vs 7, 9 vs 3): without
    // the re-rank d^2 would be 49+16, not the permutation value 2.
    val a = ranks(Seq((1L, 2), (5L, 7), (9L, 1)))
    val b = ranks(Seq((1L, 9), (5L, 3), (8L, 1)))
    val got = Eval.spearmanRho(a, b).as[(Long, Long, Double)]
      .collect().head
    assert(got === ((2L, 2L, -1.0)))
  }

  test("spearmanRho vs kendallTau: a single far-displaced item drops " +
       "rho below tau") {
    // Move the top item to the bottom of an otherwise-identical list:
    // rho penalizes the distance, tau only counts the n-1 inversions.
    val n = 10
    val a = ranks((1 to n).map(i => (i.toLong, i)))
    val moved = ranks((1 to n).map(i =>
      if (i == 1) (1L, n) else (i.toLong, i - 1)))
    val rho = Eval.spearmanRho(a, moved).as[(Long, Long, Double)]
      .collect().head._3
    val tau = Eval.kendallTau(a, moved)
      .select(col("tau")).as[Double].collect().head
    assert(rho < tau)
  }

  // --- rougeN ----------------------------------------------------------

  private def docs(rows: Seq[(Long, String)]) =
    rows.map { case (id, t) => (id, t, "en", "s", 0L) }
      .toDF("doc_id", "text", "lang", "source", "ingest_ts")

  test("rougeN: clipped bigram overlap with multiplicity (hand case)") {
    // cand bigrams: ab,bc,ca,ab  ref: ab,bx,xa,ab -> clipped overlap 2
    val got = Eval.rougeN(docs(Seq(
        (0L, "a b c a b"), (1L, "a b x a b"))), n = 2)
      .as[(Long, Long, Long, Long, Double)].collect().head
    assert(got === ((0L, 4L, 4L, 2L, 0.5)))
  }

  test("rougeN: pairs missing a side (or with < n words on it) drop") {
    val out = Eval.rougeN(docs(Seq(
        (0L, "a b c"), (1L, "a b c"),
        (2L, "a b c"),               // no doc 3: pair 1 drops
        (4L, "only"), (5L, "a b"))), // cand side has < 2 words: drops
      n = 2).as[(Long, Long, Long, Long, Double)].collect()
    assert(out.map(_._1).toSet === Set(0L))
    assert(out.head === ((0L, 2L, 2L, 2L, 1.0)))
  }

  test("rougeN: disjoint texts score 0.0") {
    val got = Eval.rougeN(docs(Seq(
        (0L, "a b c d"), (1L, "x y z w"))), n = 2)
      .as[(Long, Long, Long, Long, Double)].collect().head
    assert(got === ((0L, 3L, 3L, 0L, 0.0)))
  }

  // --- theilSen --------------------------------------------------------

  private def series(rows: Seq[(String, Int, Double)]) = {
    import java.sql.Timestamp
    rows.map { case (g, day, v) =>
      (g, new Timestamp(day * 86400000L), v) }.toDF("g", "ts", "value")
  }

  private def ts(rows: Seq[(String, Int, Double)]) =
    Profile.theilSen(series(rows), group = col("g"), ts = col("ts"),
        value = col("value"))
      .as[(String, Long, Long, Option[Double])].collect()
      .map(r => r._1 -> r).toMap

  test("theilSen: hand-computed median of three pairwise slopes") {
    // y = 0, 100, 400 cents -> slopes 100, 200, 300; median 200
    val got = ts(Seq(("a", 0, 0.0), ("a", 1, 1.0), ("a", 2, 4.0)))("a")
    assert(got === (("a", 3L, 3L, Some(200.0))))
  }

  test("theilSen: lower mid-rank median with (key, den, num) tiebreak " +
       "on an even pair count") {
    // y = 0,100,300,600 -> slope keys 100,150,200,200,250,300; the
    // 3rd of 6 is the first 200 (den=1 sorts before den=3)
    val got = ts(Seq(("a", 0, 0.0), ("a", 1, 1.0), ("a", 2, 3.0),
      ("a", 3, 6.0)))("a")
    assert(got === (("a", 4L, 6L, Some(200.0))))
  }

  test("theilSen: one wild day cannot move the median slope (the 29% " +
       "breakdown contrast with OLS)") {
    // wild day at the ENDPOINT (max |x - mean x|): a center outlier
    // has zero OLS leverage and would make the contrast vacuous
    val rows = (0 to 8).map(d =>
      ("a", d, if (d == 8) 10000.0 else d * 1.0))
    assert(ts(rows)("a")._4 === Some(100.0))
    val ols = Profile.olsTrend(series(rows), group = col("g"),
        ts = col("ts"), value = col("value"))
      .select(col("slope")).as[Double].collect().head
    assert(math.abs(ols - 100.0) > 50.0) // OLS dragged far off by one day
  }

  test("theilSen: single-day group emits NULL slope and zero pairs") {
    val got = ts(Seq(("solo", 3, 7.0)))("solo")
    assert(got === (("solo", 1L, 0L, None)))
  }

  // --- maintainJoin ----------------------------------------------------

  test("maintainJoinTicks: delta-rule view equals the one-shot join, " +
       "including a dimension row arriving AFTER its fact matches") {
    import graft.ops.Changelog
    val a = Seq((1L, "o1", 0), (1L, "o2", 1), (2L, "o3", 0))
      .toDF("k", "oid", "at")
    val b = Seq((1L, "late-dim", 2), (2L, "early-dim", 0))
      .toDF("k", "payload", "bt")
    val got = Changelog.maintainJoinTicks(
        a.select(col("k"), col("oid"), col("at")),
        b.select(col("k"), col("payload"), col("bt")),
        Seq("k"), aTick = col("at"), bTick = col("bt"), ticks = 3)
      .select(col("k"), col("oid"), col("payload"))
      .as[(Long, String, String)].collect().toSet
    // k=1's dim row arrives at tick 2; o1 (tick 0) and o2 (tick 1)
    // must still pair with it through the A_old JOIN dB term
    assert(got === Set((1L, "o1", "late-dim"), (1L, "o2", "late-dim"),
      (2L, "o3", "early-dim")))
    val batch = a.join(b, "k").select(col("k"), col("oid"), col("payload"))
      .as[(Long, String, String)].collect().toSet
    assert(got === batch)
  }
}
