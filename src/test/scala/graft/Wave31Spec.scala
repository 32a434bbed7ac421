package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Profile, Quality, Similarity, TextDedup}

/** Round-8 wave 31: AllPairs prefix-filter join, isotonic (PAV)
  * calibration, split-conformal thresholds, DQ rule suggestion, and
  * the recursive-CTE SQL shape.
  *
  * All five are oracle-verified at every SF; these specs add the
  * independent evidence — plain-Scala brute-force / PAV replays on
  * constructed and seeded-random corpora, and the completeness
  * contrast the AllPairs guarantee is FOR (a pair the df-capped
  * candidate generator provably loses).
  */
class Wave31Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // --- allPairsJaccard --------------------------------------------------

  /** Plain-Scala exact shingle-Jaccard pairs at threshold num/den. */
  private def brutePairs(docs: Seq[(Long, String)], k: Int, num: Int,
                         den: Int): Set[(Long, Long, Double)] = {
    def sh(t: String): Set[String] = {
      val w = t.split(" ")
      if (w.length < k) Set.empty
      else w.sliding(k).map(_.mkString(" ")).toSet
    }
    val sets = docs.map { case (id, t) => id -> sh(t) }
      .filter(_._2.nonEmpty)
    (for {
      (a, sa) <- sets; (b, sb) <- sets if a < b
      inter = (sa & sb).size
      j = inter.toDouble / (sa.size + sb.size - inter)
      if j >= num.toDouble / den // the op's exact double comparison
    } yield (a, b, j)).toSet
  }

  private def apJ(docs: Seq[(Long, String)], k: Int = 3, num: Int = 3,
                  den: Int = 5): Set[(Long, Long, Double)] =
    TextDedup.allPairsJaccard(docs.toDF("doc_id", "text"), k, num, den)
      .as[(Long, Long, Double)].collect().toSet

  test("allPairsJaccard: hand case — near-copies found, distinct docs not") {
    val docs = Seq(
      1L -> "a b c d e f g h",
      2L -> "a b c d e f g x", // 5 of 7 shared 3-shingles with doc 1
      3L -> "p q r s t u v w")
    val got = apJ(docs)
    assert(got.map(p => (p._1, p._2)) === Set((1L, 2L)))
    val j = got.head._3
    assert(math.abs(j - 5.0 / 7.0) < 1e-12) // inter=5, union=6+6-5=7
  }

  test("allPairsJaccard: finds the pair the df-capped generator loses " +
       "(the completeness guarantee, demonstrated)") {
    // docs 1 and 2 are identical; every one of their shingles also
    // appears in 4 filler docs, so EVERY shared shingle has df = 6 and
    // a df cap of 5 drops every posting list — nearDupJaccard(maxDf=5)
    // cannot emit the pair; the prefix filter has no cap and must
    val tpl = "m n o p q r"
    val docs = Seq(1L -> tpl, 2L -> tpl) ++
      (3 to 6).map(i => i.toLong -> s"$tpl z$i y$i x$i w$i v$i u$i t$i s$i")
    val capped = TextDedup.nearDupJaccard(
        docs.toDF("doc_id", "text"), k = 3, threshold = 0.6, maxDf = 5)
      .as[(Long, Long, Double)].collect().toSet
    assert(!capped.exists(p => p._1 == 1L && p._2 == 2L))
    val complete = apJ(docs)
    assert(complete.contains((1L, 2L, 1.0)))
    assert(complete === brutePairs(docs, 3, 3, 5))
  }

  test("allPairsJaccard: equals plain-Scala brute force on seeded " +
       "random corpora (3 seeds, tiny alphabet forces collisions)") {
    for (seed <- Seq(7, 23, 91)) {
      val rnd = new scala.util.Random(seed)
      val docs = (1L to 40L).map { id =>
        val n = 4 + rnd.nextInt(10)
        id -> Seq.fill(n)(('a' + rnd.nextInt(4)).toChar.toString)
          .mkString(" ")
      }
      assert(apJ(docs) === brutePairs(docs, 3, 3, 5),
        s"mismatch at seed $seed")
    }
  }

  // --- isotonicCalibration ----------------------------------------------

  /** Plain-Scala PAV by adjacent pooling over (n, c) bins in
    * confidence order — the textbook algorithm the minimax plan must
    * reproduce.
    */
  private def pavFit(bins: Seq[(Long, Long)]): Seq[Double] = {
    case class Block(n: Long, c: Long, w: Int)
    var st = List.empty[Block]
    for ((n, c) <- bins) {
      var b = Block(n, c, 1)
      while (st.nonEmpty && st.head.c * b.n >= b.c * st.head.n) {
        b = Block(st.head.n + b.n, st.head.c + b.c, st.head.w + b.w)
        st = st.tail
      }
      st = b :: st
    }
    st.reverse.flatMap(b => Seq.fill(b.w)(b.c.toDouble / b.n))
  }

  private def iso(rows: Seq[(Long, Int, Int)]) =
    Similarity.isotonicCalibration(
        rows.toDF("q_id", "n_votes", "correct"), k = 5)
      .orderBy(col("n_votes"))
      .as[(Int, Double, Long, Long, Double, Double)].collect()

  test("isotonicCalibration: violating middle bin pools with its " +
       "neighbor (hand PAV)") {
    // bins by votes: v=3 -> 2/4, v=4 -> 1/4 (violates), v=5 -> 4/4
    // PAV pools v=3,4: 3/8, leaves v=5 at 1.0
    val rows =
      (1 to 4).map(i => (i.toLong, 3, if (i <= 2) 1 else 0)) ++
      (5 to 8).map(i => (i.toLong, 4, if (i == 5) 1 else 0)) ++
      (9 to 12).map(i => (i.toLong, 5, 1))
    val got = iso(rows)
    assert(got.map(_._6).toSeq === Seq(3.0 / 8, 3.0 / 8, 1.0))
    // raw accuracies kept beside the fit
    assert(got.map(_._5).toSeq === Seq(0.5, 0.25, 1.0))
  }

  test("isotonicCalibration: equals plain-Scala PAV and is monotone " +
       "on seeded random bin tables") {
    for (seed <- Seq(3, 17, 44)) {
      val rnd = new scala.util.Random(seed)
      val rows = (1 to 60).map { i =>
        val v = 1 + rnd.nextInt(5)
        (i.toLong, v, if (rnd.nextInt(10) < 2 * v) 1 else 0)
      }
      val got = iso(rows)
      val binned = got.map(r => (r._3, r._4)).toSeq
      val expect = pavFit(binned)
      assert(got.map(_._6).toSeq === expect, s"PAV mismatch at seed $seed")
      assert(got.map(_._6).toSeq.sliding(2).forall(
        s => s.length < 2 || s(0) <= s(1)), s"not monotone at seed $seed")
    }
  }

  // --- conformalThreshold -----------------------------------------------

  private def conf(rows: Seq[(String, Long, Double)], num: Int = 1,
                   den: Int = 10) =
    Profile.conformalThreshold(rows.toDF("g", "rid", "v"),
        group = col("g"), id = col("rid"), value = col("v"),
        alphaNum = num, alphaDen = den)
      .as[(String, Long, Long, Long, Long, Long, Double, Double)]
      .collect().map(r => r._1 -> r).toMap

  test("conformalThreshold: hand case — median, q-hat rank, coverage") {
    // cal (even ids): cents 100,200,300,400,500 -> med 300 (rank 3)
    // scores {0,100,100,200,200}; alpha=2/10 -> k=ceil(6*0.8)=5 -> qhat=200
    // test (odd ids): cents 250,350,600 -> |c-300| = 50,50,300 -> 2 covered
    val rows = Seq(
      ("a", 0L, 1.0), ("a", 2L, 2.0), ("a", 4L, 3.0), ("a", 6L, 4.0),
      ("a", 8L, 5.0), ("a", 1L, 2.5), ("a", 3L, 3.5), ("a", 5L, 6.0))
    val got = conf(rows, num = 2, den = 10)("a")
    assert(got === (("a", 5L, 3L, 300L, 200L, 2L, 2.0 / 3.0, 0.8)))
  }

  test("conformalThreshold: tiny-group cap k <= n_cal engages (the " +
       "whole-line fallback can only lower coverage, never fake it)") {
    // n_cal=2, alpha=1/10: ceil(3*0.9)=3 > 2 -> k capped at 2,
    // qhat = max cal score
    val rows = Seq(("g", 0L, 1.0), ("g", 2L, 3.0),
      ("g", 1L, 2.0), ("g", 3L, 9.0))
    val got = conf(rows)("g")
    // med = lower mid-rank of {100,300} = 100; scores {0,200} -> qhat 200
    assert(got._4 === 100L && got._5 === 200L)
    // test: |200-100|=100 covered, |900-100|=800 not
    assert(got._6 === 1L && math.abs(got._7 - 0.5) < 1e-12)
  }

  test("conformalThreshold: nominal coverage achieved on a seeded " +
       "exchangeable feed (the distribution-free guarantee, measured)") {
    val rnd = new scala.util.Random(11)
    val rows = (0L until 2000L).map(i =>
      ("g", i, math.floor(rnd.nextGaussian() * 100) / 100.0 + 10))
    val got = conf(rows)("g")
    // coverage concentrates near 0.9 at n=1000 per side; 0.85 is ~5 sigma
    assert(got._7 >= 0.85, s"coverage ${got._7} below nominal band")
  }

  // --- dqSuggest ----------------------------------------------------------

  test("dqSuggest: suggested catalog passes rulesReport on the profiled " +
       "feed by construction, and flags match the evidence") {
    val df = Seq(
      (1L, Some(2.0), 10L), (2L, Some(3.5), 10L),
      (3L, None, 11L), (4L, Some(0.5), 12L))
      .toDF("id", "metric", "k")
    val sug = Quality.dqSuggest(df, numericCols = Seq("metric"),
        keyCols = Seq("id", "k"))
      .as[(String, String, String, Option[Double], Long, Boolean, Long)]
      .collect().map(r => r._1 -> r).toMap
    assert(sug("metric_not_null")._5 === 1L) // observed null as tolerance
    assert(sug("metric_min")._4 === Some(0.5))
    assert(sug("metric_max")._4 === Some(3.5))
    assert(sug("metric_positive")._6) // min 0.5 > 0 -> suggested
    assert(sug("id_unique")._6 && sug("id_unique")._5 === 0L)
    assert(!sug("k_unique")._6 && sug("k_unique")._5 === 1L) // one dup
    // the loop closes: enforce the suggested envelope -> all pass
    val rules = Seq(
      Quality.DqRule("metric_not_null", "metric", "not_null",
        maxViolations = sug("metric_not_null")._5),
      Quality.DqRule("metric_min", "metric", "min",
        bound = sug("metric_min")._4.get),
      Quality.DqRule("metric_max", "metric", "max",
        bound = sug("metric_max")._4.get),
      Quality.DqRule("metric_positive", "metric", "positive"))
    val rep = Quality.rulesReport(df, rules)
      .select(col("passed")).as[Boolean].collect()
    assert(rep.forall(identity))
  }

  // --- recursive CTE ------------------------------------------------------

  test("WITH RECURSIVE: fixpoint over a constructed decimal tree " +
       "matches the hand closure") {
    Seq(1L, 10L, 11L, 110L, 1101L).toDF("p_partkey")
      .createOrReplaceTempView("part")
    val got = spark.sql("""WITH RECURSIVE tree AS (
        SELECT p_partkey AS root, p_partkey AS node, 0 AS depth
        FROM part WHERE p_partkey < 10
        UNION ALL
        SELECT t.root, p.p_partkey AS node, t.depth + 1 AS depth
        FROM tree t JOIN part p ON p.p_partkey div 10 = t.node
        WHERE t.depth < 8)
      SELECT root, depth, count(*) AS n_nodes,
        CAST(sum(node) AS BIGINT) AS sum_keys
      FROM tree GROUP BY root, depth""")
      .as[(Long, Int, Long, Long)].collect().toSet
    assert(got === Set(
      (1L, 0, 1L, 1L),          // root
      (1L, 1, 2L, 21L),         // 10, 11
      (1L, 2, 1L, 110L),        // 110 (child of 11)
      (1L, 3, 1L, 1101L)))      // 1101 (child of 110)
  }
}
