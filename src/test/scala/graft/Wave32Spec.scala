package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Linkage, Shard}

/** Round-8 wave 32: purged k-fold temporal CV and Fellegi-Sunter
  * linkage. (streaming_conformal's evidence is its oracle: the
  * closed-feed readout hash-equals batch conformal_threshold at all
  * three SFs — the maintainer shares the literal statistic stage.)
  */
class Wave32Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // --- purgedKfold -------------------------------------------------------

  private def pk(days: Seq[(Int, Int)], k: Int, embargo: Int) = {
    import java.sql.Timestamp
    val rows = days.flatMap { case (d, n) =>
      Seq.fill(n)(new Timestamp(d * 86400000L)) }
    Shard.purgedKfold(rows.toDF("ts"), ts = col("ts"), k = k,
        embargoDays = embargo)
      .orderBy(col("fold"))
      .as[(Long, Int, Int, Long, Long, Long)].collect()
  }

  test("purgedKfold: hand case — 10 days, 2 folds, 1-day embargo") {
    val got = pk((0 until 10).map((_, 1)), k = 2, embargo = 1)
    // fold 0 = days 0-4; embargo adds day 5 -> purged 1, train 4
    assert(got(0) === ((0L, 0, 4, 5L, 1L, 4L)))
    // fold 1 = days 5-9; embargo adds day 4 -> purged 1, train 4
    assert(got(1) === ((1L, 5, 9, 5L, 1L, 4L)))
  }

  test("purgedKfold: embargo wider than the gap purges everything " +
       "between folds; partition identity holds on seeded data") {
    val rnd = new scala.util.Random(5)
    val days = (0 until 37).map(d => (d, 1 + rnd.nextInt(20)))
    val total = days.map(_._2.toLong).sum
    for ((k, e) <- Seq((5, 3), (2, 40), (3, 0))) {
      val got = pk(days, k, e)
      assert(got.length === k)
      for (r <- got) {
        assert(r._4 + r._5 + r._6 === total,
          s"partition identity broken at k=$k embargo=$e fold=${r._1}")
        assert(r._5 >= 0 && r._6 >= 0)
      }
      // embargo 40 > span: every non-test row is purged, train = 0
      if (e == 40) assert(got.forall(_._6 === 0L))
      // embargo 0: nothing purged beyond the fold itself
      if (e == 0) assert(got.forall(_._5 === 0L))
    }
  }

  // --- fellegiSunter -----------------------------------------------------

  /** Plain-Scala replay of the full pipeline: dirty derivation,
    * two-window blocking, clamped-ppm estimation, pattern odds.
    */
  private def fsReplay(recs: Seq[(Long, String, Long)])
      : Set[(Int, Int, Int, Long, Long, Double, Boolean)] = {
    def dirty(id: Long, n: String): String =
      if (n.length < 2) n
      else {
        val pos = (id % (n.length - 1) + 1).toInt
        n.substring(0, pos - 1) + n.substring(pos)
      }
    def last3(s: String) = s.substring(s.length - 3)
    def first3(s: String) = s.substring(0, 3)
    val d = recs.map { case (id, n, a) => (id, n, dirty(id, n), a) }
    val cat = recs.groupBy(_._2).map { case (n, rs) =>
      val m = rs.minBy(_._1); (n, m._3) }.toSeq // (canon_name, attr of min id)
    val cand = (for {
      (rid, tn, dn, ra) <- d; (cn, ca) <- cat
      if last3(dn) == last3(cn) || first3(dn) == first3(cn)
    } yield {
      val gA = if (last3(dn) == last3(cn)) 1 else 0
      val gB = if (first3(dn) == first3(cn)) 1 else 0
      val gAt = if (ra == ca) 1 else 0
      val im = if (tn == cn) 1 else 0
      (gA, gB, gAt, im)
    })
    def ppm(n: Long, dd: Long) =
      math.max(1L, math.min(999999L, n * 1000000L / math.max(dd, 1L)))
    val nM = cand.count(_._4 == 1).toLong
    val nU = cand.count(_._4 == 0).toLong
    val m = Seq(
      ppm(cand.count(c => c._1 == 1 && c._4 == 1), nM),
      ppm(cand.count(c => c._2 == 1 && c._4 == 1), nM),
      ppm(cand.count(c => c._3 == 1 && c._4 == 1), nM))
    val u = Seq(
      ppm(cand.count(c => c._1 == 1 && c._4 == 0), nU),
      ppm(cand.count(c => c._2 == 1 && c._4 == 0), nU),
      ppm(cand.count(c => c._3 == 1 && c._4 == 0), nU))
    cand.groupBy(c => (c._1, c._2, c._3)).map { case ((a, b, at), cs) =>
      val bits = Seq(a, b, at)
      val num = bits.zip(m).map { case (g, mi) =>
        if (g == 1) mi else 1000000L - mi }.product
      val den = bits.zip(u).map { case (g, ui) =>
        if (g == 1) ui else 1000000L - ui }.product
      (a, b, at, cs.count(_._4 == 1).toLong, cs.count(_._4 == 0).toLong,
        num.toDouble / den.toDouble, num >= den)
    }.toSet
  }

  private val fsRecs: Seq[(Long, String, Long)] = {
    val rnd = new scala.util.Random(29)
    // 40 records, 8-char names over a 3-letter alphabet so both block
    // windows collide across entities and all pattern cells populate
    (1L to 40L).map(i =>
      (i, Seq.fill(8)(('a' + rnd.nextInt(3)).toChar).mkString, rnd.nextInt(4).toLong))
  }

  test("fellegiSunter: pattern table equals the plain-Scala replay " +
       "(blocking, clamped-ppm m/u, long-fraction odds, link rule)") {
    val got = Linkage.fellegiSunter(
        fsRecs.toDF("id", "name", "attr"),
        id = col("id"), name = col("name"), attr = col("attr"),
        blkA = substring(_, -3, 3), blkB = substring(_, 1, 3))
      .as[(Int, Int, Int, Long, Long, Double, Boolean)].collect().toSet
    assert(got === fsReplay(fsRecs))
  }

  test("fellegiSunter: a perfectly discriminative attribute dominates " +
       "the odds — agreement patterns with it link, without it don't") {
    // unique names; attr == id -> true pairs always agree on attr,
    // non-matches never do (m3 -> clamped 999999, u3 -> clamped 1)
    val recs = (1L to 30L).map(i =>
      (i, f"Rec${i}%03d-${(i % 7)}%d!!", i))
    val got = Linkage.fellegiSunter(
        recs.toDF("id", "name", "attr"),
        id = col("id"), name = col("name"), attr = col("attr"),
        blkA = substring(_, -3, 3), blkB = substring(_, 1, 3))
      .as[(Int, Int, Int, Long, Long, Double, Boolean)].collect()
    val withAttr = got.filter(_._3 == 1)
    val withoutAttr = got.filter(_._3 == 0)
    assert(withAttr.nonEmpty && withoutAttr.nonEmpty)
    assert(withAttr.forall(_._7), "attr-agreeing patterns must link")
    assert(withoutAttr.forall(!_._7), "attr-disagreeing patterns must not")
    // and every true match sits in an attr-agreeing pattern
    assert(withoutAttr.forall(_._4 === 0L))
  }
}
