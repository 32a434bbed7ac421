package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Graph, Text}

/** Round-8 wave 29: reciprocal-rank fusion + deterministic graph walks.
  *
  * Both ops are verified against the DuckDB oracle at every SF; these
  * specs add the INDEPENDENT evidence — plain-Scala replays of the
  * fusion arithmetic and the walk hash rule on constructed inputs where
  * the expected output is derivable by hand.
  */
class Wave29Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // --- rrfFusion -------------------------------------------------------

  /** Corpus engineered so the two rankers DISAGREE: tf-idf (tf/df, no
    * length norm) loves d1's raw repetition; BM25's saturation + length
    * penalty demotes it below the short focused d2.
    */
  private def fusionCorpus = Seq(
    (1L, ("batch " * 40).trim + " " + ("pad " * 160).trim, "en", "s", 0L),
    (2L, "batch scan hash", "en", "s", 0L),
    (3L, "batch scan other words here", "en", "s", 0L),
    (4L, ("scan " * 3).trim + " more filler text", "en", "s", 0L),
    (5L, "hash only doc", "en", "s", 0L),
    (6L, "no query terms at all", "en", "s", 0L))
    .toDF("doc_id", "text", "lang", "source", "n_chars")

  test("rrfFusion: fused scores replay the scaled-integer RRF of the " +
       "two rankers' own outputs") {
    val terms = Seq("batch", "scan", "hash")
    val ra = Text.searchRanked(fusionCorpus, terms, k = 5)
      .select("doc_id", "rank").as[(Long, Int)].collect().toMap
    val rb = Text.searchBm25(fusionCorpus, terms, k = 5)
      .select("doc_id", "rank").as[(Long, Int)].collect().toMap
    // the rankers must actually disagree for the test to mean anything
    assert(ra.exists { case (d, r) => rb.get(d).exists(_ != r) },
      "constructed corpus no longer produces ranker disagreement")

    val expected = (ra.keySet ++ rb.keySet).map { d =>
      val s = ra.get(d).map(r => 1000000000000L / (60L + r)).getOrElse(0L) +
        rb.get(d).map(r => 1000000000000L / (60L + r)).getOrElse(0L)
      (d, ra.getOrElse(d, 0), rb.getOrElse(d, 0), s)
    }.toSeq.sortBy { case (d, _, _, s) => (-s, d) }
      .zipWithIndex
      .map { case ((d, a, b, s), i) => Row(d, a, b, s, i + 1) }

    val got = Text.rrfFusion(fusionCorpus, terms, k = 5)
      .orderBy(col("rank_fused")).collect().toSeq
    assert(got === expected.take(5))
  }

  test("rrfFusion: a doc both rankers agree on mid-list outranks a doc " +
       "one ranker tops (the consensus property)") {
    val terms = Seq("batch", "scan", "hash")
    val out = Text.rrfFusion(fusionCorpus, terms, k = 5)
      .select("doc_id", "rank_tfidf", "rank_bm25", "rank_fused")
      .as[(Long, Int, Int, Int)].collect()
    val both = out.filter(r => r._2 > 0 && r._3 > 0).map(_._4)
    val single = out.filter(r => r._2 == 0 || r._3 == 0).map(_._4)
    if (both.nonEmpty && single.nonEmpty)
      assert(both.min < single.max,
        "some consensus doc should beat some single-list doc")
  }

  // --- ksDrift ----------------------------------------------------------

  test("ksDrift: hand-computed statistic, location, and both decisions") {
    // side 0: {1, 2, 3, 4}; side 1: {3, 4, 5, 6} (values in units)
    // cents x: 100..600. D = max|Fa*nb - Fb*na| / 16:
    //   x=100: |1*4-0|=4; x=200: 8; x=300: |3*4-1*4|=8; x=400: 8;
    //   x=500: |16-12|=4; x=600: 0 -> d_num=8 at x=200 (min tiebreak),
    //   D = 0.5. n=4+4: c^2 rule: 64*1e6 > 1844164*8*16 = 2.36e8? no
    //   -> 6.4e7 < 2.36e8 -> reject=false (tiny samples).
    val df = (Seq(1, 2, 3, 4).map(v => (0, v.toDouble)) ++
      Seq(3, 4, 5, 6).map(v => (1, v.toDouble)))
      .toDF("side", "value")
    val got = graft.ops.Profile.ksDrift(df, col("side"), col("value"))
      .as[(Long, Long, Long, Double, Long, Boolean)].collect().toSeq
    assert(got === Seq((4L, 4L, 8L, 0.5, 200L, false)))
  }

  test("ksDrift: NULL metric rows are excluded (Spark sorts NULLs " +
       "first, DuckDB last — an included NULL would desync the CDFs)") {
    val base = (Seq(1, 2, 3, 4).map(v => (0, Some(v.toDouble))) ++
      Seq(3, 4, 5, 6).map(v => (1, Some(v.toDouble))))
    val withNull = (base :+ (0, Option.empty[Double]) :+
      (1, Option.empty[Double])).toDF("side", "value")
    val got = graft.ops.Profile.ksDrift(withNull, col("side"), col("value"))
      .as[(Long, Long, Long, Double, Long, Boolean)].collect().toSeq
    // identical to the NULL-free hand-computed case above
    assert(got === Seq((4L, 4L, 8L, 0.5, 200L, false)))
  }

  test("ksDrift: fully disjoint large samples reject at alpha=0.05 " +
       "(the decision branch is live)") {
    // 100 draws of side 0 below 100 draws of side 1: D = 1.0
    val df = ((1 to 100).map(v => (0, v.toDouble)) ++
      (1 to 100).map(v => (1, v + 1000.0))).toDF("side", "value")
    val r = graft.ops.Profile.ksDrift(df, col("side"), col("value"))
      .as[(Long, Long, Long, Double, Long, Boolean)].collect().head
    assert(r._3 === 100L * 100L && r._4 === 1.0 && r._6 === true)
    // and a plain-Scala KS replay agrees on a seeded mixed sample
    val rnd = new scala.util.Random(7)
    val a = Seq.fill(60)(rnd.nextInt(50) + 1)
    val b = Seq.fill(40)(rnd.nextInt(50) + 11)
    val mixed = (a.map(v => (0, v.toDouble)) ++ b.map(v => (1, v.toDouble)))
      .toDF("side", "value")
    val xs = (a ++ b).distinct.sorted
    val expected = xs.map(x =>
      math.abs(a.count(_ <= x).toLong * b.size - b.count(_ <= x).toLong * a.size)).max
    val got = graft.ops.Profile.ksDrift(mixed, col("side"), col("value"))
      .as[(Long, Long, Long, Double, Long, Boolean)].collect().head
    assert(got._3 === expected)
  }

  // --- cdcChunkDedup ---------------------------------------------------

  /** Plain-Scala replay of the cut rule (wordHash + polyFold window). */
  private def cdcCuts(ws: Seq[String], w: Int = 3, m: Int = 8): Seq[Int] = {
    def wh(s: String): Long = s.headOption.map(_.toLong).getOrElse(0L) * 31 + s.length
    def pf(xs: Seq[Long]): Long =
      xs.foldLeft(0L)((a, x) => (a * 1000003L + x) % 1000000007L)
    (w to ws.length).filter(i => pf(ws.slice(i - w, i).map(wh)) % m == 0)
  }

  test("cdcChunkDedup: chunk counts replay the hand-computed cut rule") {
    val words = (1 to 40).map(i => s"w${i * 7 % 19}x$i")
    val text = words.mkString(" ")
    val cuts = cdcCuts(words)
    val expectedChunks = (0 +: cuts :+ words.length).distinct.size - 1
    val out = graft.ops.TextDedup.cdcChunkDedup(
      Seq((1L, text, "en", "s", 0L))
        .toDF("doc_id", "text", "lang", "source", "n_chars"))
      .as[(Long, Long, Long, Double)].collect().head
    assert(out === ((1L, expectedChunks.toLong, 0L, 0.0)))
    assert(expectedChunks > 1, "degenerate: no cut fired on the fixture")
  }

  test("cdcChunkDedup: boundaries RESYNC after a prepended word (the " +
       "shift-robustness fixed-grid chunking lacks)") {
    val rnd = new scala.util.Random(11)
    val words = (1 to 120).map(_ => s"t${rnd.nextInt(400)}")
    val a = words.mkString(" ")
    val b = "inserted " + a
    val docs = Seq((1L, a, "en", "s", 0L), (2L, b, "en", "s", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val cdc = graft.ops.TextDedup.cdcChunkDedup(docs)
      .as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> r).toMap
    // CDC: most of doc 2's chunks re-align with doc 1's
    assert(cdc(2L)._4 > 0.5,
      s"CDC dup_ratio ${cdc(2L)._4} — boundaries failed to resync")
    // fixed-grid contrast: the same prepend misaligns every 16-word
    // paragraph, so paragraphDedup keeps nearly all of doc 2
    val fixed = graft.ops.TextDedup.paragraphDedup(docs)
      .select("doc_id", "n_chunks", "n_kept")
      .as[(Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    val fixedDupRatio =
      1.0 - fixed(2L)._3.toDouble / fixed(2L)._2.toDouble
    assert(fixedDupRatio < cdc(2L)._4,
      s"fixed-grid dedup ($fixedDupRatio) should trail CDC (${cdc(2L)._4})")
  }

  // --- kendallTau ------------------------------------------------------

  test("kendallTau: hand-computed tau, perfect agreement, and reversal") {
    def rk(rs: (Long, Int)*) = rs.toList.toDF("id", "rank")
    val a = rk(1L -> 1, 2L -> 2, 3L -> 3, 4L -> 4)
    // one swapped adjacent pair: C=5, D=1, tau = 4/6
    val b = rk(1L -> 1, 2L -> 3, 3L -> 2, 4L -> 4)
    val got = graft.ops.Eval.kendallTau(a, b)
      .as[(Long, Long, Long, Double)].collect().head
    assert(got === ((4L, 5L, 1L, 4.0 / 6.0)))
    // identical -> tau 1; reversed -> tau -1
    assert(graft.ops.Eval.kendallTau(a, a)
      .as[(Long, Long, Long, Double)].collect().head._4 === 1.0)
    val rev = rk(1L -> 4, 2L -> 3, 3L -> 2, 4L -> 1)
    assert(graft.ops.Eval.kendallTau(a, rev)
      .as[(Long, Long, Long, Double)].collect().head._4 === -1.0)
    // disjoint rankings: n_common = 0, tau pinned 0
    val other = rk(9L -> 1)
    assert(graft.ops.Eval.kendallTau(a, other)
      .as[(Long, Long, Long, Double)].collect().head === ((0L, 0L, 0L, 0.0)))
  }

  // --- langIdNgram -----------------------------------------------------

  test("langIdNgram: separable corpora classify perfectly; short docs " +
       "fall back to 'und' (the synthetic corpus is near-chance, so " +
       "this constructed corpus is the live evidence)") {
    val docs = Seq(
      (1L, "aaka baka caka daka eaka", "xx"),
      (2L, "faka gaka haka iaka jaka", "xx"),
      (3L, "aka kaka laka maka naka", "xx"),
      (4L, "zuzo vuzo wuzo xuzo yuzo", "yy"),
      (5L, "quzo ruzo suzo tuzo uzo", "yy"),
      (6L, "nuzo ouzo puzo zuzo vuzo", "yy"),
      (7L, "hm", "xx")) // under 3 chars -> 'und'
      .toDF("doc_id", "text", "lang")
    val out = graft.ops.Text.langIdNgram(docs)
      .select("doc_id", "pred_lang")
      .as[(Long, String)].collect().toMap
    (1L to 3L).foreach(d => assert(out(d) === "xx", s"doc $d"))
    (4L to 6L).foreach(d => assert(out(d) === "yy", s"doc $d"))
    assert(out(7L) === "und")
  }

  // --- graphWalks ------------------------------------------------------

  /** The walk hash, replayed in plain Scala (chars fold, mod p). */
  private def charHash(s: String): Long =
    s.foldLeft(0L)((acc, c) => (acc * 1000003L + c.toLong) % 1000000007L)

  test("graphWalks: hand-replayed walk on a fixed small graph") {
    val edges = Seq(("a", "b"), ("b", "c"), ("c", "d"), ("a", "c"))
      .toDF("src", "dst")
    val steps = 4
    val adj = Map(
      "a" -> Seq("b", "c"), "b" -> Seq("a", "c"),
      "c" -> Seq("a", "b", "d"), "d" -> Seq("c"))
    val expected = adj.keys.toSeq.flatMap { start =>
      var cur = start
      (0 to steps).map { t =>
        if (t > 0) {
          val ns = adj(cur)
          cur = ns(((charHash(cur) * 31L + t) % ns.size).toInt)
        }
        (start, t, cur)
      }
    }.toSet
    val got = Graph.graphWalks(spark, edges, steps)
      .as[(String, Int, String)].collect().toSet
    assert(got === expected)
  }

  // --- kaplanMeier -----------------------------------------------------

  test("kaplanMeier: hand-computed curve with deaths and censoring") {
    import java.sql.Timestamp
    def ts(h: Long) = new Timestamp(h * 3600L * 1000L)
    // corpus ends at hour 100 (user 5's last event). horizon 12h:
    //   u1: [0, 10]  -> t=10, died (10 < 88)
    //   u2: [0, 10]  -> t=10, died
    //   u3: [5, 25]  -> t=20, died
    //   u4: [0, 95]  -> t=95, censored (95 >= 88)
    //   u5: [0, 100] -> t=100, censored
    // event times: t=10 (n=5, d=2) -> S = 3/5 = 0.6
    //              t=20 (n=3, d=1) -> S = 0.6 * 2/3 = 0.4
    val events = Seq(
      (1L, ts(0)), (1L, ts(10)),
      (2L, ts(0)), (2L, ts(10)),
      (3L, ts(5)), (3L, ts(25)),
      (4L, ts(0)), (4L, ts(95)),
      (5L, ts(0)), (5L, ts(100)))
      .toDF("user_id", "ts")
    val got = graft.ops.Temporal.kaplanMeier(events,
      entity = col("user_id"), ts = col("ts"), horizonHours = 12)
      .orderBy("t").as[(Long, Long, Long, Double)].collect().toSeq
    assert(got === Seq((10L, 5L, 2L, 0.6), (20L, 3L, 1L, 0.4)))
  }

  test("kaplanMeier: censoring shrinks the at-risk set without a curve " +
       "step (the property that distinguishes KM from naive survival)") {
    import java.sql.Timestamp
    def ts(h: Long) = new Timestamp(h * 3600L * 1000L)
    // corpus ends at hour 50 (u9); died iff last event < hour 38.
    //   u1: [0, 10]  -> t=10, last=10  -> died
    //   u2: [25, 45] -> t=20, last=45  -> CENSORED between event times
    //   u3: [0, 25]  -> t=25, last=25  -> died
    //   u9: [20, 50] -> t=30, last=50  -> censored (corpus end anchor)
    val events = Seq(
      (1L, ts(0)), (1L, ts(10)),
      (2L, ts(25)), (2L, ts(45)),
      (3L, ts(0)), (3L, ts(25)),
      (9L, ts(20)), (9L, ts(50)))
      .toDF("user_id", "ts")
    val got = graft.ops.Temporal.kaplanMeier(events,
      entity = col("user_id"), ts = col("ts"), horizonHours = 12)
      .orderBy("t").as[(Long, Long, Long, Double)].collect().toSeq
    // t=10: n=4, d=1 -> 0.75; t=20 emits NO row (censor only);
    // t=25: n=2 (u3, u9 remain), d=1 -> 0.75 * 1/2 = 0.375
    assert(got === Seq((10L, 4L, 1L, 0.75), (25L, 2L, 1L, 0.375)))
  }

  test("graphWalks: every step moves along a real edge and every walk " +
       "emits steps+1 rows") {
    val edges = Seq(("a", "b"), ("b", "c"), ("c", "a"), ("c", "d"),
      ("d", "e")).toDF("src", "dst")
    val out = Graph.graphWalks(spark, edges, steps = 3)
      .as[(String, Int, String)].collect()
    val byWalk = out.groupBy(_._1)
    assert(byWalk.size === 5 && byWalk.values.forall(_.length === 4))
    val adjacency = Set("ab", "ba", "bc", "cb", "ca", "ac", "cd", "dc",
      "de", "ed")
    byWalk.values.foreach { rows =>
      val path = rows.sortBy(_._2).map(_._3)
      path.sliding(2).foreach { case Array(u, v) =>
        assert(adjacency.contains(u + v), s"$u->$v is not an edge")
      }
    }
  }
}
