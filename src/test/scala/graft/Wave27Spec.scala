package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Text

/** Round-8 wave 27: DSIR-shaped target-affinity data selection. */
class Wave27Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def corpus(rows: (Long, String, String)*) =
    rows.toDF("doc_id", "text", "lang")

  /** Plain-Scala replay of the estimator contract. */
  private def replay(rows: Seq[(Long, String, String)], target: String,
      buckets: Int): Map[Long, (Long, Long)] = {
    def b(w: String): Long = (w.head.toInt * 31L + w.length) % buckets
    val all = rows.flatMap { case (id, t, l) =>
      t.split(" ").map(w => (id, l, b(w))) }
    def freq(sel: Seq[(Long, String, Long)]): Map[Long, Long] = {
      val cnt = sel.groupBy(_._3).map { case (k, v) => k -> v.size.toLong }
      val tot = cnt.values.sum
      cnt.map { case (k, c) => k -> c * 1000000L / tot }
    }
    val ft = freq(all.filter(_._2 == target))
    val fr = freq(all)
    val delta = fr.map { case (k, r) => k -> (ft.getOrElse(k, 0L) - r) }
    all.groupBy(_._1).map { case (id, ws) =>
      id -> (ws.size.toLong, ws.map(w => delta(w._3)).sum)
    }
  }

  test("dsirAffinity: matches a plain-Scala replay bucket for bucket") {
    val rows = Seq(
      (1L, "the cat sat on the mat", "en"),
      (2L, "the dog ate the bone", "en"),
      (3L, "der hund frisst den knochen hier", "de"),
      (4L, "le chat dort sur le tapis", "fr"),
      (5L, "the cat and the dog met", "en"))
    val got = Text.dsirAffinity(corpus(rows: _*))
      .select("doc_id", "n_words", "affinity")
      .as[(Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(got === replay(rows, "en", 256))
  }

  test("dsirAffinity: target-language docs score above the others on a " +
       "separable corpus") {
    val rows = (1L to 20L).map { i =>
      if (i <= 10) (i, "alpha beta gamma delta alpha beta", "en")
      else (i, "zulu yankee xray whiskey zulu yankee", "de")
    }
    val rs = Text.dsirAffinity(corpus(rows: _*))
      .select("doc_id", "affinity").as[(Long, Long)].collect().toMap
    val en = (1L to 10L).map(rs)
    val de = (11L to 20L).map(rs)
    assert(en.min > de.max) // perfectly separable by construction
    assert(en.forall(_ > 0) && de.forall(_ < 0))
  }

  test("dsirAffinity: the fixed-cardinality delta table rides a " +
       "broadcast join; no text column survives past the projection") {
    val df = Text.dsirAffinity(
      Tables.documents(spark, "/root/testdata/sf0.001"))
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("CartesianProduct"))
  }

  test("bpeTrain: toy corpus replays the hand-checked merge sequence") {
    // words: the x2, cat, sat, cats, chat, that, hat, thus
    // (a,t) appears 6x -> merged first; tokens 31 -> 25; then (t,h) 4x...
    val docs = Seq((1L, "the cat sat", "en"), (2L, "the cats chat", "en"),
      (3L, "that hat thus", "en")).toDF("doc_id", "text", "lang")
    val got = ops.Text.bpeTrain(docs)
      .select("round", "l", "r", "pair_count", "tokens_after")
      .as[(Int, String, String, Long, Long)].collect().sortBy(_._1)
    assert(got.toSeq === Seq(
      (1, "a", "t", 6L, 25L),
      (2, "t", "h", 4L, 21L),
      (3, "c", "at", 2L, 19L),
      (4, "h", "at", 2L, 17L),
      (5, "th", "e", 2L, 15L)))
  }

  test("bpeTrain: greedy left-to-right non-overlap — 'aaa' + merge " +
       "(a,a) gives 'aa a' (2 tokens), then 'aaa' (1)") {
    val docs = Seq((1L, "aaa", "en")).toDF("doc_id", "text", "lang")
    val got = ops.Text.bpeTrain(docs, nMerges = 2)
      .select("round", "l", "r", "pair_count", "tokens_after")
      .as[(Int, String, String, Long, Long)].collect().sortBy(_._1)
    // round 1: get_stats counts both adjacent positions (2), but the
    // greedy merge collapses only the leftmost pair -> 2 tokens left
    assert(got.toSeq === Seq((1, "a", "a", 2L, 2L), (2, "aa", "a", 1L, 1L)))
  }

  test("bpeTrain/bpeEncode: a vocabulary that merges out before " +
       "nMerges stops early — state survives, encode still covers " +
       "every doc") {
    val docs = Seq((1L, "ab ab", "en")).toDF("doc_id", "text", "lang")
    val rounds = ops.Text.bpeTrain(docs, nMerges = 5)
      .select("round", "l", "r", "tokens_after")
      .as[(Int, String, String, Long)].collect()
    // round 1 merges (a,b) everywhere; no pair remains -> exactly 1 row
    assert(rounds.toSeq === Seq((1, "a", "b", 2L)))
    val enc = ops.Text.bpeEncode(docs, nMerges = 5)
      .select("doc_id", "n_words", "n_bpe_tokens")
      .as[(Long, Long, Long)].collect()
    assert(enc.toSeq === Seq((1L, 2L, 2L))) // NOT wiped to zero rows
  }

  test("bpeEncode: hand-computed fertility on the toy corpus") {
    // learned merges (see the bpeTrain test): at, th, c+at, h+at, th+e
    // the->1 tok, cat->1, sat->2, cats->2, chat->2, that->2, hat->1, thus->3
    val docs = Seq((1L, "the cat sat", "en"), (2L, "the cats chat", "en"),
      (3L, "that hat thus", "en")).toDF("doc_id", "text", "lang")
    val got = ops.Text.bpeEncode(docs)
      .select("doc_id", "n_words", "n_char_tokens", "n_bpe_tokens")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(got.toSeq === Seq(
      (1L, 3L, 9L, 4L),   // the(1) cat(1) sat(2)
      (2L, 3L, 11L, 5L),  // the(1) cats(2) chat(2)
      (3L, 3L, 11L, 6L))) // that(2) hat(1) thus(3)
  }

  test("bpeTrain: tokens_after strictly decreases across rounds on the " +
       "real corpus") {
    val out = ops.Text.bpeTrain(
      Tables.documents(spark, "/root/testdata/sf0.001"))
      .select("round", "tokens_after").as[(Int, Long)].collect().sortBy(_._1)
    assert(out.length === 5)
    out.sliding(2).foreach { case Array(a, b) =>
      assert(b._2 < a._2, s"round ${b._1} did not shrink the corpus") }
  }

  /** Plain-Scala BPE reference: same get_stats (every adjacent
    * position), same (count desc, pair asc) winner, same greedy
    * left-to-right non-overlapping merge. */
  private def refBpe(ws: Seq[String], nMerges: Int)
      : (Map[String, Vector[String]], Seq[(Int, String, String, Long, Long)]) = {
    val cnt = ws.groupBy(identity).map { case (w, g) => w -> g.size.toLong }
    var segs: Map[String, Vector[String]] =
      cnt.keys.map(w => w -> w.map(_.toString).toVector).toMap
    val out = scala.collection.mutable.Buffer[(Int, String, String, Long, Long)]()
    var stop = false
    for (round <- 1 to nMerges if !stop) {
      val pc = scala.collection.mutable.Map[(String, String), Long]()
      for ((w, syms) <- segs; i <- 0 until syms.length - 1)
        pc((syms(i), syms(i + 1))) =
          pc.getOrElse((syms(i), syms(i + 1)), 0L) + cnt(w)
      if (pc.isEmpty) stop = true
      else {
        val ((l, r), n) =
          pc.toSeq.sortBy { case ((a, b), m) => (-m, a, b) }.head
        segs = segs.map { case (w, syms) =>
          val b = Vector.newBuilder[String]; var i = 0
          while (i < syms.length) {
            if (i < syms.length - 1 && syms(i) == l && syms(i + 1) == r) {
              b += (l + r); i += 2
            } else { b += syms(i); i += 1 }
          }
          w -> b.result()
        }
        val toks = segs.map { case (w, s) => s.length * cnt(w) }.sum
        out += ((round, l, r, n, toks))
      }
    }
    (segs, out.toSeq)
  }

  test("bpeTrain/bpeEncode == plain-Scala reference on seeded random " +
       "corpora (small alphabet forces merge chains and ties)") {
    val rnd = new scala.util.Random(27)
    for (round <- 1 to 4) {
      val alpha = if (round % 2 == 0) "ab" else "abc"
      val nDocs = 3 + rnd.nextInt(3)
      val docRows = (1 to nDocs).map { d =>
        val ws = Seq.fill(3 + rnd.nextInt(6))(
          (1 to (1 + rnd.nextInt(4)))
            .map(_ => alpha(rnd.nextInt(alpha.length))).mkString)
        (d.toLong, ws.mkString(" "), "en")
      }
      val allWords = docRows.flatMap(_._2.split(" ").toSeq)
      val (segs, want) = refBpe(allWords, 5)
      val docs = docRows.toDF("doc_id", "text", "lang")
      val got = ops.Text.bpeTrain(docs)
        .select("round", "l", "r", "pair_count", "tokens_after")
        .as[(Int, String, String, Long, Long)].collect().sortBy(_._1)
      assert(got.toSeq === want, s"round=$round corpus=$docRows")
      val wantEnc = docRows.map { case (d, t, _) =>
        (d, t.split(" ").map(w => segs(w).length.toLong).sum) }.toMap
      val gotEnc = ops.Text.bpeEncode(docs)
        .select("doc_id", "n_bpe_tokens").as[(Long, Long)].collect().toMap
      assert(gotEnc === wantEnc, s"round=$round corpus=$docRows")
    }
  }

  test("spanCorrupt: losslessness — substituting each sentinel's target " +
       "span back into the corrupted text reproduces the original, and " +
       "corruption matches a plain-Scala replay of the hash walk") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val orig = docs.select("doc_id", "text")
      .as[(Long, String)].collect().toMap
    val out = ops.Text.spanCorrupt(docs)
      .select("doc_id", "corrupted_text", "targets", "n_spans")
      .as[(Long, String, String, Long)].collect()
    assert(out.length === orig.size)
    var corrupted = 0
    out.foreach { case (id, ct, tg, k) =>
      // parse targets into sentinel -> span
      val spans = scala.collection.mutable.Map[String, List[String]]()
      var cur: String = null
      tg.split(" ").filter(_.nonEmpty).foreach { t =>
        if (t.startsWith("<extra_id_")) { cur = t; spans(cur) = Nil }
        else spans(cur) = spans(cur) :+ t
      }
      assert(spans.size.toLong === k)
      val rebuilt = ct.split(" ").filter(_.nonEmpty).flatMap { t =>
        if (t.startsWith("<extra_id_")) spans(t) else Seq(t)
      }.mkString(" ")
      assert(rebuilt === orig(id), s"doc $id not lossless")
      // plain-Scala replay of the deterministic walk
      val toks = orig(id).split(" ")
      var (skip, kk) = (0L, 0L)
      val c2 = new StringBuilder
      toks.zipWithIndex.foreach { case (t, i) =>
        if (skip > 0) skip -= 1
        else if ((id * 1000003L + i.toLong * 131L) % 1000000007L % 100 < 5) {
          kk += 1; skip = (id * 131L + i.toLong) % 1000000007L % 3 + 1
          c2 ++= s" <extra_id_$kk>"
        } else c2 ++= s" $t"
      }
      assert(c2.toString.trim === ct, s"doc $id corruption differs")
      assert(kk === k)
      if (k > 0) corrupted += 1
    }
    assert(corrupted > 0 && corrupted < out.length) // non-degenerate rate
  }

  test("tokenBudgetPlan: hand-computed epochs and residual rates on a " +
       "tiny corpus; the plan identity holds for every row") {
    // en: 10 tokens avail; zh: 4; budget 100, weights en 500pm zh 200pm
    val docs = Seq(
      (1L, "a b c d e f g h i j", "en"),
      (2L, "x y z w", "zh")).toDF("doc_id", "text", "lang")
    val got = ops.Text.tokenBudgetPlan(docs,
      weightsPermille = Seq("en" -> 500, "zh" -> 200),
      budgetTokens = 100L)
      .select("lang", "avail_tokens", "target_tokens", "full_epochs",
        "residual_rate_ppm")
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    // en: target 50, avail 10 -> 5 epochs, residual 0
    assert(got("en") === (("en", 10L, 50L, 5L, 0L)))
    // zh: target 20, avail 4 -> 5 epochs, residual 0
    assert(got("zh") === (("zh", 4L, 20L, 5L, 0L)))
    val got2 = ops.Text.tokenBudgetPlan(docs,
      weightsPermille = Seq("en" -> 330, "zh" -> 670),
      budgetTokens = 10L)
      .select("lang", "avail_tokens", "target_tokens", "full_epochs",
        "residual_rate_ppm")
      .as[(String, Long, Long, Long, Long)].collect()
    got2.foreach { case (_, avail, target, ep, rr) =>
      assert(ep === target / avail)
      assert(rr === (target % avail) * 1000000L / avail)
    }
    // en: target 3 of 10 avail -> 0 epochs, 300000 ppm
    assert(got2.find(_._1 == "en").map(r => (r._4, r._5)) ===
      Some((0L, 300000L)))
  }

  test("denoiserMix: partitions the corpus (every doc exactly once), " +
       "all three objectives occur, S is lossless, X corrupts more " +
       "aggressively than R") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val orig = docs.select("doc_id", "text").as[(Long, String)].collect().toMap
    val out = ops.Text.denoiserMix(docs)
      .select("doc_id", "denoiser", "input_text", "targets", "n_spans")
      .as[(Long, String, String, String, Long)].collect()
    assert(out.length === orig.size)
    assert(out.map(_._1).distinct.length === orig.size) // a partition
    val byD = out.groupBy(_._2)
    assert(byD.keySet === Set("R", "X", "S"))
    // S: prefix + suffix reassembles the original
    byD("S").foreach { case (id, _, in, tg, k) =>
      assert(k === 1L)
      val pre = in.stripSuffix("<extra_id_1>").trim
      val suf = tg.stripPrefix("<extra_id_1> ")
      assert(Seq(pre, suf).filter(_.nonEmpty).mkString(" ") === orig(id))
    }
    // X's 15%-start/2-6-span setting must corrupt a larger token
    // fraction than R's 5%/2-4 on average (deterministic, so this is
    // a fixed fact of the corpus, not a flaky sample)
    def corruptedFrac(rows: Array[(Long, String, String, String, Long)]) = {
      val masked = rows.map(r =>
        r._4.split(" ").count(t => t.nonEmpty && !t.startsWith("<extra_id_"))
          .toDouble).sum
      val total = rows.map(r => orig(r._1).split(" ").length.toDouble).sum
      masked / total
    }
    assert(corruptedFrac(byD("X")) > corruptedFrac(byD("R")))
  }

  test("fimSplit: prefix+middle+suffix reassembles every original doc; " +
       "part lengths sum to n_tokens; all three boundary cases occur") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val orig = docs.select("doc_id", "text").as[(Long, String)].collect().toMap
    val out = ops.Text.fimSplit(docs)
      .select("doc_id", "fim_text", "n_tokens", "n_prefix", "n_middle",
        "n_suffix")
      .as[(Long, String, Long, Long, Long, Long)].collect()
    assert(out.length === orig.size)
    out.foreach { case (id, fim, n, np, nm, ns) =>
      assert(np + nm + ns === n)
      // parse "<PRE> p <SUF> s <MID> m" and reassemble p + m + s
      val pre = fim.substring("<PRE> ".length, fim.indexOf(" <SUF> "))
      val suf = fim.substring(fim.indexOf(" <SUF> ") + " <SUF> ".length,
        fim.indexOf(" <MID> "))
      val mid = fim.substring(fim.indexOf(" <MID> ") + " <MID> ".length)
      val rebuilt = Seq(pre, mid, suf).filter(_.nonEmpty).mkString(" ")
      assert(rebuilt === orig(id), s"doc $id not reassemblable")
    }
    // the empty-part corners the oracle NULL bug hid must be exercised
    assert(out.exists(_._4 == 0) && out.exists(_._5 == 0) &&
      out.exists(_._6 == 0))
  }

  test("dsirAffinity == plain-Scala replay on seeded random multilingual " +
       "corpora") {
    val rnd = new scala.util.Random(127)
    for (round <- 1 to 3) {
      val langs = Seq("en", "de", "fr")
      val rows = (1L to (8 + rnd.nextInt(8)).toLong).map { i =>
        val ws = Seq.fill(2 + rnd.nextInt(8))(
          (1 to (1 + rnd.nextInt(6)))
            .map(_ => ('a' + rnd.nextInt(26)).toChar).mkString)
        (i, ws.mkString(" "), langs(rnd.nextInt(langs.length)))
      }
      val got = ops.Text.dsirAffinity(rows.toDF("doc_id", "text", "lang"))
        .select("doc_id", "n_words", "affinity")
        .as[(Long, Long, Long)].collect()
        .map(r => r._1 -> (r._2, r._3)).toMap
      assert(got === replay(rows, "en", 256), s"round=$round rows=$rows")
    }
  }

  test("qualityPruneCurve == plain-Scala replay of the reverse-" +
       "cumulative identity over qualityScore's deciles (sf0.001)") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    // replay from the op's own scoring stage so the doubles are the
    // bit-identical shared expression tree
    val scored = Text.qualityScore(docs)
      .select(col("score"), col("n_words"))
      .as[(Double, Long)].collect()
    val byB = scored.groupBy { case (s, _) =>
      math.min(math.floor(s * 10).toInt, 9) }
    val want = byB.keys.map { b =>
      val kept = byB.filter(_._1 >= b).values.flatten
      (b, kept.size.toLong, kept.map(_._2).sum)
    }.toSet
    val got = Text.qualityPruneCurve(docs)
      .select("thr_decile", "docs_kept", "tokens_kept")
      .as[(Int, Long, Long)].collect().toSet
    assert(got === want)
    // the lowest populated decile keeps the whole corpus
    val total = (scored.length.toLong, scored.map(_._2).sum)
    assert(got.minBy(_._1)._2 === total._1)
    assert(got.minBy(_._1)._3 === total._2)
    // monotone: raising the threshold never keeps more
    val sorted = got.toSeq.sortBy(_._1)
    sorted.sliding(2).foreach { case Seq(lo, hi) =>
      assert(hi._2 <= lo._2 && hi._3 <= lo._3)
    case _ => }
  }

  test("qualityPruneCurve: hand-computed curve on a constructed corpus " +
       "spanning three deciles") {
    // hand-derived scores (0.5·min(1, n/200) + 0.3·ttr + 0.2·(1−stop)):
    //   doc 1: 200 distinct non-stop words -> 0.5 + 0.3 + 0.2 = 1.0
    //          -> decile least(floor(10), 9) = 9
    //   doc 2: "alpha beta gamma" -> 0.5·(3/200) + 0.3 + 0.2 = 0.5075
    //          -> decile 5
    //   doc 3: "the the the the a" -> n=5, ttr=2/5, stop=1 ->
    //          0.0125 + 0.12 + 0 = 0.1325 -> decile 1
    val long200 = (1 to 200).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      (1L, long200, "en"),
      (2L, "alpha beta gamma", "en"),
      (3L, "the the the the a", "en")).toDF("doc_id", "text", "lang")
    val scored = Text.qualityScore(docs)
      .select(col("doc_id"), col("score"), col("n_words"))
      .as[(Long, Double, Long)].collect().sortBy(_._1)
    // expected values written as the same IEEE arithmetic (the decimal
    // 0.5075 is not representable: the sum lands on ...000...01)
    assert(scored.map(_._2).toSeq === Seq(
      0.5 * 1.0 + 0.3 * 1.0 + 0.2 * 1.0,
      0.5 * (3.0 / 200.0) + 0.3 * 1.0 + 0.2 * 1.0,
      0.5 * (5.0 / 200.0) + 0.3 * (2.0 / 5.0) + 0.2 * 0.0))
    val got = Text.qualityPruneCurve(docs)
      .select("thr_decile", "docs_kept", "tokens_kept")
      .as[(Int, Long, Long)].collect().toSet
    // the full hand-built curve: thresholds 9, 5, 1 keep 1, 2, 3 docs
    assert(got === Set(
      (9, 1L, 200L),        // only doc 1 (200 tokens)
      (5, 2L, 203L),        // docs 1+2 (200 + 3)
      (1, 3L, 208L)))       // all three (200 + 3 + 5)
  }

  test("dsirAffinity: every doc with at least one word is scored, " +
       "n_words matches tokenization") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val out = Text.dsirAffinity(docs)
    assert(out.count() === docs.count())
    val nw = out.agg(sum("n_words")).as[Long].head()
    val truth = docs.select(size(split(col("text"), " ")).cast("long"))
      .as[Long].collect().sum
    assert(nw === truth)
  }
}
