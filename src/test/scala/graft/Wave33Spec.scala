package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Text

/** Round-12 wave 33: C4 page cleaning (Raffel et al. 2020 §2.2) and
  * ftfy-style mojibake repair — hand-built pages/strings with known
  * verdicts, plus the structural invariants the registered queries'
  * injections rely on.
  */
class Wave33Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // --- c4LineFilter ------------------------------------------------------

  private def c4(pages: Seq[(Long, String)]) =
    Text.c4LineFilter(pages.toDF("doc_id", "text"))
      .orderBy(col("doc_id"))
      .as[(Long, Long, Long, Long, Boolean, Boolean, Boolean)].collect()

  test("c4LineFilter: hand page — line rules keep exactly the " +
       "terminal-punct >=3-word lines") {
    val page = Seq(
      "this line is kept.",      // kept: '.' + 4 words
      "too short.",              // dropped: 2 words
      "no terminal punctuation", // dropped: no '.'
      "another good line here.") // kept
      .mkString("\n")
    val got = c4(Seq((1L, page)))
    // (doc_id, n_lines, n_kept, kept_chars, brace, lorem, pass)
    assert(got(0) === ((1L, 4L, 2L,
      "this line is kept.".length.toLong +
        "another good line here.".length.toLong,
      false, false, true)))
  }

  test("c4LineFilter: each page-level drop rule fires alone") {
    val goodLines = "one good line here.\nsecond good line here."
    val got = c4(Seq(
      (1L, goodLines),                          // clean page: pass
      (2L, goodLines + "\ncode marker { here"), // brace: drop
      (3L, goodLines + "\nlorem ipsum filler"), // lorem: drop
      (4L, "one good line here.")))             // 1 kept < 2 floor: drop
    assert(got.map(r => (r._1, r._7)).toSeq ===
      Seq((1L, true), (2L, false), (3L, false), (4L, false)))
    assert(got(1)._5 && !got(1)._6) // brace flag only
    assert(!got(2)._5 && got(2)._6) // lorem flag only
    // the brace/lorem lines themselves also fail the line rules
    assert(got(1)._3 === 2L && got(2)._3 === 2L)
  }

  test("c4LineFilter: kept_chars is 0 (not null) when nothing survives") {
    val got = c4(Seq((1L, "no punct at all\nstill none")))
    assert(got(0)._3 === 0L && got(0)._4 === 0L && !got(0)._7)
  }

  test("c4_line_filter registration: injection populates every verdict " +
       "class at sf0.001 and page flags match the doc_id pattern") {
    val rows = SparkEntry.queries("c4_line_filter")(spark,
        "/root/testdata/sf0.001")
      .select(col("doc_id"), col("has_brace"), col("has_lorem"),
        col("c4_pass"), col("n_lines"))
      .as[(Long, Boolean, Boolean, Boolean, Long)].collect()
    assert(rows.count(_._4) > 0 && rows.count(r => !r._4) > 0)
    for ((id, brace, lorem, _, nLines) <- rows if nLines >= 4) {
      assert(brace === (id % 7 == 0), s"brace flag wrong at doc $id")
      assert(lorem === (id % 11 == 0), s"lorem flag wrong at doc $id")
    }
  }

  // --- c4Apply + gopherFilter (the composition layer) --------------------

  test("c4Apply: emits exactly the kept lines of passing pages; " +
       "failing pages are dropped rows") {
    val goodLines = "one good line here.\nsecond good line here."
    val out = Text.c4Apply(Seq(
      (1L, goodLines + "\nno punct filler"),
      (2L, goodLines + "\ncode { marker"),
      (3L, "only one good line here.")).toDF("doc_id", "text"))
      .orderBy(col("doc_id")).as[(Long, String)].collect()
    assert(out.toSeq === Seq((1L, goodLines))) // 2 and 3 dropped
  }

  test("gopherFilter: composite AND + first-failing-half reject reason " +
       "in the paper's table order") {
    def half(flag: String, bits: Seq[(Long, Boolean)]) =
      bits.toDF("doc_id", flag)
    val rep = half("gopher_pass",
      Seq(1L -> true, 2L -> false, 3L -> false, 4L -> true, 5L -> true))
    val line = half("line_pass",
      Seq(1L -> true, 2L -> false, 3L -> true, 4L -> false, 5L -> true))
    val qual = half("quality_pass",
      Seq(1L -> true, 2L -> false, 3L -> false, 4L -> true, 5L -> false))
    val out = Text.gopherFilter(rep, line, qual).orderBy(col("doc_id"))
      .as[(Long, Boolean, Boolean, Boolean, Boolean, String)].collect()
    assert(out.map(r => (r._1, r._5, r._6)).toSeq === Seq(
      (1L, true, "keep"),
      (2L, false, "repetition"),  // repetition outranks the others
      (3L, false, "repetition"),
      (4L, false, "line_dup"),
      (5L, false, "quality")))
  }

  test("gopher_filter registration: all three reject classes and the " +
       "keep class are populated at sf0.001") {
    val reasons = SparkEntry.queries("gopher_filter")(spark,
        "/root/testdata/sf0.001")
      .groupBy(col("reject_reason")).count()
      .as[(String, Long)].collect().toMap
    for (r <- Seq("keep", "repetition", "line_dup", "quality"))
      assert(reasons.getOrElse(r, 0L) > 0, s"class '$r' empty")
  }

  // --- gopherQuality -----------------------------------------------------

  private def gq(rows: Seq[(Long, String)]) =
    Text.gopherQuality(rows.toDF("doc_id", "text"))
      .orderBy(col("doc_id")).collect()

  test("gopherQuality: hand doc — every signal computed exactly") {
    // 4 words ("a bb cc3 ####"), 1 line, 10 word chars -> mean 2.5,
    // one 4-'#' run, 3 alpha words, no stop words
    val r = gq(Seq((1L, "a bb cc3 ####")))(0)
    assert(r.getLong(1) === 4L)                       // n_words
    assert(r.getDouble(2) === 2.5)                    // mean_word_len
    assert(r.getDouble(3) === 1.0)                    // symbol_ratio 4/4
    assert(r.getDouble(6) === 0.75)                   // alpha 3/4
    assert(r.getLong(7) === 0L)                       // n_stop_words
    assert(!r.getBoolean(8) && !r.getBoolean(9))      // words, len fail
    assert(!r.getBoolean(10))                         // symbol fail
    assert(!r.getBoolean(13) && !r.getBoolean(14))    // alpha, stop fail
    assert(!r.getBoolean(15))                         // composite fail
  }

  test("gopherQuality: line rules — bullets and ellipses count by line") {
    val page = Seq(
      Text.BulletPrefix + "first bullet line",
      Text.BulletPrefix + "second bullet line",
      "plain line" + Text.Ellipsis,
      "plain line").mkString("\n")
    val r = gq(Seq((1L, page)))(0)
    assert(r.getDouble(4) === 0.5)  // bullet_line_frac 2/4
    assert(r.getDouble(5) === 0.25) // ellipsis_line_frac 1/4
    assert(r.getBoolean(11))        // bullet_pass (0.5 <= 0.9)
    assert(r.getBoolean(12))        // ellipsis_pass (0.25 <= 0.3)
    val all = (1 to 4).map(i => Text.BulletPrefix + s"line $i").mkString("\n")
    assert(!gq(Seq((2L, all)))(0).getBoolean(11)) // 1.0 > 0.9 fails
  }

  test("gopherQuality: the published word-count and word-length bounds") {
    val fifty = (1 to 50).map(i => "word").mkString(" ")
    val r50 = gq(Seq((1L, fifty)))(0)
    assert(r50.getBoolean(8))                       // 50 words: pass
    assert(r50.getDouble(2) === 4.0 && r50.getBoolean(9))
    val r49 = gq(Seq((1L, (1 to 49).map(_ => "word").mkString(" "))))(0)
    assert(!r49.getBoolean(8))                      // 49 words: fail
    val long = (1 to 50).map(_ => Text.LongWord).mkString(" ")
    val rl = gq(Seq((1L, long)))(0)
    assert(rl.getDouble(2) === 15.0 && !rl.getBoolean(9)) // mean 15 > 10
  }

  test("gopher_quality registration: every rule flag is live at sf0.001 " +
       "and the injection classes hit their target rules") {
    val df = SparkEntry.queries("gopher_quality")(spark,
      "/root/testdata/sf0.001")
    val rows = df.collect()
    val flagIdx = Map("words" -> 8, "wordlen" -> 9, "symbol" -> 10,
      "bullet" -> 11, "ellipsis" -> 12, "alpha" -> 13, "stop" -> 14,
      "composite" -> 15)
    for ((nm, i) <- flagIdx) {
      assert(rows.exists(_.getBoolean(i)) && rows.exists(r => !r.getBoolean(i)),
        s"$nm flag constant at sf0.001")
    }
    // precedence: %17 docs always fail wordlen; %13 (not %17, >=8 words)
    // always fail bullet
    for (r <- rows; id = r.getLong(0)) {
      if (id % 17 == 0) assert(!r.getBoolean(9), s"doc $id wordlen")
      else if (id % 13 == 0 && r.getLong(1) >= 8)
        assert(!r.getBoolean(11), s"doc $id bullet")
    }
  }

  // --- fixEncoding -------------------------------------------------------

  private def fix(rows: Seq[(Long, String)]) =
    Text.fixEncoding(rows.toDF("doc_id", "text"))
      .orderBy(col("doc_id"))
      .as[(Long, String, Long, Boolean)].collect()

  test("fixEncoding: repairs every table entry; clean text untouched") {
    val got = fix(Seq(
      (1L, "cafÃ©"),                 // cafÃ© -> café
      (2L, "donâ€™t"),          // donâ€™t -> don’t
      (3L, "Ã¼ber maÃ±ana"), // Ã¼ber maÃ±ana
      (4L, "already clean text")))
    assert(got(0) === ((1L, "café", 1L, true)))
    assert(got(1) === ((2L, "don’t", 2L, true)))
    assert(got(2) === ((3L, "über mañana", 2L, true)))
    assert(got(3) === ((4L, "already clean text", 0L, false)))
  }

  test("fixEncoding: idempotent — repairing repaired text is a no-op") {
    val once = fix(Seq((1L, Text.mojibakePrefix + "tail words")))
    assert(once(0)._4 && once(0)._3 === 4L) // 1 + 2 + 1 chars saved
    val twice = fix(Seq((1L, once(0)._2)))
    assert(!twice(0)._4 && twice(0)._3 === 0L)
    assert(twice(0)._2 === "café don’t über tail words")
  }

  test("fixEncoding: mojibake patterns are mutually prefix-free — no " +
       "pattern can hide inside another's prefix") {
    // NB prefix-freeness is all this gives: a repair can still
    // SYNTHESIZE a later pattern (pinned below), so the chain order
    // stays part of the operator definition (advice round 12).
    val pats = Text.mojibakeTable.map(_._1)
    for (a <- pats; b <- pats if a != b)
      assert(!a.startsWith(b) && !b.startsWith(a),
        s"'$a' and '$b' collide — one would shadow the other's start")
  }

  test("fixEncoding: the documented synthesize case — a dangling 'â€' " +
       "before a repaired left quote forms the en-dash artifact, which " +
       "the chain then repairs because â€“ runs AFTER â€œ") {
    // input: â€ (dangling artifact head) + â€œ (left-quote
    // artifact). The â€œ repair yields â€“ — exactly the
    // â€“ artifact — which the next link repairs to the en dash. The
    // shipped table order therefore fully repairs it; a reversed order
    // would strand the synthesized artifact.
    val dangling = "\u00E2\u20AC"            // artifact head (a-circ + euro)
    val quoteArtifact = "\u00E2\u20AC\u0153" // the left-quote artifact
    val got = fix(Seq((1L, dangling + quoteArtifact)))
    assert(got(0)._2 === "\u2013", // en dash
      "chain should repair the synthesized artifact")
    assert(got(0)._3 === 4L && got(0)._4)
    // and the order-dependence is real: stopping after the quote link
    // leaves the en-dash artifact in the text
    val afterQuoteOnly = (dangling + quoteArtifact)
      .replace(quoteArtifact, "\u201C") // left double quote
    assert(afterQuoteOnly === "\u00E2\u20AC\u201C", // the en-dash artifact
      "the quote repair synthesizes the en-dash artifact on this fragment")
  }

  test("fixEncoding: every mojibakeTable repair strictly shrinks — the " +
       "chars_saved activity metric depends on it") {
    for ((bad, good) <- Text.mojibakeTable)
      assert(bad.length > good.length,
        s"repair '$bad' -> '$good' does not shrink; chars_saved would " +
          "stop tracking activity (advice round 12)")
  }

  // --- seeded property sweeps (the PropertySpec convention) --------------

  test("properties on seeded random multi-line docs: structural " +
       "invariants of all three round-12 ops hold") {
    val rnd = new scala.util.Random(33)
    val frags = Seq("alpha beta.", "x.", "no punct here at all",
      "{ brace", "lorem ipsum", "one two three.", Text.BulletPrefix + "pt",
      "tail" + Text.Ellipsis, "cafÃ© word", "donâ€™t stop")
    val docs = (1L to 40L).map { id =>
      (id, Seq.fill(1 + rnd.nextInt(5))(frags(rnd.nextInt(frags.length)))
        .mkString("\n"))
    }
    val c4 = Text.c4LineFilter(docs.toDF("doc_id", "text"))
      .as[(Long, Long, Long, Long, Boolean, Boolean, Boolean)].collect()
    val byId = docs.toMap
    for (r <- c4) {
      assert(r._3 <= r._2, s"doc ${r._1}: kept lines > lines")
      assert(r._4 <= byId(r._1).length.toLong, s"doc ${r._1}: kept chars")
      // composite decomposes exactly
      assert(r._7 === (r._3 >= 2 && !r._5 && !r._6), s"doc ${r._1}: pass")
    }
    val gq = Text.gopherQuality(docs.toDF("doc_id", "text")).collect()
    for (r <- gq) {
      for (i <- Seq(3, 4, 5, 6)) { // ratio/fraction columns in [0, ...)
        assert(r.getDouble(i) >= 0.0, s"doc ${r.getLong(0)} col $i < 0")
      }
      assert(r.getDouble(4) <= 1.0 && r.getDouble(5) <= 1.0 &&
        r.getDouble(6) <= 1.0)
      assert(r.getBoolean(15) === (8 to 14).forall(r.getBoolean),
        s"doc ${r.getLong(0)}: composite != AND of flags")
    }
    val fx = Text.fixEncoding(docs.toDF("doc_id", "text"))
      .as[(Long, String, Long, Boolean)].collect()
    for (r <- fx) {
      assert(r._4 === (r._3 > 0), s"doc ${r._1}: changed != saved>0")
      assert(r._2.length.toLong === byId(r._1).length - r._3)
      // repaired text contains no artifact pattern
      for ((bad, _) <- Text.mojibakeTable)
        assert(!r._2.contains(bad), s"doc ${r._1}: residual '$bad'")
    }
  }

  test("fix_encoding registration: exactly the every-5th docs change " +
       "at sf0.001, each saving the prefix's 4 chars") {
    val rows = SparkEntry.queries("fix_encoding")(spark,
        "/root/testdata/sf0.001")
      .select(col("doc_id"), col("chars_saved"), col("changed"))
      .as[(Long, Long, Boolean)].collect()
    for ((id, saved, changed) <- rows) {
      assert(changed === (id % 5 == 0), s"changed flag wrong at doc $id")
      assert(saved === (if (id % 5 == 0) 4L else 0L),
        s"chars_saved wrong at doc $id")
    }
  }
}
