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

  test("fixEncoding: mojibake patterns are mutually prefix-free, so " +
       "replacement order cannot mis-fire") {
    val pats = Text.mojibakeTable.map(_._1)
    for (a <- pats; b <- pats if a != b)
      assert(!a.startsWith(b) && !b.startsWith(a),
        s"'$a' and '$b' collide — the replace chain order would matter")
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
