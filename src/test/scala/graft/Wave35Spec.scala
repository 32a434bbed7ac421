package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Text

/** Round-13 wave 35: UTS #39 confusable-skeleton normalization — hand
  * strings with known spoof verdicts plus the table/injection
  * invariants the registered query rests on.
  */
class Wave35Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def run(rows: Seq[(Long, String)]) =
    Text.confusableNormalize(rows.toDF("doc_id", "text"))
      .orderBy(col("doc_id"))
      .as[(Long, String, Long, Boolean, Boolean)].collect()

  test("confusableNormalize: the spoof word, the honest foreign word, " +
       "and clean ASCII each get their verdict") {
    val cyrA = "\u0430" // CYRILLIC SMALL A
    val got = run(Seq(
      1L -> s"p${cyrA}ypal payment page.",  // mixed-script spoof
      2L -> ("word " + Text.confusablePureWord + " word."), // pure foreign
      3L -> "plain ascii text here."))
    assert(got(0) === ((1L, "paypal payment page.", 1L, true, true)))
    // pure confusable word: counted, normalized, but NOT mixed-script
    assert(got(1)._3 === Text.confusablePureWord.length.toLong)
    assert(!got(1)._4 && got(1)._5)
    assert(!got(1)._2.contains("\u0441") && !got(1)._2.contains("\u043E"))
    assert(got(2) === ((3L, "plain ascii text here.", 0L, false, false)))
  }

  test("confusableNormalize: idempotent — a skeleton has no confusables " +
       "left to count") {
    val mixed = "p\u0430yp\u0430l \u0441l\u0456ck n\u043Ew."
    val once = run(Seq(1L -> mixed))(0)
    assert(once._3 === 5L && once._4 && once._5)
    val twice = run(Seq(1L -> once._2))(0)
    assert(twice._3 === 0L && !twice._4 && !twice._5)
    assert(twice._2 === once._2)
  }

  test("confusableTable invariants: 1:1 mappings to ASCII letters, no " +
       "skeleton char re-enters the table (idempotence by construction)") {
    for ((bad, good) <- Text.confusableTable) {
      assert(bad.length === 1 && good.length === 1,
        s"'$bad' -> '$good' is not a single-char mapping; n_confusables " +
          "counts by length delta and depends on 1:1")
      assert(bad.charAt(0) > 0x7F, s"'$bad' is ASCII — not a confusable")
      assert(good.charAt(0).isLetter && good.charAt(0) <= 'z',
        s"skeleton '$good' is not an ASCII letter")
      assert(!Text.confusableTable.exists(_._1 == good),
        s"skeleton '$good' is itself in the table — chain order would matter")
    }
    // the injection pairs are the inverse of the three Cyrillic vowels
    assert(Text.confusableInjectPairs ===
      Seq("a" -> "\u0430", "e" -> "\u0435", "o" -> "\u043E"))
    // the pure word uses only table chars (never mixes)
    assert(Text.confusablePureWord.forall(ch =>
      Text.confusableTable.exists(_._1.charAt(0) == ch)))
  }

  test("confusable_normalize registration: injection classes land on " +
       "their doc_id pattern at sf0.001") {
    val rows = SparkEntry.queries("confusable_normalize")(spark,
        "/root/testdata/sf0.001")
      .as[(Long, String, Long, Boolean, Boolean)].collect()
    assert(rows.count(_._4) > 0 && rows.count(r => !r._4 && r._5) > 0 &&
      rows.count(r => !r._5) > 0, "a verdict class is empty")
    for ((id, _, n, mixed, changed) <- rows) {
      if (mixed) assert(id % 6 === 0L, s"doc $id mixed but not %6")
      if (id % 9 == 0 && id % 6 != 0) {
        assert(changed && !mixed, s"doc $id: pure-append class wrong")
        assert(n >= Text.confusablePureWord.length.toLong)
      }
      if (id % 6 != 0 && id % 9 != 0)
        assert(!changed && n === 0L, s"doc $id: untouched doc changed")
    }
  }
}
