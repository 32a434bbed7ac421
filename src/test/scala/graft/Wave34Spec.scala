package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Text

/** Round-13 wave 34: the composed web-corpus front door
  * (`web_pipeline` — fix_encoding → c4_apply → gopher A1 filter →
  * exact dedup as ONE fused plan) — hand-built staged pages with known
  * verdicts per status class, the planted mojibake-mirror coupling
  * proof, and the nav-chrome design invariants the registration's
  * line-dup injection rests on.
  */
class Wave34Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def run(pages: Seq[(Long, String)]) =
    Text.webPipeline(pages.toDF("doc_id", "text"))
      .orderBy(col("doc_id"))
      .as[(Long, Boolean, String, Option[Long], Option[String])].collect()

  // two C4-clean lines long enough to pass the quality word floor when
  // repeated; the word salad keeps repetition/line-dup quiet
  private val longLine1 = (1 to 30).map(i => s"alpha$i").mkString(" ") +
    " the quick brown fox jumps high today."
  private val longLine2 = (1 to 30).map(i => s"beta$i").mkString(" ") +
    " the calm river flows gently south now."
  private val goodPage = longLine1 + "\n" + longLine2

  test("webPipeline: every status class lands on its hand-built page") {
    val nav = Text.WebNavLine
    val pages = Seq(
      1L -> goodPage,                                   // kept
      2L -> goodPage,                                   // exact_dup of 1
      3L -> (goodPage + "\ncode { marker"),             // c4_page (brace)
      4L -> "no terminal punctuation here",             // c4_page (0 kept)
      // line_dup: three nav copies interleaved between distinct long
      // lines — passes repetition (no word n-gram repeats across the
      // glued joins), fails the 0.30 dup-line fraction
      5L -> Seq(longLine1, nav, longLine2, nav,
        (1 to 30).map(i => s"gamma$i").mkString(" ") +
          " the soft wind turns slowly west here.", nav).mkString("\n"),
      // gopher_quality: four distinct 8-word lines -> 32 words < 50;
      // enough characters that the top-gram fractions stay small, so
      // repetition and line rules pass and quality fails first
      6L -> (0 to 3).map(j => (1 to 7).map(i => s"word${j}x$i")
        .mkString(" ") + " ok.").mkString("\n"),
      // gopher_repetition: one kept line dominated by a repeated 2-gram
      7L -> (("spam " * 12) + "spam.\n" + longLine2))
    val got = run(pages)
    assert(got.map(r => (r._1, r._3)).toSeq === Seq(
      1L -> "kept", 2L -> "exact_dup", 3L -> "c4_page", 4L -> "c4_page",
      5L -> "gopher_line_dup", 6L -> "gopher_quality",
      7L -> "gopher_repetition"))
    // canonical: kept -> self, exact_dup -> its canonical, drops -> NULL
    assert(got(0)._4 === Some(1L) && got(1)._4 === Some(1L))
    assert(got.drop(2).forall(_._4.isEmpty))
    // cleaned text for survivors is the kept lines rejoined
    assert(got(0)._5 === Some(goodPage))
  }

  test("webPipeline: the planted mojibake mirror merges IFF the repair " +
       "stage ran (the stage-coupling proof)") {
    val clean = Text.mojibakePrefixRepaired + goodPage
    val corrupt = Text.mojibakePrefix + goodPage
    assert(clean !== corrupt, "the staged strings must differ pre-repair")
    val got = run(Seq(1L -> clean, 2L -> corrupt))
    assert(got(0)._3 === "kept" && got(1)._3 === "exact_dup")
    assert(got(1)._4 === Some(1L))
    assert(!got(0)._2 && got(1)._2) // changed flags the repaired copy only
    // negative control: genuinely different pages never merge
    val neg = run(Seq(1L -> goodPage,
      2L -> (longLine2 + "\n" + longLine1)))
    assert(neg.forall(_._3 === "kept"))
  }

  test("WebNavLine design invariants: C4 keeps it, line-dup sees it, " +
       "repetition cannot") {
    val nav = Text.WebNavLine
    assert(nav.endsWith(".") && nav.split(" ").length === 3,
      "nav line must survive the C4 line rule (terminal '.' + 3 words)")
    // interleaved nav page: line rule fires, repetition stays quiet
    // because word tokens glue across the newline joins
    val page = Seq(longLine1, nav, longLine2, nav,
      (1 to 30).map(i => s"delta$i").mkString(" ") +
        " the late sun sets quietly north soon.", nav).mkString("\n")
    val df = Seq((1L, page)).toDF("doc_id", "text")
    val rep = Text.gopherRepetition(df).select(col("gopher_pass"))
      .as[Boolean].head()
    val line = Text.gopherLineDup(df)
      .select(col("dup_line_frac"), col("line_pass"))
      .as[(Double, Boolean)].head()
    assert(rep, "repetition must not see the glued nav tokens")
    assert(line._1 > 0.30 && !line._2,
      s"3 nav copies in 6 lines must fail the 0.30 rule (got ${line._1})")
  }

  test("web_pipeline registration: every status class live at sf0.001; " +
       "mirror accounting exact") {
    val rows = SparkEntry.queries("web_pipeline")(spark,
        "/root/testdata/sf0.001")
      .as[(Long, Boolean, String, Option[Long])].collect()
    val byStatus = rows.groupBy(_._3).view.mapValues(_.length).toMap
    for (c <- Seq("kept", "exact_dup", "c4_page", "gopher_repetition",
                  "gopher_line_dup", "gopher_quality"))
      assert(byStatus.getOrElse(c, 0) > 0, s"class '$c' empty")
    // the mirror copies are the ONLY exact dups: counts pair up and
    // every exact_dup resolves to its clean twin across the offset
    assert(byStatus("exact_dup") === byStatus("kept"))
    for ((id, _, st, canon) <- rows) {
      if (st == "exact_dup") assert(canon === Some(id - 100000L),
        s"doc $id: exact_dup canonical should be its mirror twin")
      if (st == "kept") assert(canon === Some(id))
      if (st != "kept" && st != "exact_dup") assert(canon.isEmpty)
    }
    // changed == (the doc came through the mojibake mirror)
    for ((id, changed, _, _) <- rows)
      assert(changed === (id >= 100000L), s"changed flag wrong at $id")
    // both copies of a page always share their pre-dedup verdict
    val verdictById = rows.map(r => r._1 -> r._3).toMap
    for ((id, _, st, _) <- rows if id < 100000L) {
      val mirror = verdictById(id + 100000L)
      if (st == "kept") assert(mirror === "exact_dup")
      else assert(mirror === st, s"page $id: copies disagree pre-dedup")
    }
  }

  test("streaming_web_pipeline: the streamed staging + batch verdict " +
       "tail lands the batch ledger exactly") {
    val dir = "/root/testdata/sf0.001"
    val streamed = SparkEntry.queries("streaming_web_pipeline")(spark, dir)
      .collect().map(_.toSeq).toSet
    val batch = SparkEntry.queries("web_pipeline")(spark, dir)
      .collect().map(_.toSeq).toSet
    assert(streamed === batch)
    assert(streamed.nonEmpty)
  }

  test("web staging stream: kill mid-feed + restart from checkpoint " +
       "keeps the staged corpus exactly-once (the curation restart " +
       "proof, on the web projection)") {
    import graft.streaming.Streaming
    import graft.ops.Text
    val root = java.nio.file.Files
      .createTempDirectory("graft-web-restart").toString
    val (src, sink, ckpt) = (s"$root/src", s"$root/sink", s"$root/ckpt")
    val staged = Seq(
      1L -> (Text.mojibakePrefixRepaired + goodPage),
      2L -> (Text.mojibakePrefix + goodPage),
      3L -> (goodPage + "\ncode { marker"),
      4L -> "no terminal punctuation here",
      5L -> (Text.mojibakePrefix + longLine1 + "\n" + longLine1))
      .toDF("doc_id", "text")

    // wave 1 only (2 files = 1 micro-batch), run, "crash"
    val w1 = staged.filter(col("doc_id") <= 2)
    val w2 = staged.filter(col("doc_id") > 2)
    w1.coalesce(2).write.mode("overwrite").parquet(src)
    val schema1 = Streaming.runProjectionStream(spark, staged.schema,
      Text.webStage12, src, sink, ckpt)

    // the rest arrives while down; resume from the SAME checkpoint
    w2.coalesce(2).write.mode("append").parquet(src)
    val schema2 = Streaming.runProjectionStream(spark, staged.schema,
      Text.webStage12, src, sink, ckpt)
    assert(schema1 === schema2)

    val out = spark.read.schema(schema2).parquet(sink)
    assert(out.count() === 5L)
    assert(out.groupBy(col("doc_id")).count()
      .filter(col("count") > 1).count() === 0L, "duplicate staged docs")
    // and the verdict tail over the resumed staging equals the one-shot
    // batch pipeline on the same staged frame
    val streamedLedger = Text.webVerdictTail(out).collect()
      .map(_.toSeq).toSet
    val batchLedger = Text.webPipeline(staged).collect().map(_.toSeq).toSet
    assert(streamedLedger === batchLedger)
  }

  test("web_pipeline_corpus equals the ledger's kept rows") {
    val dir = "/root/testdata/sf0.001"
    val keptIds = SparkEntry.queries("web_pipeline")(spark, dir)
      .filter(col("status") === "kept").select(col("doc_id"))
      .as[Long].collect().toSet
    val corpus = SparkEntry.queries("web_pipeline_corpus")(spark, dir)
      .as[(Long, String)].collect()
    assert(corpus.map(_._1).toSet === keptIds)
    // corpus text carries no mojibake artifact and no dropped line
    for ((id, text) <- corpus) {
      for ((bad, _) <- Text.mojibakeTable)
        assert(!text.contains(bad), s"doc $id: residual artifact")
      for (l <- text.split("\n"))
        assert(l.endsWith(".") && l.split(" ").length >= 3,
          s"doc $id: line failing the C4 keep rule survived")
    }
  }
}
