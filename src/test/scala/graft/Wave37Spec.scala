package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Text

/** Round-15 wave 37: the semantic and exact-substring stages on the
  * web front door (`web_pipeline_sem`, `web_pipeline_substr`) and the
  * streaming face of the near stage (`streaming_web_pipeline_near`).
  * Hand-built pages with known verdicts, the planted-tier coupling
  * proofs in BOTH directions per stage (near-dedup provably cannot
  * merge the reversed paraphrase, the sem stage provably must;
  * near-dedup provably cannot excise the license footer, the substr
  * stage provably must), and the design invariants the staged-corpus
  * injections rest on.
  */
class Wave37Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val longLine1 = (1 to 30).map(i => s"alpha$i").mkString(" ") +
    " the quick brown fox jumps high today."
  private val longLine2 = (1 to 30).map(i => s"beta$i").mkString(" ") +
    " the calm river flows gently south now."
  private val goodPage = longLine1 + "\n" + longLine2

  /** Per-line word reversal keeping the terminal word — the sem twin
    * transformation, restated locally so the spec's expectation cannot
    * share a bug with the staging under test.
    */
  private def reversedTwin(page: String): String =
    page.split("\n").map { l =>
      val ws = l.split(" ")
      if (ws.length >= 2)
        ws.dropRight(1).reverse.mkString(" ") + " " + ws.last
      else l
    }.mkString("\n")

  // ---- sem stage -------------------------------------------------------

  test("webPipelineSem: a shingle-disjoint paraphrase with an identical " +
       "embedding lands sem_dup with partner and cosine 1.0; unrelated " +
       "vectors stay kept") {
    val para = reversedTwin(goodPage)
    val other = longLine2.replace("beta", "zeta") + "\n" +
      longLine1.replace("alpha", "eta")
    val pages = Seq(1L -> goodPage, 3L -> para, 4L -> other)
    val v1 = (1 to 64).map(i => math.sin(i).toFloat)
    val v4 = (1 to 64).map(i => math.cos(3 * i).toFloat)
    val emb = Seq((1L, v1), (3L, v1), (4L, v4))
      .toDF("vec_id", "embedding")
    val got = Text.webPipelineSem(pages.toDF("doc_id", "text"), emb)
      .orderBy(col("doc_id"))
      .as[(Long, Boolean, String, Option[Long], Option[Double],
           Option[Double])].collect()
    assert(got.map(r => (r._1, r._3)).toSeq ===
      Seq(1L -> "kept", 3L -> "sem_dup", 4L -> "kept"))
    assert(got(1)._4 === Some(1L), "sem twin must resolve to the page")
    assert(got(1)._6.exists(_ >= 0.999),
      s"identical embeddings must verify at cosine 1.0: ${got(1)._6}")
    assert(got(0)._6.isEmpty && got(2)._6.isEmpty,
      "sem_cosine must be NULL off the sem_dup class")
  }

  test("sem-twin coupling, both directions: the near stage provably " +
       "CANNOT merge the reversed paraphrase (shingle-disjoint), the " +
       "sem stage provably DOES (identical embedding)") {
    val para = reversedTwin(goodPage)
    val staged = Seq(1L -> goodPage, 3L -> para).toDF("doc_id", "text")
    // direction 1: exact + near dedup are both blind to it
    val near = Text.webPipelineNear(staged).orderBy(col("doc_id"))
      .as[(Long, Boolean, String, Option[Long], Option[Double])].collect()
    assert(near.map(_._3).toSeq === Seq("kept", "kept"),
      "near dedup must NOT merge the per-line-reversed paraphrase")
    // direction 2: the sem stage merges it through the embedding
    val v = (1 to 64).map(i => math.sin(i).toFloat)
    val emb = Seq((1L, v), (3L, v)).toDF("vec_id", "embedding")
    val sem = Text.webPipelineSem(staged, emb).orderBy(col("doc_id"))
      .as[(Long, Boolean, String, Option[Long], Option[Double],
           Option[Double])].collect()
    assert(sem.map(_._3).toSeq === Seq("kept", "sem_dup"))
    assert(sem(1)._4 === Some(1L))
  }

  test("webPipelineSem: a kept page WITHOUT a vector in the side table " +
       "cannot sem-merge (partial embedding coverage is legal)") {
    val para = reversedTwin(goodPage)
    val staged = Seq(1L -> goodPage, 3L -> para).toDF("doc_id", "text")
    val v = (1 to 64).map(i => math.sin(i).toFloat)
    // only the page has a vector — the twin is uncovered
    val emb = Seq((1L, v)).toDF("vec_id", "embedding")
    val got = Text.webPipelineSem(staged, emb).orderBy(col("doc_id"))
      .as[(Long, Boolean, String, Option[Long], Option[Double],
           Option[Double])].collect()
    assert(got.map(_._3).toSeq === Seq("kept", "kept"),
      "an uncovered page must stay kept, never sem_dup")
  }

  test("web_pipeline_sem registration: all NINE status classes live at " +
       "sf0.001; every sem twin of a kept covered page is sem_dup at " +
       "cosine 1.0, none is exact_dup or near_dup") {
    val rows = SparkEntry.queries("web_pipeline_sem")(spark,
        "/root/testdata/sf0.001")
      .as[(Long, Boolean, String, Option[Long], Option[Double],
           Option[Double])].collect()
    val byStatus = rows.groupBy(_._3).view.mapValues(_.length).toMap
    for (c <- Seq("kept", "exact_dup", "near_dup", "sem_dup", "c4_page",
                  "gopher_repetition", "gopher_line_dup", "gopher_quality"))
      assert(byStatus.getOrElse(c, 0) > 0, s"class '$c' empty")
    val statusById = rows.map(r => r._1 -> r._3).toMap
    val twins = rows.filter(_._1 >= 300000L)
    assert(twins.nonEmpty, "no planted sem twins staged")
    assert(twins.forall(_._3 != "exact_dup"),
      "a planted sem twin hash-merged — the reversal failed to change " +
      "the content hash: " +
      twins.filter(_._3 == "exact_dup").take(3).mkString(","))
    // a twin CAN be near_dup — but only of ANOTHER twin: the corpus
    // has natural near-dup base pairs, and reversal preserves pairwise
    // similarity BETWEEN twins while destroying it against every
    // unreversed page. A twin near-merged onto a base page would mean
    // the reversal failed.
    for (t <- twins if t._3 == "near_dup")
      assert(t._4.exists(_ >= 300000L),
        s"twin ${t._1} near-merged onto a NON-twin ${t._4} — the " +
        "reversal failed to defeat near-dedup against unreversed pages")
    assert(twins.forall(_._2), "twins ride the mojibake mirror: changed")
    // sf0.001 embeddings cover every doc id, so every kept base page's
    // twin must merge: at the SEM stage onto the base (cosine 1.0),
    // unless a smaller twin of a naturally near-identical base caught
    // it at the NEAR stage first
    for ((id, _, st, canon, _, cos) <- twins) {
      val base = id - 300000L
      if (statusById(base) == "kept") {
        assert(st === "sem_dup" || st === "near_dup",
          s"twin $id of kept page $base must merge, got $st")
        if (st == "sem_dup") {
          assert(canon.exists(_ <= base),
            s"twin $id: canonical $canon must be <= its page $base")
          assert(cos.exists(_ >= 0.999),
            s"twin $id: verified cosine missing or below 1.0: $cos")
        }
      }
    }
    assert(twins.exists(_._3 == "sem_dup"),
      "no twin reached the sem stage — the coupling class is dead")
    assert(twins.exists(t => statusById(t._1 - 300000L) == "kept"),
      "no sem twin has a kept base page — the coupling class is dead")
    // below the sem tier the ledger must carry web_pipeline_near's
    // semantics: sem_cosine NULL off the sem class
    for ((id, _, st, _, _, cos) <- rows if st != "sem_dup")
      assert(cos.isEmpty, s"row $id: sem_cosine on non-sem status $st")
  }

  // ---- substr stage ----------------------------------------------------

  test("webPipelineSubstr: a >=8-token span shared by two kept pages is " +
       "excised from the later page (substr_pruned, first occurrence " +
       "untouched); pages without cross-page repeats keep n_removed 0") {
    val span = "copyright notice all rights reserved by the archive team."
    val pageA = goodPage + "\n" + span
    val pageB = longLine2.replace("beta", "zeta") + "\n" +
      longLine1.replace("alpha", "eta") + "\n" + span
    val other = longLine1.replace("alpha", "mu") + "\n" +
      longLine2.replace("beta", "nu")
    val got = Text.webPipelineSubstr(
      Seq(1L -> pageA, 4L -> pageB, 6L -> other).toDF("doc_id", "text"))
      .orderBy(col("doc_id"))
      .as[(Long, Boolean, String, Option[Long], Option[Double],
           Option[Long], Option[String])].collect()
    assert(got.map(r => (r._1, r._3)).toSeq ===
      Seq(1L -> "kept", 4L -> "substr_pruned", 6L -> "kept"))
    assert(got(0)._6 === Some(0L), "first occurrence must keep its span")
    assert(got(0)._7 === Some(Text.webPipeline(
      Seq(1L -> pageA).toDF("doc_id", "text"))
      .filter(col("status") === "kept")
      .select(col("text_clean")).as[String].head()),
      "unpruned text_dedup must be the cleaned page verbatim")
    val removed = got(1)._6.get
    assert(removed >= 8L, s"span surgery must remove >=8 tokens: $removed")
    assert(!got(1)._7.get.contains("notice all rights reserved"),
      "the duplicated span must be gone from the later page")
    assert(got(2)._6 === Some(0L))
  }

  test("substr coupling, both directions: the near stage provably " +
       "CANNOT touch the footer (one shared line keeps Jaccard far " +
       "below the bar), the substr stage provably excises it") {
    val span = "copyright notice all rights reserved by the archive team."
    val pageA = goodPage + "\n" + span
    val pageB = longLine2.replace("beta", "zeta") + "\n" +
      longLine1.replace("alpha", "eta") + "\n" + span
    val staged = Seq(1L -> pageA, 4L -> pageB).toDF("doc_id", "text")
    val near = Text.webPipelineNear(staged).orderBy(col("doc_id"))
      .as[(Long, Boolean, String, Option[Long], Option[Double])].collect()
    assert(near.map(_._3).toSeq === Seq("kept", "kept"),
      "one shared footer line must NOT near-merge unrelated pages")
    val sub = Text.webPipelineSubstr(staged).orderBy(col("doc_id"))
      .as[(Long, Boolean, String, Option[Long], Option[Double],
           Option[Long], Option[String])].collect()
    assert(sub.map(_._3).toSeq === Seq("kept", "substr_pruned"))
  }

  test("WebSpanLine design invariants: C4 keeps it, its words 2..9 are " +
       "one 8-token window, it carries a stop word") {
    val sl = Text.WebSpanLine
    assert(sl.endsWith(".") && sl.split(" ").length === 9,
      "span line must be 9 words with a terminal '.' — words 2..9 " +
      "form the page-independent 8-gram after newline gluing")
    assert(sl.split(" ").contains("the"),
      "span line must carry a Gopher stop word")
  }

  test("web_pipeline_substr registration: substr_pruned live at " +
       "sf0.001; every kept 19-divisible page except the first " +
       "surviving occurrence is pruned, and its text_dedup drops " +
       "exactly the excised tokens") {
    val rows = SparkEntry.queries("web_pipeline_substr")(spark,
        "/root/testdata/sf0.001")
      .as[(Long, Boolean, String, Option[Long], Option[Double],
           Option[Long], Option[String])].collect()
    val byStatus = rows.groupBy(_._3).view.mapValues(_.length).toMap
    for (c <- Seq("kept", "exact_dup", "near_dup", "substr_pruned",
                  "c4_page", "gopher_repetition", "gopher_line_dup",
                  "gopher_quality"))
      assert(byStatus.getOrElse(c, 0) > 0, s"class '$c' empty")
    // the planted class: among surviving (kept|pruned) pages at %19,
    // exactly the non-first ones are pruned
    val planted = rows.filter(r => r._1 % 19 == 0 && r._1 < 100000L &&
      (r._3 == "kept" || r._3 == "substr_pruned")).sortBy(_._1)
    assert(planted.length > 2, "too few surviving planted pages")
    // the first surviving carrier owns the span's first occurrence —
    // its FOOTER must survive (the page itself may still be pruned by
    // a NATURAL cross-page 8-gram repeat elsewhere in its text; the
    // corpus has ~1e3 of those, which is exactly why the stage exists)
    assert(planted.head._7.exists(_.contains("notice all rights reserved")),
      s"page ${planted.head._1}: the first occurrence of the footer " +
      "must survive the surgery")
    assert(planted.tail.forall(_._3 == "substr_pruned"),
      "every later surviving footer page must be pruned: " +
        planted.tail.filter(_._3 != "substr_pruned").take(3).mkString(","))
    for (p <- planted.tail) {
      assert(p._6.exists(_ >= 8L), s"page ${p._1}: span removal count")
      assert(p._7.exists(!_.contains("notice all rights reserved")),
        s"page ${p._1}: span text still present after surgery")
    }
    // n_removed/text_dedup are NULL off the surviving classes
    for (r <- rows if r._3 != "kept" && r._3 != "substr_pruned")
      assert(r._6.isEmpty && r._7.isEmpty,
        s"row ${r._1}: surgery columns on status ${r._3}")
  }

  // ---- streaming near face ---------------------------------------------

  test("streaming_web_pipeline_near: the streamed staging + batch " +
       "near readout is row-identical to batch web_pipeline_near " +
       "(same function values, same oracle)") {
    val dir = "/root/testdata/sf0.001"
    val streamed =
      SparkEntry.queries("streaming_web_pipeline_near")(spark, dir)
    val batch = SparkEntry.queries("web_pipeline_near")(spark, dir)
    val k = (df: org.apache.spark.sql.DataFrame) =>
      df.collect().map(_.toSeq).toSet
    assert(k(streamed) === k(batch))
    assert(streamed.count() > 0)
  }
}
