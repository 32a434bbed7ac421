package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Text

/** Round-14 wave 36: the near-dedup stage on the web front door
  * (`web_pipeline_near` — the fused chain's kept canonicals through
  * MinHash+LSH banding and exact-Jaccard verification, eighth status
  * class `near_dup`). Hand-built pages with known verdicts, the
  * planted near-twin coupling proof in BOTH directions (exact dedup
  * cannot merge the twin; near-dedup must), and the WebNearLine design
  * invariants the staged-corpus injection rests on.
  */
class Wave36Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def runNear(pages: Seq[(Long, String)]) =
    Text.webPipelineNear(pages.toDF("doc_id", "text"))
      .orderBy(col("doc_id"))
      .as[(Long, Boolean, String, Option[Long], Option[Double])].collect()

  private val longLine1 = (1 to 30).map(i => s"alpha$i").mkString(" ") +
    " the quick brown fox jumps high today."
  private val longLine2 = (1 to 30).map(i => s"beta$i").mkString(" ") +
    " the calm river flows gently south now."
  private val goodPage = longLine1 + "\n" + longLine2

  test("webPipelineNear: kept / exact_dup / near_dup land on their " +
       "hand-built pages, with partner and jaccard") {
    val para = goodPage + "\n" + Text.WebNearLine
    val other = longLine2.replace("beta", "zeta") + "\n" +
      longLine1.replace("alpha", "eta")
    val got = runNear(Seq(1L -> goodPage, 2L -> goodPage, 3L -> para,
      4L -> other))
    assert(got.map(r => (r._1, r._3)).toSeq === Seq(1L -> "kept",
      2L -> "exact_dup", 3L -> "near_dup", 4L -> "kept"))
    assert(got(2)._4 === Some(1L), "near twin must resolve to the page")
    val j = got(2)._5.get
    assert(j >= 0.5 && j < 1.0, s"paraphrase jaccard out of band: $j")
    // kept rows: canonical = self, no jaccard; exact dups keep theirs
    assert(got(0)._4 === Some(1L) && got(0)._5.isEmpty)
    assert(got(1)._4 === Some(1L) && got(1)._5.isEmpty)
    assert(got(3)._4 === Some(4L) && got(3)._5.isEmpty)
  }

  test("near-twin coupling, both directions: exact dedup provably " +
       "CANNOT merge the paraphrase (web_pipeline leaves it kept); " +
       "the near stage provably DOES") {
    val para = goodPage + "\n" + Text.WebNearLine
    val staged = Seq(1L -> goodPage, 3L -> para)
    // direction 1: without the near stage the twin survives as its own
    // canonical — its content hash differs, exact dedup is blind to it
    val exactOnly = Text.webPipeline(staged.toDF("doc_id", "text"))
      .orderBy(col("doc_id"))
      .as[(Long, Boolean, String, Option[Long], Option[String])].collect()
    assert(exactOnly.map(_._3).toSeq === Seq("kept", "kept"),
      "exact dedup must NOT merge the paraphrase twin")
    // direction 2: the near stage merges it onto the page
    val near = runNear(staged)
    assert(near.map(_._3).toSeq === Seq("kept", "near_dup"))
    assert(near(1)._4 === Some(1L))
  }

  test("WebNearLine design invariants: C4 keeps it, quality is " +
       "untouched, one extra line stays far above the 0.5 jaccard bar") {
    val nl = Text.WebNearLine
    assert(nl.endsWith(".") && nl.split(" ").length === 3,
      "near line must survive the C4 line rule (terminal '.' + 3 words)")
    assert(nl.split(" ").contains("the"),
      "near line must carry a Gopher stop word so stop_pass holds")
    // jaccard floor on the SHORTEST page that can reach the near stage:
    // Gopher's 50-word floor bounds kept pages below, and one appended
    // 3-word line moves at most 3 boundary shingles + adds 3
    val words = (1 to 46).map(i => s"w$i").mkString(" ") + " the end."
    val page = words // exactly 49 space-split tokens + punctuation
    val pairs = graft.ops.TextDedup.nearDupJaccard(
      Seq((1L, page), (2L, page + "\n" + nl)).toDF("doc_id", "text"))
      .as[(Long, Long, Double)].collect()
    assert(pairs.length === 1 && pairs.head._3 > 0.8,
      s"one extra line must keep jaccard high near the word floor: " +
      pairs.mkString(","))
  }

  test("web_pipeline_near registration: all SEVEN status classes live " +
       "at sf0.001; every planted twin of a kept page is near_dup, " +
       "none is exact_dup") {
    val rows = SparkEntry.queries("web_pipeline_near")(spark,
        "/root/testdata/sf0.001")
      .as[(Long, Boolean, String, Option[Long], Option[Double])].collect()
    val byStatus = rows.groupBy(_._3).view.mapValues(_.length).toMap
    for (c <- Seq("kept", "exact_dup", "near_dup", "c4_page",
                  "gopher_repetition", "gopher_line_dup", "gopher_quality"))
      assert(byStatus.getOrElse(c, 0) > 0, s"class '$c' empty")
    val statusById = rows.map(r => r._1 -> r._3).toMap
    val twins = rows.filter(_._1 >= 200000L)
    assert(twins.nonEmpty, "no planted near twins staged")
    assert(twins.forall(_._3 !== "exact_dup"),
      "a planted twin hash-merged — the paraphrase failed to change " +
      "the content hash")
    assert(twins.forall(_._2), "twins ride the mojibake mirror: changed")
    for ((id, _, st, canon, j) <- twins) {
      val base = id - 200000L
      if (statusById(base) == "kept") {
        assert(st === "near_dup",
          s"twin $id of kept page $base must be near-merged, got $st")
        assert(canon.exists(_ <= base),
          s"twin $id: canonical ${canon} must be ≤ its page $base")
        assert(j.exists(_ >= 0.5), s"twin $id: verified jaccard missing")
      }
    }
    assert(twins.exists(t => statusById(t._1 - 200000L) == "kept"),
      "no twin has a kept base page — the coupling class is dead")
    // the ledger below the twin tier must carry web_pipeline's exact
    // semantics except for near re-statusing of KEPT rows only
    for ((id, _, st, canon, j) <- rows if id < 200000L) {
      if (st == "near_dup") {
        assert(canon.exists(_ < id) && j.exists(_ >= 0.5))
      } else assert(j.isEmpty, s"row $id: jaccard on non-near status $st")
      if (st == "exact_dup") assert(canon === Some(id - 100000L))
      if (st == "kept") assert(canon === Some(id))
    }
  }
}
