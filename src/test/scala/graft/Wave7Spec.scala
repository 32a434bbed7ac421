package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Similarity, Text, TextDedup}

/** Round-6 seventh wave: stride-1 exact-substring report, hard-negative
  * mining, variant extraction, segment-level language ID.
  */
class Wave7Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("exactSubstrReport: stride-1 catches an UNALIGNED copy that " +
       "chunk-aligned paragraph dedup misses") {
    val shared = (1 to 8).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      (1L, s"$shared tail1 tail2"),
      // doc 2 embeds the same 8-gram OFFSET by three words
      (2L, s"pre1 pre2 pre3 $shared post")
    ).toDF("doc_id", "text")
    val out = TextDedup.exactSubstrReport(docs, w = 8)
      .select("doc_id", "n_windows", "n_dup_windows")
      .as[(Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(out(1L) === ((3L, 0L))) // 10 words -> 3 windows, all first
    // doc 2: 12 words -> 5 windows; exactly the aligned copy is a dup
    assert(out(2L)._1 === 5L && out(2L)._2 === 1L)
    // chunk-aligned paragraph dedup sees NO duplication here
    val para = TextDedup.paragraphDedup(docs, chunkWords = 8)
      .select("doc_id", "n_chunks", "n_kept").as[(Long, Long, Long)]
      .collect()
    assert(para.forall(r => r._2 === r._3))
  }

  test("hardNegatives: every mined negative has a different label and " +
       "ranks by similarity") {
    val e = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val out = Similarity.hardNegatives(e, e.filter(col("vec_id") < 8), 3)
      .select("q_id", "q_label", "neg_label", "sim", "rank")
      .as[(Long, Int, Int, Double, Int)].collect()
    assert(out.nonEmpty)
    assert(out.forall(r => r._2 != r._3))
    out.groupBy(_._1).values.foreach { rs =>
      val sorted = rs.sortBy(_._5)
      assert(sorted.map(_._4).sliding(2).forall(p =>
        p.length < 2 || p(0) >= p(1))) // sim nonincreasing in rank
    }
  }

  test("segmentLangId flags a code-switching document whole-doc langId " +
       "would call monolingual") {
    val en = "the cat sat on a mat and the dog ran to a tree now then"
    val de = "der hund lief die strasse entlang der mann sah die frau dort an"
    val docs = Seq(
      (1L, s"$en $de", "xx"), // en chunk then de chunk
      (2L, en, "xx")
    ).toDF("doc_id", "text", "lang")
    val out = Text.segmentLangId(docs, chunkWords = 16)
      .select("doc_id", "n_segments", "majority_lang", "is_mixed")
      .as[(Long, Long, String, Boolean)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(out(1L) === ((2L, "de", true)) || out(1L) === ((2L, "en", true)))
    assert(out(2L)._3 === false)
    // whole-doc langId on doc 1 picks ONE language
    val whole = Text.langId(docs.filter(col("doc_id") === 1))
      .select("pred_lang").as[String].head()
    assert(Set("en", "de")(whole))
  }
}
