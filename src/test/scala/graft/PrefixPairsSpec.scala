package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Optimization round 15: [[graft.ops.TextDedup.jaccardPairsPrefix]] —
  * the Bayardo prefix-filtered shape `jaccardPairsOn` dispatches to on
  * large corpora — must emit EXACTLY the rows of the posting-expansion
  * shape it replaces, including every boundary the equivalence argument
  * leans on: the df cap engaging (pairs whose every shared shingle is
  * capped out are missed by BOTH sides), docs whose capped list is
  * empty (no prefix), exact-threshold jaccard (ceil boundary), and the
  * real events slice both shapes serve in production.
  */
class PrefixPairsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def pairsBoth(docs: org.apache.spark.sql.DataFrame,
                        threshold: Double, maxDf: Int) = {
    val shA = graft.ops.TextDedup.shingles(docs, 3)
    val shB = graft.ops.TextDedup.shingles(docs, 3)
    val a = graft.ops.TextDedup
      .jaccardPairsPosting(shA, threshold, maxDf)
      .orderBy("doc_a", "doc_b").collect().toSeq
    val b = graft.ops.TextDedup
      .jaccardPairsPrefix(shB, threshold, maxDf)
      .orderBy("doc_a", "doc_b").collect().toSeq
    (a, b)
  }

  test("prefix == posting where the df cap ENGAGES: boilerplate-only " +
    "overlap is missed by BOTH shapes, rare-shingle twins survive") {
    val core = "alpha beta gamma delta epsilon zeta"
    val docs = (
      // 8 boilerplate docs: every shared shingle has df = 8 > cap 4, so
      // their (true-jaccard ≈ 1) pairs are invisible to the capped
      // semantics on both sides
      (0 until 8).map(i => (i.toLong, s"$core")) ++ Seq(
        // rare twins: 3 shared df=2 shingles, J = 3/(4+4-3) = 0.6
        (100L, "s1 s2 s3 s4 s5 s6"),
        (101L, "s1 s2 s3 s4 s5 s7"))
    ).toDF("doc_id", "text")
    val (a, b) = pairsBoth(docs, 0.5, 4)
    assert(a == b)
    assert(a.map(r => (r.getLong(0), r.getLong(1))) == Seq((100L, 101L)))
  }

  test("prefix == posting at the EXACT-threshold boundary (J = 0.5, " +
    "ceil(t*n) integral) and with empty-capped-list docs") {
    val docs = Seq(
      // n = 3 shingles each, inter = 2, J = 2/(3+3-2) = 0.5 exactly
      (1L, "a b c d e"),
      (2L, "a b c d f"),
      // ultra-common one-shingle docs: df("m m m") = 5 > cap 4 — their
      // capped lists are empty; true-exact duplicates, both shapes miss
      (3L, "m m m"), (4L, "m m m"), (5L, "m m m"),
      (6L, "m m m"), (7L, "m m m"),
      (8L, "p q r s t")
    ).toDF("doc_id", "text")
    val (a, b) = pairsBoth(docs, 0.5, 4)
    assert(a == b)
    assert(a.exists(r => r.getLong(0) == 1L && r.getLong(1) == 2L &&
      r.getDouble(2) == 0.5))
  }

  test("prefix == posting on the real sf0.001 events slice (the corpus " +
    "family the size dispatch routes to the prefix shape at sf0.1)") {
    val dir = "/root/testdata/sf0.001"
    val ev = graft.Tables.events(spark, dir)
      .select(col("event_id").as("doc_id"),
        concat_ws(" ", lit("u"), col("user_id").cast("string"),
          col("event_type"),
          expr("CAST(round(value*100) AS BIGINT) div 10000")
            .cast("string")).as("text"))
    val (a, b) = pairsBoth(ev, 0.5, 100)
    assert(a.nonEmpty)
    assert(a == b)
  }
}
