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
