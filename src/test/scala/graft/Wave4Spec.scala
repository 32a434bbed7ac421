package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Assoc, Linkage, Profile, Similarity, Temporal, Text}

/** Round-6 fourth wave: record linkage, association mining, time-series
  * gap-fill, MAD outliers, BPE pair counts, and ANN recall evaluation.
  */
class Wave4Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("resolveEntities: blocking recall guarantee holds — every record " +
       "links at distance <= 1 (its true source is always a candidate)") {
    val out = SparkEntry.queries("entity_resolution")(spark, sf)
      .select("lev", "n_within").as[(Int, Long)].collect()
    assert(out.nonEmpty)
    // the true source name is at levenshtein 1 from the dirty name and
    // the prefix/suffix union blocking provably generates it (len >= 7),
    // so the best match can never be worse than 1
    assert(out.forall(_._1 <= 1))
    assert(out.forall(_._2 >= 1))
  }

  test("resolveEntities: prefix/suffix blocking finds a deletion at " +
       "every position of a 7-char name") {
    // len = 7 is the guarantee's boundary case: pos ranges over [1, 6]
    val recs = (0L until 6L).map(i => (i, "abcdefg")).toDF("id", "name")
    val out = Linkage.resolveEntities(recs, col("id"), col("name"))
      .select("rec_id", "lev").as[(Long, Int)].collect()
    assert(out.length === 6 && out.forall(_._2 === 1))
  }

  test("cooccurPmi: counts are basket-distinct and PMI matches ln by hand") {
    val facts = Seq(
      (1L, "a"), (1L, "b"), (1L, "b"), // duplicate (1, b) collapses
      (2L, "a"), (2L, "b"),
      (3L, "a"), (3L, "c"),
      (4L, "a"), (4L, "b")
    ).toDF("b", "i")
    val out = Assoc.cooccurPmi(facts, col("b"), col("i"), minSupport = 2)
      .as[(String, String, Long, Long, Long, Double)].collect()
    assert(out.length === 1)
    val (a, b, nab, na, nb, pmi) = out.head
    assert((a, b, nab, na, nb) === ("a", "b", 3L, 4L, 3L))
    // PMI = ln(n_ab * N / (n_a * n_b)) = ln(3*4 / (4*3)) = 0
    assert(pmi === 0.0)
  }

  test("tsGapfill: grid is complete, gaps carry the last close forward") {
    val ev = Seq(
      (1L, "2024-01-01 10:00:00", 10L, 1.0),
      (1L, "2024-01-01 11:00:00", 11L, 2.0), // day close = 2.0
      (1L, "2024-01-04 09:00:00", 12L, 5.0), // 2-day gap
      (2L, "2024-01-02 08:00:00", 13L, 7.0)
    ).toDF("u", "ts_s", "id", "v")
      .select(col("u"), col("ts_s").cast("timestamp").as("ts"), col("id"), col("v"))
    val out = Temporal.tsGapfill(ev, col("u"), col("ts"), col("id"), col("v"))
      .select(col("entity"), col("day").cast("string"), col("n"), col("close_ffill"))
      .as[(Long, String, Long, Option[Double])].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    // 2 entities x 4 days (2024-01-01 .. 2024-01-04)
    assert(out.size === 8)
    assert(out((1L, "2024-01-02")) === ((0L, Some(2.0)))) // gap, ffilled
    assert(out((1L, "2024-01-04")) === ((1L, Some(5.0))))
    assert(out((2L, "2024-01-01")) === ((0L, None))) // before first event
    assert(out((2L, "2024-01-03")) === ((0L, Some(7.0))))
  }

  test("madOutliers: flags exactly the rows beyond 3 MADs; the estimator " +
       "survives an extreme outlier that would drag a mean") {
    // values 1..9 (median 5, MAD 2) plus a catastrophic 1e6
    val rows = ((1 to 9).map(_.toDouble) :+ 1e6).zipWithIndex
      .map { case (v, i) => (i.toLong, "g", v) }.toDF("id", "g", "v")
    val out = Profile.madOutliers(rows, col("g"), col("v"), Seq("id"))
      .select("value").as[Double].collect()
    // |x - 5| > 6 flags only the 1e6 row (a z-score vs mean ~1e5 and
    // sd ~3e5 would flag nothing at 3 sigma)
    assert(out.toSeq === Seq(1e6))
  }

  test("bpePairs: hand corpus — most frequent adjacent pair wins") {
    val docs = Seq((1L, "abab abab"), (2L, "abba")).toDF("doc_id", "text")
    val out = Text.bpePairs(docs, topN = 3)
      .select("pair", "n", "rank").as[(String, Long, Int)].collect()
      .sortBy(_._3)
    // "ab": 2 per "abab" word (x2) + 1 in "abba" = 5; "ba": 1+1+0...
    // "abab" pairs: ab, ba, ab; "abba": ab, bb, ba
    assert(out.head === (("ab", 5L, 1)))
    assert(out.map(_._1).toSet === Set("ab", "ba", "bb"))
  }

  test("annRecall: perfect recall when the index searches every list") {
    val e = Tables.embeddings(spark, sf)
    // nprobe == nlist => IVF degenerates to exhaustive search
    val out = Similarity.annRecall(e, e.filter(col("vec_id") < 8), k = 3,
        nlist = 4, nprobe = 4)
      .select("recall").as[Double].collect()
    assert(out.length === 8)
    assert(out.forall(_ === 1.0))
  }
}
