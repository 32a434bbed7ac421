package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Changelog, Distribute}

/** Round-6 sixth wave: incremental aggregate maintenance and join
  * cardinality estimation.
  */
class Wave6Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("maintainAgg == full recompute, including keys seen only on one " +
       "side of the tick") {
    val corpus = Seq(("a", 1.0), ("a", 2.0), ("b", 5.0)).toDF("k", "v")
    val batch = Seq(("a", 10.0), ("c", 7.0)).toDF("k", "v") // c is new
    val maintained = Changelog.maintainAgg(
        Changelog.buildAgg(corpus, Seq("k"), col("v")),
        batch, Seq("k"), col("v"))
      .select(col("k"), col("n"), col("s").cast("double"), col("mn"), col("mx"))
      .as[(String, Long, Double, Double, Double)].collect().toSet
    val full = Changelog.buildAgg(corpus.unionByName(batch), Seq("k"), col("v"))
      .select(col("k"), col("n"), col("s").cast("double"), col("mn"), col("mx"))
      .as[(String, Long, Double, Double, Double)].collect().toSet
    assert(maintained === full)
    assert(maintained.map(_._1) === Set("a", "b", "c"))
  }

  test("curationReport: stage counts are mutually consistent") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val r = SparkEntry.queries("curation_report")(spark, "/root/testdata/sf0.001")
      .as[(Long, Long, Long, Long, Long, Long)].head()
    val (nDocs, tokensTotal, nExact, nPairs, nClusters, tokensKept) = r
    assert(nDocs === docs.count())
    assert(nExact <= nDocs) // exact dedup can only shrink
    // every near-dup pair merges at least one doc away, and a cluster
    // of size s accounts for at most s(s-1)/2 pairs
    assert(nClusters < nDocs && nClusters >= nDocs - nPairs)
    assert(tokensKept <= tokensTotal && tokensKept > 0)
    assert(nPairs > 0)
  }

  test("streamingAggMaintain: the live view equals the batch recompute") {
    val sf = "/root/testdata/sf0.001"
    val e = Tables.events(spark, sf)
    val live = graft.streaming.Streaming.streamingAggMaintain(spark, e,
        Seq("user_id", "event_type"),
        s"/tmp/graft-test-aggm-${System.nanoTime()}")
      .select(col("user_id"), col("event_type"), col("n"),
        col("s").cast("double"), col("mn"), col("mx"))
      .as[(Long, String, Long, Double, Double, Double)].collect().toSet
    val batch = Changelog.buildAgg(e, Seq("user_id", "event_type"),
        col("value"))
      .select(col("user_id"), col("event_type"), col("n"),
        col("s").cast("double"), col("mn"), col("mx"))
      .as[(Long, String, Long, Double, Double, Double)].collect().toSet
    assert(live === batch)
    assert(live.nonEmpty)
  }

  test("joinCardinalityEst: rate=1 degenerates to the exact count") {
    // self-join sizes: key x (3 rows) -> 9, key y (2 rows) -> 4
    val df = Seq(1L, 1L, 1L, 2L, 2L).toDF("k")
    val out = Distribute.joinCardinalityEst(df, col("k"), df, col("k"),
        rate = 1)
      .as[(Long, Long, Double)].head()
    assert(out === ((13L, 13L, 1.0)))
  }

  test("joinCardinalityEst: the estimate is sample-scaled and unbiased " +
       "over the key space") {
    val df = (1L to 64L).flatMap(k => Seq.fill(3)(k)).toDF("k")
    val (est, exact, ratio) = Distribute.joinCardinalityEst(
      df, col("k"), df, col("k"), rate = 8)
      .as[(Long, Long, Double)].head()
    assert(exact === 64 * 9)
    assert(est % 8 === 0 && est > 0)
    assert(ratio === est.toDouble / exact)
  }
}
