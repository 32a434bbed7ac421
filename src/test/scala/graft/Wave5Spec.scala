package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Distribute, Graph, Temporal, TextDedup}

/** Round-6 fifth wave: BFS reachability, skew diagnosis, the streaming
  * near-dup ingest tick, and the windowed funnel.
  */
class Wave5Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("bfsHops: min-hop on a chain, exploration stops at maxHops") {
    val edges = Seq(("a", "b"), ("b", "c"), ("c", "d"), ("d", "e"),
      ("x", "y")).toDF("src", "dst")
    val seeds = Seq("a").toDF("node")
    val out = Graph.bfsHops(spark, edges, seeds, maxHops = 3)
      .as[(String, Int)].collect().toMap
    // undirected chain: a=0, b=1, c=2, d=3; e beyond maxHops; x/y
    // disconnected
    assert(out === Map("a" -> 0, "b" -> 1, "c" -> 2, "d" -> 3))
  }

  test("bfsHops: a node reachable two ways gets the MINIMUM hop") {
    // triangle a-b, b-c, a-c: c is at hop 1 via the direct edge
    val edges = Seq(("a", "b"), ("b", "c"), ("a", "c")).toDF("src", "dst")
    val out = Graph.bfsHops(spark, edges, Seq("a").toDF("node"), 3)
      .as[(String, Int)].collect().toMap
    assert(out === Map("a" -> 0, "b" -> 1, "c" -> 1))
  }

  test("skewDiagnose: shares and running concentration are exact") {
    val df = (Seq.fill(6)("hot") ++ Seq.fill(3)("warm") ++ Seq("cold"))
      .toDF("k")
    val out = Distribute.skewDiagnose(df, col("k"), topN = 2)
      .select("key", "n", "rank", "share", "cum_share")
      .as[(String, Long, Int, Double, Double)].collect().sortBy(_._3)
    assert(out.map(r => (r._1, r._2, r._3)).toSeq ===
      Seq(("hot", 6L, 1), ("warm", 3L, 2)))
    assert(out(0)._4 === 0.6 && out(0)._5 === 0.6)
    assert(out(1)._4 === 0.3 && out(1)._5 === 0.9)
  }

  test("streamingBandsFor is bucket-compatible with the batch aggregate " +
       "index: identical (doc, band, key) sets on a real corpus") {
    val docs = Tables.documents(spark, sf).limit(100)
    val viaAgg = TextDedup.corpusBucketTable(docs)
      .select("doc_id", "band", "key").as[(Long, Int, String)]
      .collect().toSet
    val viaExpr = docs
      .select(col("doc_id"),
        explode(TextDedup.streamingBandsFor(col("text"))).as("bk"))
      .select(col("doc_id"), col("bk.band"), col("bk.key"))
      .as[(Long, Int, String)].collect().toSet
    // the agg path has no row for shingle-less docs; the expr path emits
    // sentinel (Long.MaxValue-fold) keys for them — restrict to docs the
    // index holds, which is exactly the probe-join semantics
    val indexed = viaAgg.map(_._1)
    assert(viaAgg === viaExpr.filter(t => indexed(t._1)))
    assert(viaAgg.nonEmpty)
  }

  test("streamingNearDup equals the batch ingest tick exactly") {
    val docs = Tables.documents(spark, sf)
    val batch = TextDedup.nearDupIncremental(
        corpus = docs.filter(col("doc_id") % 10 =!= 0),
        batch = docs.filter(col("doc_id") % 10 === 0))
      .as[(Long, Long, Double)].collect().toSet
    val streamed = graft.streaming.Streaming.streamingNearDup(spark, docs,
        s"/tmp/graft-test-neardup-${System.nanoTime()}")
      .as[(Long, Long, Double)].collect().toSet
    assert(streamed === batch)
    assert(streamed.nonEmpty)
  }

  test("funnelWindowed: an out-of-window step breaks the chain; an " +
       "eligible later event completes it") {
    val ev = Seq(
      // user 1: view, click 1h later, purchase 2h after click => 3 steps
      (1L, "2024-01-01 00:00:00", "view"),
      (1L, "2024-01-01 01:00:00", "click"),
      (1L, "2024-01-01 03:00:00", "purchase"),
      // user 2: click is 2 DAYS after the view => chain breaks at 1
      (2L, "2024-01-01 00:00:00", "view"),
      (2L, "2024-01-03 00:00:00", "click"),
      (2L, "2024-01-03 00:30:00", "purchase"),
      // user 3: pre-view click must NOT match; the in-window one does
      (3L, "2024-01-01 05:00:00", "click"),
      (3L, "2024-01-01 06:00:00", "view"),
      (3L, "2024-01-01 07:00:00", "click")
    ).toDF("u", "ts_s", "et")
      .select(col("u"), col("ts_s").cast("timestamp").as("ts"), col("et"))
    val out = Temporal.funnelWindowed(ev, col("u"), col("ts"), col("et"),
        ("view", "click", "purchase"), windowSec = 86400L)
      .select("user_id", "reached_step").as[(Long, Int)].collect().toMap
    assert(out === Map(1L -> 3, 2L -> 1, 3L -> 2))
  }
}
