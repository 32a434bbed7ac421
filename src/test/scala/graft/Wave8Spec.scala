package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Changelog, Graph, Temporal, Text}

/** Round-6 eighth wave: EWMA smoothing, weighted shortest paths,
  * snapshot diff, and ranked retrieval.
  */
class Wave8Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("ewmaSmooth: the fold is the textbook recurrence in timestamp order") {
    val ev = Seq(
      (1L, 10L, 100L, 8.0), (1L, 20L, 101L, 4.0), (1L, 30L, 102L, 2.0),
      (2L, 10L, 103L, 5.0)
    ).toDF("u", "sec", "id", "v")
      .select(col("u"), timestamp_seconds(col("sec")).as("ts"),
        col("id"), col("v"))
    val out = Temporal.ewmaSmooth(ev, col("u"), col("ts"), col("id"),
        col("v"))
      .select("entity", "n_events", "last_value", "ewma")
      .as[(Long, Long, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    // s1=8, s2=0.5*8+0.5*4=6, s3=0.5*6+0.5*2=4
    assert(out(1L) === ((1L, 3L, 2.0, 4.0)))
    assert(out(2L) === ((2L, 1L, 5.0, 5.0))) // single event: ewma = x1
  }

  test("ewmaSmooth is ingestion-order independent (total order is (ts, id))") {
    val rows = Seq((1L, 30L, 3L, 2.0), (1L, 10L, 1L, 8.0), (1L, 20L, 2L, 4.0))
    def run(rs: Seq[(Long, Long, Long, Double)]) =
      Temporal.ewmaSmooth(
        rs.toDF("u", "sec", "id", "v")
          .select(col("u"), timestamp_seconds(col("sec")).as("ts"),
            col("id"), col("v")),
        col("u"), col("ts"), col("id"), col("v"))
        .select("ewma").as[Double].head()
    assert(run(rows) === run(rows.reverse))
  }

  test("shortestPaths relaxes a cheaper multi-hop route below a direct edge") {
    // a-b (1), b-c (1), a-c (10): best a->c is 2 via b
    val edges = Seq(("a", "b", 1L), ("b", "c", 1L), ("a", "c", 10L))
      .toDF("src", "dst", "w")
    val out = Graph.shortestPaths(spark, edges, Seq("a").toDF("node"),
        rounds = 4)
      .as[(String, Long)].collect().toMap
    assert(out === Map("a" -> 0L, "b" -> 1L, "c" -> 2L))
  }

  test("shortestPaths: parallel edges collapse to the min weight") {
    val edges = Seq(("a", "b", 7L), ("a", "b", 3L)).toDF("src", "dst", "w")
    val out = Graph.shortestPaths(spark, edges, Seq("a").toDF("node"), 2)
      .as[(String, Long)].collect().toMap
    assert(out === Map("a" -> 0L, "b" -> 3L))
  }

  test("snapshotDiff emits exactly the adds/removes/changes") {
    val old = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "p")
    val nw = Seq((2L, "b"), (3L, "C"), (4L, "d")).toDF("k", "p")
    val out = Changelog.snapshotDiff(old, nw, Seq("k"), Seq("p"))
      .as[(Long, String)].collect().toMap
    assert(out === Map(1L -> "removed", 3L -> "changed", 4L -> "added"))
  }

  test("searchRanked: more query-term occurrences rank higher; ties " +
       "break by doc id") {
    val docs = Seq(
      (1L, "alpha beta alpha"),   // tf(alpha)=2
      (2L, "alpha gamma"),        // tf(alpha)=1
      (3L, "beta beta beta"),     // tf(beta)=3
      (4L, "gamma gamma")         // no query terms
    ).toDF("doc_id", "text")
    val out = Text.searchRanked(docs, Seq("alpha", "beta"), k = 10)
      .select("doc_id", "rank").as[(Long, Int)].collect().toMap
    // df(alpha)=2, df(beta)=2 -> scores: d1=2/2+1/2=1.5, d3=3/2=1.5, d2=0.5
    assert(out(1L) === 1 && out(3L) === 2 && out(2L) === 3) // tie: doc 1 < 3
    assert(!out.contains(4L))
  }
}
