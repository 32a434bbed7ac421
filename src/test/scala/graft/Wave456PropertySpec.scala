package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Changelog, Graph, Temporal}

/** Property-style tests (seeded random inputs, reference implementations
  * in plain Scala) for the round-6 continuation operators — the
  * invariants the hash oracle can't state generically.
  */
class Wave456PropertySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val rnd = new scala.util.Random(11)

  test("maintainAgg == full recompute on random corpora and batches " +
       "(split-independence: any batching of the feed yields one table)") {
    for (_ <- 1 to 4) {
      val all = Seq.fill(30 + rnd.nextInt(40))(
        (rnd.nextInt(6).toLong, math.round(rnd.nextDouble() * 1e4) / 100.0))
      val cut = rnd.nextInt(all.length)
      val (corpus, batch) = all.splitAt(cut)
      val maintained = Changelog.maintainAgg(
          Changelog.buildAgg(corpus.toDF("k", "v"), Seq("k"), col("v")),
          batch.toDF("k", "v"), Seq("k"), col("v"))
        .select(col("k"), col("n"), col("s").cast("double"), col("mn"), col("mx"))
        .as[(Long, Long, Double, Double, Double)].collect().toSet
      val full = Changelog.buildAgg(all.toDF("k", "v"), Seq("k"), col("v"))
        .select(col("k"), col("n"), col("s").cast("double"), col("mn"), col("mx"))
        .as[(Long, Long, Double, Double, Double)].collect().toSet
      assert(maintained === full, s"cut=$cut")
    }
  }

  test("bfsHops matches a plain-Scala BFS on random graphs") {
    for (_ <- 1 to 3) {
      val n = 12 + rnd.nextInt(10)
      val edges = Seq.fill(n * 2)(
        (s"n${rnd.nextInt(n)}", s"n${rnd.nextInt(n)}")).filter(e => e._1 != e._2)
      val seeds = Seq(s"n0", s"n${rnd.nextInt(n)}").distinct
      val maxHops = 3
      // reference BFS over the undirected graph
      val adj = (edges ++ edges.map(_.swap))
        .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).toSet }
      var dist = seeds.map(_ -> 0).toMap
      var frontier = seeds.toSet
      for (h <- 1 to maxHops) {
        val next = frontier.flatMap(adj.getOrElse(_, Set.empty)) -- dist.keySet
        dist = dist ++ next.map(_ -> h)
        frontier = next
      }
      val got = Graph.bfsHops(spark, edges.toDF("src", "dst"),
          seeds.toDF("node"), maxHops)
        .as[(String, Int)].collect().toMap
      assert(got === dist)
    }
  }

  test("triangleCount: K4 + pendant, and random graphs vs brute force") {
    // K4 {a,b,c,d} has 4 triangles, every K4 node sits in 3; pendant e
    // hangs off a with none
    val k4 = for {
      x <- Seq("a", "b", "c", "d"); y <- Seq("a", "b", "c", "d")
      if x < y
    } yield (x, y)
    val got = Graph.triangleCount(spark, (k4 :+ ("a", "e")).toDF("a", "b"))
      .as[(String, Long, Long)].collect()
      .map { case (n, d, t) => n -> ((d, t)) }.toMap
    assert(got("a") === ((4L, 3L)) && got("b") === ((3L, 3L)) &&
      got("c") === ((3L, 3L)) && got("d") === ((3L, 3L)) &&
      got("e") === ((1L, 0L)))

    for (_ <- 1 to 3) {
      val n = 10 + rnd.nextInt(8)
      val edges = Seq.fill(n * 3)((rnd.nextInt(n), rnd.nextInt(n)))
      val canon = edges.collect {
        case (x, y) if x != y => (math.min(x, y), math.max(x, y))
      }.toSet
      val nodes = canon.flatMap(e => Seq(e._1, e._2))
      val tris = for {
        x <- nodes.toSeq; y <- nodes.toSeq; z <- nodes.toSeq
        if x < y && y < z &&
          canon((x, y)) && canon((y, z)) && canon((x, z))
      } yield (x, y, z)
      val ref = nodes.map { v =>
        v.toLong -> (canon.count(e => e._1 == v || e._2 == v).toLong,
          tris.count(t => t._1 == v || t._2 == v || t._3 == v).toLong)
      }.toMap
      val gotR = Graph.triangleCount(spark,
          edges.toDF("a", "b").select(col("a").cast("long").as("a"),
            col("b").cast("long").as("b")))
        .as[(Long, Long, Long)].collect()
        .map { case (v, d, t) => v -> (d, t) }.toMap
      assert(gotR === ref)
    }
  }

  test("funnelWindowed matches a plain-Scala fold on random event logs") {
    val types = Seq("view", "click", "purchase", "other")
    for (_ <- 1 to 4) {
      val w = 100L
      val ev = Seq.fill(60 + rnd.nextInt(60))(
        (rnd.nextInt(5).toLong, rnd.nextInt(1000).toLong,
          types(rnd.nextInt(types.length))))
      // reference: anchored earliest-completion chain
      val ref = ev.groupBy(_._1).flatMap { case (u, es) =>
        val byType = (t: String) => es.filter(_._3 == t).map(_._2).sorted
        byType("view").headOption.map { t1 =>
          val t2 = byType("click").find(t => t >= t1 && t <= t1 + w)
          val t3 = t2.flatMap(c =>
            byType("purchase").find(t => t >= c && t <= c + w))
          u -> (if (t3.isDefined) 3 else if (t2.isDefined) 2 else 1)
        }
      }
      val got = Temporal.funnelWindowed(
          ev.toDF("u", "sec", "et")
            .select(col("u"), timestamp_seconds(col("sec")).as("ts"), col("et")),
          col("u"), col("ts"), col("et"),
          ("view", "click", "purchase"), windowSec = w)
        .select("user_id", "reached_step").as[(Long, Int)].collect().toMap
      assert(got === ref)
    }
  }
}
