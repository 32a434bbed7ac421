package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Graph, Linkage}

/** Property-style tests (seeded random inputs, plain-Scala reference
  * implementations) for the round-7 operators — the invariants the
  * hash oracle can't state generically.
  */
class Wave7PropertySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val rnd = new scala.util.Random(7)

  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  test("typoPairs == brute-force levenshtein=1 on random short strings") {
    for (round <- 1 to 4) {
      val alpha = "abc"
      val words = Seq.fill(40)(
        (1 to (1 + rnd.nextInt(4))).map(_ => alpha(rnd.nextInt(alpha.length)))
          .mkString).distinct
      val want = (for {
        a <- words; b <- words if a < b && lev(a, b) == 1
      } yield (a, b)).toSet
      val got = Linkage.typoPairs(words.toDF("w"), col("w"))
        .select("name_a", "name_b").as[(String, String)].collect().toSet
      assert(got === want, s"round=$round words=$words")
    }
  }

  test("linkPredict with cap >= max degree == plain-Scala exact " +
       "neighborhood Jaccard on random graphs") {
    for (round <- 1 to 3) {
      val n = 10 + rnd.nextInt(8)
      val edges = Seq.fill(n * 2)(
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter(e => e._1 != e._2)
        .map(e => (math.min(e._1, e._2), math.max(e._1, e._2))).distinct
      val adj = (edges ++ edges.map(_.swap))
        .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).toSet }
      val nodes = adj.keySet.toSeq.sorted
      val edgeSet = edges.toSet
      val want = (for {
        u <- nodes; v <- nodes
        if u < v && !edgeSet((u, v))
        cn = (adj(u) & adj(v)).size.toLong if cn >= 2L
      } yield (u, v, cn, adj(u).size.toLong, adj(v).size.toLong)).toSet
      val got = Graph.linkPredict(spark, edges.toDF("a", "b"),
          minCommon = 2L, maxCenterDegree = Int.MaxValue)
        .select("u", "v", "cn", "deg_u", "deg_v")
        .as[(Long, Long, Long, Long, Long)].collect().toSet
      assert(got === want, s"round=$round")
    }
  }

  test("linkPredict capped cn is a lower bound of exact cn, and exact " +
       "below the cap (the estimator contract)") {
    for (round <- 1 to 3) {
      val n = 14
      val edges = Seq.fill(n * 3)(
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter(e => e._1 != e._2)
        .map(e => (math.min(e._1, e._2), math.max(e._1, e._2))).distinct
      val adj = (edges ++ edges.map(_.swap))
        .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).toSet }
      val cap = 3
      val exact = Graph.linkPredict(spark, edges.toDF("a", "b"),
          minCommon = 1L, maxCenterDegree = Int.MaxValue)
        .select("u", "v", "cn").as[(Long, Long, Long)].collect()
        .map(r => (r._1, r._2) -> r._3).toMap
      val capped = Graph.linkPredict(spark, edges.toDF("a", "b"),
          minCommon = 1L, maxCenterDegree = cap)
        .select("u", "v", "cn").as[(Long, Long, Long)].collect()
        .map(r => (r._1, r._2) -> r._3).toMap
      capped.foreach { case (pair, cn) =>
        assert(cn <= exact(pair), s"pair=$pair round=$round")
        // pairs whose every shared neighbor is sub-cap must be exact
        val shared = adj(pair._1) & adj(pair._2)
        if (shared.forall(w => adj(w).size <= cap))
          assert(cn === exact(pair), s"pair=$pair round=$round")
      }
    }
  }

  test("bomRollup == plain-Scala recursive requirement explosion on " +
       "random forests") {
    for (round <- 1 to 4) {
      val n = 18
      // random forest: parent(i) < i ensures acyclicity
      val edges = (1 until n).flatMap { i =>
        if (rnd.nextBoolean()) Some((rnd.nextInt(i).toLong, i.toLong,
          1 + rnd.nextInt(4))) else None
      }
      if (edges.nonEmpty) {
        val children = edges.groupBy(_._1)
        def explode(node: Long, mult: Long): Seq[(Long, Long)] =
          children.getOrElse(node, Seq.empty).flatMap { case (_, c, q) =>
            (c, mult * q) +: explode(c, mult * q)
          }
        val want = children.keys.map { anc =>
          val desc = explode(anc, 1L)
          (anc, desc.size.toLong, desc.map(_._2).sum)
        }.toSet
        val got = Graph.bomRollup(spark, edges.toDF("parent", "child", "qty"),
            levels = n)
          .as[(Long, Long, Long)].collect().toSet
        assert(got === want, s"round=$round")
      }
    }
  }
}
