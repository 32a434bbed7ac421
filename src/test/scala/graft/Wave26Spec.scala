package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Graph

/** Round-8 twenty-fifth wave: alternating large-star/small-star
  * connected components (diameter-independent round count).
  */
class Wave26Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Plain-Scala union-find reference: (node -> min id in component). */
  private def unionFind(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    // path-compress everything, then label = root (root is the min id
    // because unions always hang the larger root under the smaller)
    nodes.map(n => n -> find(n)).toMap
  }

  private def ccStar(edges: Seq[(Long, Long)],
                     maxRounds: Int = 24): Map[Long, Long] = {
    val df = edges.toDF("src", "dst")
    val out = Graph.connectedComponentsStar(spark, df, maxRounds)
      .as[(Long, Long)].collect().toMap
    // representatives/singletons label themselves implicitly
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    nodes.map(n => n -> out.getOrElse(n, n)).toMap
  }

  test("connectedComponentsStar: path graph converges far under O(diameter)") {
    // a 64-node path has diameter 63: min-label propagation needs 63
    // rounds; the star algorithm must finish inside the default 24
    val path = (0L until 63L).map(i => (i, i + 1))
    val got = ccStar(path)
    assert(got === (0L to 63L).map(_ -> 0L).toMap)
  }

  test("connectedComponentsStar: matches union-find on a mixed graph") {
    // three components, duplicate + self + reversed edges, id gaps
    val edges = Seq(
      (5L, 9L), (9L, 5L), (9L, 12L), (12L, 40L), (40L, 5L), // comp 5
      (7L, 7L),                                             // self-loop
      (100L, 101L), (103L, 101L),                           // comp 100
      (200L, 300L))                                         // comp 200
    val got = ccStar(edges)
    val want = unionFind(edges)
    assert(got === want)
    assert(got(40L) === 5L && got(103L) === 100L && got(7L) === 7L)
  }

  test("connectedComponentsStar: randomized against union-find") {
    val rnd = new scala.util.Random(8)
    val edges = Seq.fill(300)((rnd.nextInt(120).toLong, rnd.nextInt(120).toLong))
      .filter(e => e._1 != e._2)
    assert(ccStar(edges) === unionFind(edges))
  }

  test("connectedComponentsStar: empty edge set yields no labels") {
    val df = Seq.empty[(Long, Long)].toDF("src", "dst")
    assert(Graph.connectedComponentsStar(spark, df).count() === 0L)
  }
}
