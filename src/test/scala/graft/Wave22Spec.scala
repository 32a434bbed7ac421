package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Scrub, Shard, Similarity}

/** Round-6 twenty-second wave: integer-exact PCA power iteration,
  * l-diversity audit, rendezvous sharding.
  */
class Wave22Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("pcaPower: recovers the dominant axis; max-|w| dim pins to ±1e6") {
    val vecs = Seq(
      (1L, Array(1.0f, 0.05f)), (2L, Array(0.9f, -0.02f)),
      (3L, Array(-1.0f, 0.01f)), (4L, Array(0.95f, 0.03f)))
      .toDF("vec_id", "embedding")
    val out = Similarity.pcaPower(vecs)
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    // normalization maps the max-|w| coordinate to exactly ±1e6
    assert(math.abs(out(0L)._2) === 1000000L)
    assert(math.abs(out(1L)._2) < 100000L) // minor axis stays small
  }

  test("pcaPower: matches a plain-Scala replay of the integer recurrence") {
    val data = Seq(
      (1L, Array(0.3f, -0.7f, 0.2f)), (2L, Array(-0.1f, 0.5f, 0.9f)),
      (3L, Array(0.8f, 0.1f, -0.4f)), (4L, Array(0.2f, 0.2f, 0.2f)))
    val q = data.map { case (_, xs) =>
      xs.map(x => math.round(x.toDouble * 1000000))
    }
    val d = 3
    var v = Array.fill(d)(BigInt(1000000))
    for (_ <- 1 to 6) {
      val u = q.map(row =>
        (0 until d).map(j => BigInt(row(j)) * v(j)).sum)
      val w = (0 until d).map(j =>
        q.indices.map(i => u(i) * BigInt(q(i)(j))).sum).toArray
      val s = w.map(_.abs).max
      v = w.map(wj =>
        if (s == 0) BigInt(0) else (wj + s) * 1000000 / s - 1000000)
    }
    val out = Similarity.pcaPower(data.toDF("vec_id", "embedding"))
      .as[(Long, Long, Double)].collect().sortBy(_._1)
    assert(out.map(_._2).toSeq === v.map(_.toLong).toSeq)
  }

  test("lDiversity: flags the homogeneous class only") {
    val df = Seq(
      ("a", 1L), ("a", 1L), ("a", 1L), // k=3 but one sensitive value
      ("b", 1L), ("b", 2L), ("b", 3L))
      .toDF("cls", "user_id")
    val out = Scrub.lDiversity(df, Seq(col("cls")), col("user_id"), l = 2)
      .as[(String, Long, Long)].collect()
    assert(out.toSeq === Seq(("a", 3L, 1L)))
  }

  test("rendezvousHash: matches a plain-Scala replay; few keys move") {
    val keys = (1L to 500L)
    def w(k: Long, s: Long) = {
      val x = (k * 1000003L + s * 7919L + 13L) % 1000000007L
      (x * x) % 1000000007L
    }
    def argmax(k: Long, n: Int): Long =
      (0L until n.toLong).maxBy(s => (w(k, s), s))
    val expected = keys.map(k => (argmax(k, 8), argmax(k, 9)))
      .groupBy(identity).map { case (p, g) => p -> g.size.toLong }
    val out = Shard.rendezvousHash(keys.toDF("id"), col("id"))
      .as[(Long, Long, Long, Boolean)].collect()
    assert(out.map(r => (r._1, r._2) -> r._3).toMap === expected)
    assert(out.forall(r => r._4 === (r._1 != r._2)))
    // rendezvous property: only ~1/9 of keys move on 8 -> 9
    val moved = out.filter(_._4).map(_._3).sum
    assert(moved < 500 / 4, s"moved $moved of 500 — too many for HRW")
    assert(out.map(_._3).sum === 500L)
  }
}
