package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Shard, TextDedup}

/** Round-6 operators: the incremental near-dedup ingest tick, prefix-sum
  * sequence packing, and the train/test split leak guard.
  */
class Round6OpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def docs(rows: (Long, String)*) =
    rows.toDF("doc_id", "text")

  test("nearDupIncremental: flags batch-vs-corpus pairs only, never within-side") {
    val corpus = docs(
      (1L, "x y z x y z x y"),
      (2L, "x y z x y z x y"), // corpus-internal dup of 1: must NOT emit
      (3L, "p q r s t u v w"))
    val batch = docs(
      (10L, "x y z x y z x y"), // near-dup of corpus 1 and 2: must emit
      (11L, "a b c d e f g h"),
      (12L, "a b c d e f g h")) // batch-internal dup of 11: must NOT emit
    val out = TextDedup.nearDupIncremental(corpus, batch)
      .as[(Long, Long, Double)].collect().toSet
    assert(out === Set((1L, 10L, 1.0), (2L, 10L, 1.0)))
  }

  test("packSequences: per-shard prefix-sum binning, exact bin arithmetic") {
    val budget = 10L
    val d = (1L to 40L).map(i => (i, "t " * ((i % 7).toInt + 1))).toDF("doc_id", "text")
    val out = Shard.packSequences(d, col("doc_id"),
        size(split(col("text"), " ")) - 1, nShards = 4, budget = budget)
      .select("doc_id", "shard", "n_tokens", "bin", "bin_offset")
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(out.length === 40)
    // recompute the contract per shard: order by (portable hash, id),
    // cumulative tokens before each doc, bin = cum DIV budget
    def h(id: Long) = ((id * 1000003L) % 1000000007L + 1000000007L) % 1000000007L
    out.groupBy(_._2).foreach { case (shard, rows) =>
      var cum = 0L
      rows.sortBy(r => (h(r._1), r._1)).foreach {
        case (id, _, n, bin, off) =>
          assert(h(id) % 4 === shard, s"doc $id shard")
          assert(bin === cum / budget, s"doc $id bin")
          assert(off === cum % budget, s"doc $id offset")
          cum += n
      }
    }
    // bins actually fill: some doc must land beyond bin 0 in every shard
    assert(out.groupBy(_._2).forall(_._2.map(_._4).max > 0))
  }

  test("splitByCluster: near-dups inherit the canonical id's split — no straddle") {
    // ids 1 (train by own hash) and 30 (test by own hash) are near-dups:
    // both must get cluster 1's split; the leak guard on the cluster
    // split must find nothing
    val d = docs(
      (1L, "x y z x y z x y"),
      (30L, "x y z x y z x y"),
      (2L, "p q r s t u v w"))
    val pairs = TextDedup.nearDupJaccard(d)
    val out = TextDedup.splitByCluster(d, pairs)
      .as[(Long, Long, String)].collect()
      .map { case (id, c, s) => id -> ((c, s)) }.toMap
    assert(out(1L) === ((1L, "train")))
    assert(out(30L) === ((1L, "train"))) // own-id hash says test; cluster wins
    assert(out(2L) === ((2L, "train")))
  }

  test("splitLeakPairs: emits only near-dup pairs straddling splits") {
    // portable-hash split pct for small ids is (id*3) % 100:
    // id 1 -> 3 (train), id 30 -> 90 (test); ids 2,3 -> 6,9 (both train)
    val d = docs(
      (1L, "x y z x y z x y"),
      (30L, "x y z x y z x y"), // near-dup of 1, train vs test -> emitted
      (2L, "p q r s t u v w"),
      (3L, "p q r s t u v w")) // near-dup pair entirely inside train -> not
    val out = TextDedup.splitLeakPairs(d)
      .as[(Long, Long, String, String, Double)].collect().toSet
    assert(out === Set((1L, 30L, "train", "test", 1.0)))
  }
}
