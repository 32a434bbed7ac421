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

  test("paragraphDedup: keep-first across corpus AND within doc, reassembly in order") {
    val d = docs(
      (1L, "a b c d a b"), // chunks: [a b][c d][a b] — 3rd repeats the 1st
      (2L, "c d e f"),     // [c d] seen at (1,1) -> dropped; [e f] kept
      (3L, "a b c d a b"), // full doc already seen -> collapses to ""
      (4L, "g"))           // short partial chunk survives alone
    val out = TextDedup.paragraphDedup(d, chunkWords = 2)
      .as[(Long, Long, Long, String)].collect()
      .map { case (id, nc, nk, t) => id -> ((nc, nk, t)) }.toMap
    assert(out(1L) === ((3L, 2L, "a b c d")))
    assert(out(2L) === ((2L, 1L, "e f")))
    assert(out(3L) === ((3L, 0L, "")))
    assert(out(4L) === ((1L, 1L, "g")))
  }

  test("semDedup: pairwise only within a cluster; keep-lowest-id; first member keeps") {
    // centroids (nlist=2) are vec 0 = x-axis, vec 1 = y-axis; 2 and 3
    // join cluster 0, 4 joins cluster 1 as an exact dup of the centroid
    val e = Seq(
      (0L, Seq(1.0, 0.0)),
      (1L, Seq(0.0, 1.0)),
      (2L, Seq(1.0, 0.1)),   // cos(2,0) = 1/sqrt(1.01) ~ 0.995
      (3L, Seq(0.9, 0.05)),  // cos(3,2) ~ 0.9997 > cos(3,0)
      (4L, Seq(0.0, 2.0))    // cos(4,1) = 1.0 exactly
    ).toDF("vec_id", "embedding")
    val out = graft.ops.Similarity.semDedup(e, threshold = 0.99, nlist = 2)
      .as[(Long, Long, Option[Double], Boolean)].collect()
      .map { case (id, c, m, k) => id -> ((c, m, k)) }.toMap
    assert(out(0L) === ((0L, None, true)))    // cluster 0's first member
    assert(out(1L) === ((1L, None, true)))    // cluster 1's first member
    assert(out(2L)._1 === 0L && !out(2L)._3)  // dup of 0 within cluster 0
    assert(out(3L)._1 === 0L && !out(3L)._3)
    assert(out(4L)._1 === 1L && out(4L)._2.get === 1.0 && !out(4L)._3)
    // cross-cluster near-orthogonal pairs never compared: 1 vs 0 stays None
  }

  test("winnowing: every window covered, rightmost tie-break, fp matches its k-gram") {
    // identical words => every 2-gram hashes identically => each window's
    // min is a tie and the RIGHTMOST position must win
    val tie = docs((1L, "a a a a a"))
    val sel = graft.ops.Text.winnowing(tie, k = 2, w = 2)
      .as[(Long, Long, Long)].collect().map(_._2).sorted
    // m = 4 grams, windows s=0..2, rightmost of each: positions 1,2,3
    assert(sel.toSeq === Seq(1L, 2L, 3L))

    // guarantee: docs sharing a run of w+k-1 words share a fingerprint;
    // and each fp is the polynomial hash of the k-gram at its position
    val d = docs(
      (1L, "p q r s t u v w x"),
      (2L, "m n p q r s t u z")) // shares the 5-word run "p q r s t u"
    val out = graft.ops.Text.winnowing(d, k = 2, w = 4)
      .as[(Long, Long, Long)].collect()
    def wh(s: String) = s.head.toLong * 31 + s.length
    def gram(words: Array[String], pos: Int, k: Int) =
      words.slice(pos, pos + k).foldLeft(0L)((a, x) => (a * 1000003L + wh(x)) % 1000000007L)
    val texts = Map(1L -> "p q r s t u v w x", 2L -> "m n p q r s t u z")
    out.foreach { case (id, pos, fp) =>
      assert(fp === gram(texts(id).split(" "), pos.toInt, 2), s"doc $id pos $pos")
    }
    val fps = out.groupBy(_._1).map { case (id, rs) => id -> rs.map(_._3).toSet }
    assert((fps(1L) intersect fps(2L)).nonEmpty)
  }

  test("charEntropy: exact closed-form cases") {
    val d = docs((1L, "aabb"), (2L, "aaaa"), (3L, "abcd"))
    val out = graft.ops.Text.charEntropy(d)
      .as[(Long, Long, Double)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out(1L) === ((4L, 1.0)))  // two chars, equal counts
    assert(out(2L) === ((4L, 0.0)))  // single char
    assert(out(3L) === ((4L, 2.0)))  // four equiprobable chars
  }

  test("wordlistFilter: exact ratio and keep decision") {
    val d = docs((1L, "bad good bad"), (2L, "good fine ok"))
    val out = graft.ops.Text.wordlistFilter(d, Seq("bad"), maxRatio = 0.5)
      .as[(Long, Long, Long, Double, Boolean)].collect()
      .map(r => r._1 -> r).toMap
    assert(out(1L) === ((1L, 3L, 2L, 2.0 / 3.0, false)))
    assert(out(2L) === ((2L, 3L, 0L, 0.0, true)))
  }
}
