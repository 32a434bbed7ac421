package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Changelog, Distribute, Graph, Profile}

/** Round-6 third wave: CDC changelog application, integer-exact PageRank,
  * the HLL distinct sketch, and bloom-filter join pruning.
  */
class Wave3Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("cdcApply: latest change wins; terminal delete tombstones the key") {
    val log = Seq(
      // key 1: I then U — final image is the U row
      (1L, 10L, "I", 100.0),
      (1L, 20L, "U", 110.0),
      // key 2: I then D — key vanishes
      (2L, 10L, "I", 200.0),
      (2L, 30L, "D", 0.0),
      // key 3: D then I (resurrection) — final image is the I row
      (3L, 10L, "D", 0.0),
      (3L, 40L, "I", 300.0)
    ).toDF("k", "seq", "op", "v")
    val out = Changelog.cdcApply(log, Seq("k"), col("seq"), Seq(col("v")), col("op"))
      .select("k", "v").as[(Long, Double)].collect().toMap
    assert(out === Map(1L -> 110.0, 3L -> 300.0))
  }

  test("cdcMerge: deletes remove target rows, upserts replace-or-insert") {
    val target = Seq((1L, 1.0), (2L, 2.0), (3L, 3.0)).toDF("k", "v")
    val log = Seq(
      (1L, 10L, "U", 1.5), // update existing
      (3L, 10L, "D", 0.0), // delete existing
      (4L, 10L, "I", 4.0)  // insert new
    ).toDF("k", "seq", "op", "v")
    val out = Changelog.cdcMerge(target, log.select("k", "v", "seq", "op"),
        Seq("k"), col("seq"), Seq.empty, col("op"))
      .select("k", "v").as[(Long, Double)].collect().toMap
    assert(out === Map(1L -> 1.5, 2L -> 2.0, 4L -> 4.0))
  }

  test("pageRank: uniform on a regular graph, center-heavy on a star, mass conserved") {
    // 6-cycle: every node degree 2 — rank must stay exactly uniform
    val n = 6
    val cycle = (0 until n).map(i => (s"n$i", s"n${(i + 1) % n}")).toDF("src", "dst")
    val ranks = Graph.pageRank(spark, cycle, iterations = 5, scale = 1000000L)
      .as[(String, Long)].collect().toMap
    assert(ranks.size === n)
    assert(ranks.values.toSet.size === 1, "regular graph must stay uniform")
    // integer div loses bounded mass: sum in (scale - loss, scale]
    assert(ranks.values.sum <= 1000000L && ranks.values.sum > 990000L)

    // star: center must outrank every leaf
    val star = (1 to 8).map(i => ("hub", s"leaf$i")).toDF("src", "dst")
    val sr = Graph.pageRank(spark, star, iterations = 10, scale = 1000000L)
      .as[(String, Long)].collect().toMap
    assert((1 to 8).forall(i => sr("hub") > sr(s"leaf$i")))
    // all leaves symmetric => identical rank
    assert((1 to 8).map(i => sr(s"leaf$i")).toSet.size === 1)
  }

  test("pageRank oracle SQL mirrors the operator bit-for-bit" ) {
    // the generated SQL is the contract; sanity-check its shape here
    val sql = Graph.pageRankOracleSql("SELECT src, dst FROM edges", iterations = 3)
    assert(sql.contains("r3"))
    assert(!sql.contains("r4"))
    assert(sql.contains("// 100"), "integer division throughout")
    assert(!sql.matches("(?s).* [0-9]+ / .*"), "no float division")
  }

  test("hllDistinct: estimate within HLL error bounds of exact truth") {
    val df = (1L to 3000L).map(i => (s"g${i % 3}", i * 7919L % 1499L))
      .toDF("g", "k") // ~500 distinct keys per group
    val out = Profile.hllDistinct(df, col("g"), col("k"))
      .as[(String, Long, Double)].collect()
    assert(out.length === 3)
    out.foreach { case (g, exact, est) =>
      // m=64 => typical rel error 1.04/sqrt(64) ~ 13%; allow 3 sigma
      assert(math.abs(est - exact) / exact < 0.40, s"$g: est $est vs exact $exact")
    }
    // deterministic: same input, same estimates
    val again = Profile.hllDistinct(df, col("g"), col("k"))
      .as[(String, Long, Double)].collect()
    assert(out.sortBy(_._1).toSeq === again.sortBy(_._1).toSeq)
  }

  test("hllDistinct: small cardinality takes the linear-counting branch accurately") {
    val df = (1L to 400L).map(i => ("g", i % 20L)).toDF("g", "k")
    val Array((_, exact, est)) = Profile.hllDistinct(df, col("g"), col("k"))
      .as[(String, Long, Double)].collect()
    assert(exact === 20L)
    // linear counting at n << m is tight
    assert(math.abs(est - exact) / exact < 0.20, s"est $est vs exact $exact")
  }

  test("bloomSemiJoin: zero false negatives; false positives flagged") {
    val build = (1L to 50L).map(k => Tuple1(k * 13L)).toDF("bk")
    val probe = (1L to 1000L).map(Tuple1(_)).toDF("pk")
    val out = Distribute.bloomSemiJoin(probe, col("pk"), build, col("bk"),
        mBits = 512, k = 3)
      .as[(Long, Boolean)].collect()
    val buildSet = (1L to 50L).map(_ * 13L).filter(_ <= 1000L).toSet
    val passed = out.map(_._1).toSet
    // every true key passes (bloom guarantees no false negatives)
    assert(buildSet.subsetOf(passed))
    // the flag is exactly ground truth
    out.foreach { case (k, m) => assert(m === buildSet.contains(k), s"key $k") }
    // with 512 bits / 50 keys some probes must be pruned
    assert(passed.size < 1000, "filter must actually prune")
  }

  test("productQuantize: identical vectors share codes; codes bounded; fidelity sane") {
    import graft.ops.Similarity
    // 24 deterministic vectors, dim 8; ids 20..23 duplicate ids 0..3
    val vecs = (0 until 24).map { i =>
      val base = i % 20
      (i.toLong, (0 until 8).map(d =>
        math.sin(base * 31 + d * 7 + 1).toFloat).toArray)
    }.toDF("vec_id", "embedding")
    val out = Similarity.productQuantize(vecs, dim = 8, nSub = 2, k = 4)
      .as[(Long, String, Double)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out.size === 24)
    out.values.foreach { case (codes, sim) =>
      val cs = codes.split(",").map(_.toInt)
      assert(cs.length === 2 && cs.forall(c => c >= 0 && c < 4))
      assert(sim <= 1.000001 && sim >= -1.000001)
    }
    // duplicate vectors quantize identically
    (0 until 4).foreach(i => assert(out(i.toLong) === out((i + 20).toLong)))
  }

  test("audioFeatures: exact energy / range / mean-crossings for a known payload") {
    import graft.ops.Multimodal
    // doc_id 0: rate 8000, mono, 100 samples; text "ab" cycles as bytes
    // 97,98 -> every 16-bit LE word is 97 + 256*98 = 25185: constant
    // signal, zero mean-crossings, energy = n * w^2
    val docs = Seq((0L, "ab", "en")).toDF("doc_id", "text", "lang")
    val Array(r) = Multimodal.audioFeatures(docs)
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    val w = 97L + 256L * 98L
    assert(r === ((0L, 100L, 100L * w * w, w, w, 0L)))

    // doc_id 1: stereo (2ch) -> 202 samples -> 202 words; "abcd" cycles
    // as words (97,98),(99,100),(97,98)... alternating -> every adjacent
    // pair straddles the mean: 201 crossings
    val docs2 = Seq((1L, "abcd", "en")).toDF("doc_id", "text", "lang")
    val Array(r2) = Multimodal.audioFeatures(docs2)
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    val w1 = 97L + 256L * 98L; val w2 = 99L + 256L * 100L
    assert(r2._2 === 202L)
    assert(r2._4 === w1 && r2._5 === w2)
    assert(r2._6 === 201L)
  }

  test("streamStreamJoinOuter: matched pairs + watermark-closed null rows == oracle") {
    val events = Tables.events(spark, "/root/testdata/sf0.001")
    val scratch = java.nio.file.Files.createTempDirectory("graft-ssjo").toString
    val windowSec = 600L; val delaySec = 3600L
    val out = graft.streaming.Streaming.streamStreamJoinOuter(
        spark, events, windowSec, delaySec, scratch)
      .as[(Long, Long, java.sql.Timestamp, Option[Long], Option[java.sql.Timestamp])]
      .collect().toSet

    // batch oracle: inner pairs always; null row iff the final watermark
    // (min of both sides' max ts - delay) passed view_ts + window
    val v = events.filter(col("event_type") === "view")
      .select(col("user_id"), col("event_id").as("view_id"), col("ts").as("view_ts"))
    val p = events.filter(col("event_type") === "purchase")
      .select(col("user_id").as("pu"), col("event_id").as("purchase_id"),
        col("ts").as("purchase_ts"))
    val cond = col("user_id") === col("pu") &&
      col("purchase_ts") >= col("view_ts") &&
      col("purchase_ts") <= col("view_ts") + expr(s"INTERVAL $windowSec SECONDS")
    val matched = v.join(p, cond)
      .select(col("user_id"), col("view_id"), col("view_ts"),
        col("purchase_id"), col("purchase_ts"))
      .as[(Long, Long, java.sql.Timestamp, Option[Long], Option[java.sql.Timestamp])]
      .collect().toSet
    val wmFinal = math.min(
      v.agg(max(col("view_ts")).cast("long")).as[Long].head(),
      p.agg(max(col("purchase_ts")).cast("long")).as[Long].head()) - delaySec
    val unmatched = v.join(p, cond, "left_anti")
      .filter(col("view_ts").cast("long") + windowSec < wmFinal)
      .select(col("user_id"), col("view_id"), col("view_ts"))
      .as[(Long, Long, java.sql.Timestamp)]
      .collect().map { case (u, id, ts) => (u, id, ts, None: Option[Long],
        None: Option[java.sql.Timestamp]) }.toSet

    assert(out === (matched ++ unmatched))
    // the outer shape must actually exercise both behaviors
    assert(unmatched.nonEmpty, "some view must close unmatched")
    assert(out.exists(_._4.isEmpty) && out.exists(_._4.nonEmpty))
  }
}
