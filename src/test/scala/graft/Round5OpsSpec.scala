package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Distribute, Profile, Relational, Shard, Temporal, TextDedup}

/** Round-5 operators: monitoring (anomaly/drift), layout (zone-map
  * pruning, compaction), behavioral (cohorts, transitions), dedup
  * (containment), and quantization.
  */
class Round5OpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("anomalyOutliers flags exactly the rows beyond k sigma, exact arithmetic") {
    // group g: nine 100.00s and one 200.00 -> mean 110, var = 900
    // z(200) = 90/30 = 3 > 1.5 -> flagged; z(100) = 10/30 = 0.33 -> not
    val d = ((1L to 9L).map(i => (i, "g", 100.0)) :+ ((10L, "g", 200.0)))
      .toDF("id", "grp", "v")
    val out = Profile.anomalyOutliers(d, col("grp"), col("v"), Seq("id"),
      num = 3, den = 2)
    assert(out.select("id").as[Long].collect().toSeq === Seq(10L))
  }

  test("anomalyOutliers: exact past long-wrap scale (values >= \\$30M)") {
    // cents^2 for $80M is 6.4e19 > Long.MaxValue — LongType multiply
    // would wrap; decimal arithmetic must still flag exactly the z=3 row
    // group: nine 40,000,000.00s and one 80,000,000.00
    // mean 44e6, sigma 12e6; z(8e7) = 3 > 1.5, z(4e7) = 1/3
    val d = ((1L to 9L).map(i => (i, "g", 4.0e7)) :+ ((10L, "g", 8.0e7)))
      .toDF("id", "grp", "v")
    val out = Profile.anomalyOutliers(d, col("grp"), col("v"), Seq("id"),
      num = 3, den = 2)
    assert(out.select("id").as[Long].collect().toSeq === Seq(10L))
  }

  test("zonemapPrune: fully selective predicate yields empty result, not an error") {
    val d = (1L to 100L).map(i => (i, i.toDouble)).toDF("id", "v")
    val scratch = "/root/repo/target/graft-tmp/zonemap_empty_spec"
    val out = Distribute.zonemapPrune(spark, d, "v", scratch,
      lo = 5000.0, hi = 6000.0, ranges = 4)
    assert(out.columns.toSeq === Seq("id", "v"))
    assert(out.count() === 0)
  }

  test("anomalyOutliers boundary: |x - mu| exactly k*sigma is NOT an outlier") {
    // two points symmetric around mean: each sits at exactly 1 sigma
    val d = Seq((1L, "g", 10.0), (2L, "g", 20.0)).toDF("id", "grp", "v")
    // k = 1 (num=den): strict > comparison keeps the boundary rows out
    val out = Profile.anomalyOutliers(d, col("grp"), col("v"), Seq("id"),
      num = 1, den = 1)
    assert(out.count() === 0)
  }

  test("skylinePareto keeps the frontier incl. exact duplicates, drops dominated") {
    val d = Seq(
      (1L, 10.0, 5), // frontier
      (2L, 10.0, 5), // exact duplicate of 1 - also frontier
      (3L, 10.0, 4), // dominated by 1 (equal cost, less gain)
      (4L, 20.0, 5), // dominated by 1 (higher cost, equal gain)
      (5L, 20.0, 9), // frontier (more gain than anything cheaper)
      (6L, 5.0, 1) // frontier (cheapest)
    ).toDF("id", "cost", "gain")
    val out = Relational.skylinePareto(d, col("cost"), col("gain"),
      col("id"), bucketWidth = 7.0)
      .select("id").as[Long].collect().toSet
    assert(out === Set(1L, 2L, 5L, 6L))
  }

  test("skylinePareto matches the quadratic definition on random data") {
    val rnd = new scala.util.Random(7)
    val rows = (1L to 200L).map(i =>
      (i, (rnd.nextInt(50) + 1).toDouble, rnd.nextInt(30)))
    val d = rows.toDF("id", "cost", "gain")
    val got = Relational.skylinePareto(d, col("cost"), col("gain"),
      col("id"), bucketWidth = 10.0).select("id").as[Long].collect().toSet
    val want = rows.filter { case (_, c, g) =>
      !rows.exists { case (_, c2, g2) =>
        c2 <= c && g2 >= g && (c2 < c || g2 > g)
      }
    }.map(_._1).toSet
    assert(got === want)
  }

  test("retentionCohorts: week-0 cohort returns in later weeks") {
    val d = Seq(
      (1L, "2024-01-01"), (1L, "2024-01-02"), (1L, "2024-01-09"), // u1: w0 x2, w1
      (2L, "2024-01-10"), (2L, "2024-01-24") // u2: cohort w of Jan 8; back 2w later
    ).toDF("user_id", "day")
      .select(col("user_id"), to_timestamp(col("day")).as("ts"))
    val out = Temporal.retentionCohorts(d, col("user_id"), col("ts"))
      .as[(java.sql.Date, Int, Long, Long)].collect()
      .map(r => (r._1.toString, r._2) -> ((r._3, r._4))).toMap
    // 2024-01-01 is a Monday
    assert(out(("2024-01-01", 0)) === ((1L, 2L)))
    assert(out(("2024-01-01", 1)) === ((1L, 1L)))
    assert(out(("2024-01-08", 0)) === ((1L, 1L)))
    assert(out(("2024-01-08", 2)) === ((1L, 1L)))
    assert(out.size === 4)
  }

  test("eventTransitions: per-prev probabilities are n/total and sum to 1") {
    val d = Seq(
      (1L, 1L, "a"), (1L, 2L, "b"), (1L, 3L, "a"), (1L, 4L, "c"),
      (2L, 5L, "a"), (2L, 6L, "b")
    ).map { case (u, i, t) => (u, i, t, new java.sql.Timestamp(i * 1000)) }
      .toDF("user_id", "event_id", "event_type", "ts")
    val out = Temporal.eventTransitions(d, col("user_id"), col("ts"),
      col("event_id"), col("event_type"))
      .as[(String, String, Long, Double)].collect()
    val m = out.map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    // from a: -> b twice; from b: -> a once; from a: -> c... timeline u1:
    // a->b, b->a, a->c; u2: a->b. So a->(b:2, c:1), b->(a:1)
    assert(m(("a", "b")) === ((2L, 2.0 / 3.0)))
    assert(m(("a", "c")) === ((1L, 1.0 / 3.0)))
    assert(m(("b", "a")) === ((1L, 1.0)))
    out.groupBy(_._1).foreach { case (_, rows) =>
      assert(math.abs(rows.map(_._4).sum - 1.0) < 1e-12)
    }
  }

  test("containmentPairs catches prefix duplication that Jaccard misses") {
    val short = "alpha beta gamma delta epsilon"
    val long = short + " " + (1 to 40).map(i => s"w$i").mkString(" ")
    val d = Seq((1L, short), (2L, long), (3L, "unrelated text entirely here"))
      .toDF("doc_id", "text")
    val cont = TextDedup.containmentPairs(d, threshold = 0.8)
      .as[(Long, Long, Double)].collect()
    assert(cont.map(r => (r._1, r._2)).toSeq === Seq((1L, 2L)))
    assert(cont.head._3 === 1.0) // every shingle of the short doc is in the long one
    // the same pair is invisible to Jaccard at 0.5: union is ~42 shingles
    val jac = TextDedup.nearDupJaccard(d, threshold = 0.5)
    assert(jac.count() === 0)
  }

  test("containmentPairs: exact values even when the df-cap drops shared shingles") {
    // shingle "alpha beta gamma" appears in ALL four docs (df=4 > cap 3),
    // so it is dropped from candidate generation — but docs 1 and 2 also
    // share the rarer tail, so the pair is still a candidate, and the
    // emitted containment must count the capped shingle via the exact
    // full-set re-verify (1.0, not the capped lower bound 3/4)
    val core = "alpha beta gamma delta epsilon zeta"
    val d = Seq(
      (1L, core),
      (2L, core + " " + (1 to 40).map(i => s"w$i").mkString(" ")),
      (3L, "alpha beta gamma qq rr"),
      (4L, "alpha beta gamma ss tt"))
      .toDF("doc_id", "text")
    val cont = TextDedup.containmentPairs(d, threshold = 0.8, maxDf = 3)
      .as[(Long, Long, Double)].collect()
    assert(cont.map(r => (r._1, r._2)).toSeq === Seq((1L, 2L)))
    assert(cont.head._3 === 1.0)
  }

  test("driftReport: identical sides yield zero drift, shares sum to 1") {
    // same values on both sides -> p_a == p_b everywhere
    val d = (0 until 100).flatMap(i => Seq((i % 10, 0), (i % 10, 1)))
      .toDF("b", "s")
    val out = Profile.driftReport(d, col("s"), col("b"))
      .as[(Int, Long, Long, Double, Double, Double)].collect()
    assert(out.forall(_._6 === 0.0))
    assert(math.abs(out.map(_._4).sum - 1.0) < 1e-12)
    assert(math.abs(out.map(_._5).sum - 1.0) < 1e-12)
  }

  test("quantizeInt8: min maps to 0, max to 255, constant dim to 0") {
    val d = Seq(
      (1L, Array(0.0f, 7.0f, -3.0f)),
      (2L, Array(10.0f, 7.0f, 1.0f)),
      (3L, Array(5.0f, 7.0f, 0.5f))
    ).toDF("vec_id", "embedding")
    val out = graft.ops.Similarity.quantizeInt8(d)
      .as[(Long, Array[Int])].collect().map(r => r._1 -> r._2).toMap
    assert(out(1L)(0) === 0 && out(2L)(0) === 255) // dim 0: [0, 10]
    assert(out.values.forall(_(1) === 0)) // constant dim
    assert(out(1L)(2) === 0 && out(2L)(2) === 255)
    assert(out(3L)(0) === 127) // (5-0)*255/10 = 127.5 -> floor 127
    assert(out.values.flatten.forall(c => c >= 0 && c <= 255))
  }

  test("zonemapPrune reads fewer files and matches the full filter") {
    val d = (1L to 1000L).map(i => (i, (i % 500).toDouble)).toDF("id", "v")
    val scratch = "/root/repo/target/graft-tmp/zonemap_spec"
    val out = Distribute.zonemapPrune(spark, d, "v", scratch,
      lo = 100.0, hi = 150.0, ranges = 8)
    val want = d.filter(col("v") >= 100.0 && col("v") <= 150.0)
      .as[(Long, Double)].collect().toSet
    assert(out.as[(Long, Double)].collect().toSet === want)
    // the pruned scan must touch a strict subset of the files
    val total = new java.io.File(scratch).listFiles()
      .count(_.getName.endsWith(".parquet"))
    val read = out.queryExecution.executedPlan.toString
    assert(total === 8)
    // scan's file count is not directly printable; assert via input files
    assert(out.inputFiles.length < total,
      s"expected pruning below $total files, read ${out.inputFiles.length}:\n$read")
  }

  test("zOrderPrune: 2-D box skips files on BOTH columns and matches " +
       "the full filter") {
    // two independent uniform keys: a 1/4 x 1/4 box covers ~1/16 of the
    // z-space, so most of the 16 z-range files must be skipped
    val d = (1L to 4096L).map(i => (i, i % 64, (i * 37) % 64))
      .toDF("id", "a", "b")
    val scratch = "/root/repo/target/graft-tmp/zorder_prune_spec"
    val out = Distribute.zOrderPrune(spark, d, "a", "b", bits = 6,
      scratchDir = scratch, loA = 0L, hiA = 15L, loB = 16L, hiB = 31L,
      partitions = 16)
    val want = d.filter(col("a").between(0, 15) && col("b").between(16, 31))
      .as[(Long, Long, Long)].collect().toSet
    assert(out.as[(Long, Long, Long)].collect().toSet === want)
    val total = new java.io.File(scratch).listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(total === 16)
    assert(out.inputFiles.length < total,
      s"expected 2-D pruning below $total files, read ${out.inputFiles.length}")
    // a box outside the domain prunes to the empty frame, not an error
    val none = Distribute.zOrderPrune(spark, d, "a", "b", bits = 6,
      scratchDir = scratch, loA = 100L, hiA = 200L, loB = 100L, hiB = 200L,
      partitions = 16)
    assert(none.count() === 0L)
  }

  test("dppJoin: scan carries a dynamicpruning partition filter and " +
       "matches the plain filter+agg") {
    val sf = "/root/testdata/sf0.001"
    val out = SparkEntry.queries("dpp_join")(spark, sf)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("dynamicpruning"),
      s"expected a dynamicpruning PartitionFilter in:\n$plan")
    val events = Tables.events(spark, sf)
    val want = events
      .filter(dayofmonth(to_date(col("ts"))).between(1, 7))
      .groupBy(to_date(col("ts")).cast("string").as("day"))
      .agg(count(lit(1)).as("n"),
        sum(round(col("value") * 100).cast("long")).as("sum_cents"))
      .as[(String, Long, Long)].collect().toSet
    assert(out.as[(String, Long, Long)].collect().toSet === want)
  }

  test("join_hint_merge: the hint forces SortMergeJoin where broadcast " +
       "would otherwise win") {
    val sf = "/root/testdata/sf0.001"
    val out = SparkEntry.queries("join_hint_merge")(spark, sf)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"),
      s"expected SortMergeJoin under the merge hint in:\n$plan")
    assert(!plan.contains("BroadcastHashJoin"),
      "broadcast should have been suppressed by the hint")
  }

  test("vocabCoverage: in-vocab share with deterministic rank-K ties") {
    val d = Seq(
      (1L, "a a a b b c"), // with topK=2 vocab = {a, b}: 5/6 covered
      (2L, "c c c c"), // 0/4
      (3L, "a b") // 2/2
    ).toDF("doc_id", "text")
    val out = graft.ops.Text.vocabCoverage(d, topK = 2)
      .as[(Long, Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    // counts: a=4, b=3, c=5 -> top2 = {c, a}
    assert(out(1L) === ((1L, 6L, 4L, 4.0 / 6.0)))
    assert(out(2L) === ((2L, 4L, 4L, 1.0)))
    assert(out(3L) === ((3L, 2L, 1L, 0.5)))
  }

  test("docLmScore: deterministic mean of exact bigram probabilities") {
    // corpus: "x y" twice, "x z" once -> P(y|x)=2/3, P(z|x)=1/3
    val d = Seq((1L, "x y"), (2L, "x y"), (3L, "x z")).toDF("doc_id", "text")
    val out = graft.ops.Text.docLmScore(d)
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(out(1L) === ((1L, 1L, 2.0 / 3.0)))
    assert(out(3L) === ((3L, 1L, 1.0 / 3.0)))
  }

  test("concurrencyProfile: overlap peaks count; back-to-back handoff does not") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val sessions = Seq(
      // day 1: three sessions, two overlapping, one disjoint
      (1L, 1L, ts("2024-01-01 10:00:00"), ts("2024-01-01 11:00:00")),
      (2L, 1L, ts("2024-01-01 10:30:00"), ts("2024-01-01 12:00:00")),
      (3L, 1L, ts("2024-01-01 13:00:00"), ts("2024-01-01 14:00:00")),
      // day 2: B starts exactly when A ends -> never concurrent
      (1L, 2L, ts("2024-01-02 09:00:00"), ts("2024-01-02 10:00:00")),
      (2L, 2L, ts("2024-01-02 10:00:00"), ts("2024-01-02 11:00:00"))
    ).toDF("key", "session_id", "session_start", "session_end")
    val out = graft.ops.Temporal.concurrencyProfile(sessions)
      .as[(java.sql.Date, Long, Long)].collect()
      .map(r => r._1.toString -> ((r._2, r._3))).toMap
    assert(out("2024-01-01") === ((2L, 3L)))
    assert(out("2024-01-02") === ((1L, 2L)))
  }

  test("temperatureSample: sqrt quotas upsample the tail, deterministic fill") {
    // strata: a=400 docs, b=100, c=25 -> sqrt weights 20:10:5 = 4:2:1
    val d = ((1L to 400L).map(i => (i, "a")) ++
      (401L to 500L).map(i => (i, "b")) ++
      (501L to 525L).map(i => (i, "c"))).toDF("doc_id", "src")
    val out = Shard.temperatureSample(d, col("src"), col("doc_id"), budget = 70)
      .as[(String, Long, Long)].collect()
    val quota = out.groupBy(_._1).map { case (s, rows) => s -> rows.length }
    // budget*w/z: 70*20/35=40, 70*10/35=20, 70*5/35=10
    assert(quota === Map("a" -> 40, "b" -> 20, "c" -> 10))
    // tail share rises vs proportional: c is 25/525 ~ 4.8% of corpus but
    // 10/70 ~ 14% of the sample
    val again = Shard.temperatureSample(d, col("src"), col("doc_id"), budget = 70)
      .as[(String, Long, Long)].collect()
    assert(out.toSet === again.toSet)
  }

  test("freshness: staleness measured against the freshest key, one scan") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val d = Seq(
      ("a", ts("2024-01-01 10:00:00")), ("a", ts("2024-01-01 12:00:00")),
      ("b", ts("2024-01-01 11:30:00"))).toDF("k", "ts")
    val fr = graft.ops.Quality.freshness(d, col("k"), col("ts"))
    // single scan by construction: the global max is a window over the
    // per-key aggregates, not a second aggregation branch
    val scans = "LocalTableScan".r
      .findAllIn(fr.queryExecution.executedPlan.toString).length
    assert(scans === 1, s"expected one scan of the feed, saw $scans")
    val out = fr.as[(String, Long, java.sql.Timestamp, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(out("a")._4 === 0L)
    assert(out("b")._4 === 1800L)
  }

  test("userActiveTime sums disjoint session durations exactly") {
    val base = 1700000000L
    val d = Seq( // u1: [0,100s] and [4000,4050s]; u2: single event (0s)
      (1L, base), (1L, base + 100), (1L, base + 4000), (1L, base + 4050),
      (2L, base)
    ).map { case (u, s) => (u, new java.sql.Timestamp(s * 1000)) }
      .toDF("user_id", "ts")
    val out = graft.ops.Temporal.userActiveTime(
      graft.ops.Temporal.sessionize(d, col("user_id"), col("ts"), 1800L))
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(out(1L) === ((1L, 2L, 150L, 100L)))
    assert(out(2L) === ((2L, 1L, 0L, 0L)))
  }

  test("ngramNovelty: first doc fully novel, exact copy fully stale") {
    val d = Seq(
      (1L, "one two three four"), // shingles first seen here -> novelty 1
      (2L, "one two three four"), // exact copy -> novelty 0
      (3L, "one two three five") // shares "one two three" -> 1/2 novel
    ).toDF("doc_id", "text")
    val out = graft.ops.TextDedup.ngramNovelty(d)
      .as[(Long, Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(out(1L) === ((1L, 2L, 2L, 1.0)))
    assert(out(2L) === ((2L, 2L, 0L, 0.0)))
    assert(out(3L) === ((3L, 2L, 1L, 0.5)))
  }

  test("sourceOverlap: pairwise source-set Jaccard from posting lists") {
    val d = Seq(
      (1L, "a", "x y z w"), // source a shingles: {x y z, y z w}
      (2L, "b", "x y z"), // source b: {x y z}
      (3L, "c", "p q r") // source c: disjoint
    ).toDF("doc_id", "source", "text")
    val out = graft.ops.TextDedup.sourceOverlap(d)
      .as[(String, String, Long, Double)].collect()
    assert(out.length === 1) // only (a, b) overlap
    assert(out.head === (("a", "b", 1L, 0.5))) // inter 1, union 2
  }

  test("anomalyOutliers: flag set is invariant under repartitioning") {
    val rnd = new scala.util.Random(11)
    val d = (1L to 2000L).map(i =>
      (i, s"g${i % 3}", math.floor(rnd.nextDouble() * 10000) / 100))
      .toDF("id", "grp", "v")
    val a = Profile.anomalyOutliers(d, col("grp"), col("v"), Seq("id"))
      .select("id").as[Long].collect().toSet
    val b = Profile.anomalyOutliers(d.repartition(7), col("grp"), col("v"),
      Seq("id")).select("id").as[Long].collect().toSet
    assert(a === b)
  }

  test("temperatureSample invariants: quota caps respected, budget not exceeded") {
    val rnd = new scala.util.Random(3)
    val d = (1L to 300L).map(i => (i, s"s${rnd.nextInt(6)}")).toDF("doc_id", "src")
    val out = Shard.temperatureSample(d, col("src"), col("doc_id"), budget = 100)
      .as[(String, Long, Long)].collect()
    val perStratum = out.groupBy(_._1).view.mapValues(_.length).toMap
    val quotas = out.groupBy(_._1).view.mapValues(_.head._3).toMap
    val sizes = d.groupBy("src").count().as[(String, Long)].collect().toMap
    perStratum.foreach { case (s, taken) =>
      assert(taken <= quotas(s))
      assert(taken === math.min(quotas(s), sizes(s)))
    }
    assert(out.length <= 100)
  }

  test("ngramNovelty: an exact duplicate (by content hash) scores zero novelty") {
    val rnd = new scala.util.Random(5)
    val texts = (1L to 30L).map(i =>
      (i, (1 to 20).map(_ => s"w${rnd.nextInt(40)}").mkString(" ")))
    // append exact copies of the first 5 docs with later ids
    val d = (texts ++ texts.take(5).map { case (i, t) => (100L + i, t) })
      .toDF("doc_id", "text")
    val novelty = graft.ops.TextDedup.ngramNovelty(d)
      .as[(Long, Long, Long, Double)].collect().map(r => r._1 -> r._4).toMap
    (101L to 105L).foreach(i => assert(novelty(i) === 0.0, s"doc $i"))
  }

  test("concurrencyProfile bounds: 1 <= max_concurrent <= n_sessions") {
    val e = Tables.events(spark, "/root/testdata/sf0.001")
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"),
        col("value"), col("props"))
    val out = graft.ops.Temporal.concurrencyProfile(
      graft.ops.Temporal.sessionize(e, col("user_id"), col("ts"), 1800L))
      .as[(java.sql.Date, Long, Long)].collect()
    assert(out.nonEmpty)
    out.foreach { case (_, mx, n) => assert(mx >= 1L && mx <= n) }
  }

  test("cmsEstimate: estimates dominate exact counts; exact at low collision") {
    val d = (1L to 3000L).map(i => (i, i % 40)).toDF("id", "k")
    val out = Profile.cmsEstimate(d, col("k"), topN = 10)
      .as[(Long, Long, Long)].collect()
    assert(out.length === 10)
    out.foreach { case (_, exact, est) => assert(est >= exact) } // CMS law
    // 40 distinct keys over 4x1024 counters: collisions are virtually
    // impossible, so the sketch should be exact here
    out.foreach { case (_, exact, est) => assert(est === exact) }
  }

  test("compactRoundTrip: 64 small files -> target files, lossless") {
    val d = (1L to 5000L).map(i => (i, s"e$i", i * 1.5)).toDF("id", "t", "v")
    val path = "/root/repo/target/graft-tmp/compact_spec"
    val out = graft.sources.Sinks.compactRoundTrip(d, path,
      smallFiles = 64, targetFiles = 4)
    def parquets(p: String) = new java.io.File(p).listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(parquets(s"$path/small") === 64)
    assert(parquets(s"$path/compact") <= 4)
    assert(out.as[(Long, String, Double)].collect().toSet ===
      d.as[(Long, String, Double)].collect().toSet)
  }
}
