package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Profile, Scrub, Shard}

class ScrubShardProfileSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("piiRedact replaces emails, IPs, phones and counts each category") {
    val d = Seq(
      (1L, "mail bob@x.org and alice@y.co.uk from 10.0.0.1 call 555-0199"),
      (2L, "no pii here at all")).toDF("doc_id", "text")
    val out = Scrub.piiRedact(d)
      .as[(Long, String, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(out(1L)._2 === "mail <EMAIL> and <EMAIL> from <IP> call <PHONE>")
    assert((out(1L)._3, out(1L)._4, out(1L)._5) === ((2L, 1L, 1L)))
    assert(out(2L)._2 === "no pii here at all")
    assert((out(2L)._3, out(2L)._4, out(2L)._5) === ((0L, 0L, 0L)))
  }

  test("boilerplateStrip drops corpus-frequent tokens, keeps order, keeps empty docs") {
    // "the" is in 3/3 docs (df 1.0 > 0.5) — stripped; all else rarer
    val d = Seq(
      (1L, "the quick fox the end"),
      (2L, "the slow dog"),
      (3L, "the the the")).toDF("doc_id", "text")
    val out = Scrub.boilerplateStrip(d, dfFrac = 0.5)
      .as[(Long, String, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out(1L) === (("quick fox end", 3L)))
    assert(out(2L) === (("slow dog", 2L)))
    assert(out(3L) === (("", 0L))) // fully-boilerplate doc survives, empty
  }

  test("splitAssign is per-row stable: membership unchanged by corpus growth") {
    val small = Shard.splitAssign((1L to 100L).toDF("doc_id"), col("doc_id"))
      .as[(Long, String)].collect().toMap
    val big = Shard.splitAssign((1L to 1000L).toDF("doc_id"), col("doc_id"))
      .as[(Long, String)].collect().toMap
    assert((1L to 100L).forall(id => small(id) == big(id)))
    assert(Set("train", "val", "test").subsetOf(big.values.toSet))
  }

  test("corpusShuffle: contiguous 1..n positions per shard, deterministic") {
    val df = (1L to 500L).toDF("doc_id")
    val out = Shard.corpusShuffle(df, col("doc_id"), nShards = 8)
      .as[(Long, Long, Long)].collect()
    val byShard = out.groupBy(_._2)
    byShard.foreach { case (_, rows) =>
      assert(rows.map(_._3).sorted.toSeq === (1L to rows.length).toSeq)
    }
    val again = Shard.corpusShuffle(df, col("doc_id"), nShards = 8)
      .as[(Long, Long, Long)].collect()
    assert(out.toSet === again.toSet)
  }

  test("mixtureSample fills each stratum to its own quota, deterministically") {
    val d = (1L to 100L).map(i => (i, if (i <= 60) "big" else "small"))
      .toDF("doc_id", "source")
    val quota = when(col("source") === "big", 10).otherwise(3)
    val out = Shard.mixtureSample(d, col("source"), col("doc_id"), quota)
      .as[(Long, String)].collect()
    assert(out.count(_._2 == "big") === 10)
    assert(out.count(_._2 == "small") === 3)
    val again = Shard.mixtureSample(d, col("source"), col("doc_id"), quota)
      .as[(Long, String)].collect()
    assert(out.toSet === again.toSet)
  }

  test("incrementalDedup keeps only batch docs unseen in corpus, keep-first") {
    val corpus = Seq((1L, "aaa"), (2L, "bbb")).toDF("doc_id", "text")
    val batch = Seq((10L, "aaa"), (11L, "ccc"), (12L, "ccc"), (13L, "ddd"))
      .toDF("doc_id", "text")
    val out = graft.ops.TextDedup.incrementalDedup(corpus, batch)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(out === Seq(11L, 13L)) // "aaa" seen in corpus; 12 loses to 11
  }

  test("saltedAgg equals the plain aggregate and stages through the salt") {
    val d = (1L to 1000L).map(i => (i, s"k${i % 3}", i * 2)).toDF("id", "k", "v")
    val out = graft.ops.Distribute.saltedAgg(d, Seq("k"), col("v"),
      salt = col("id"), salts = 8)
      .as[(String, Long, Long)].collect().toSet
    val plain = d.groupBy("k").agg(sum("v").as("s"), count(lit(1)).as("n"))
      .as[(String, Long, Long)].collect().toSet
    assert(out === plain)
    // the physical plan aggregates on (k, __salt) before the final (k)
    val plan = graft.ops.Distribute.saltedAgg(d, Seq("k"), col("v"),
      salt = col("id"), salts = 8).queryExecution.executedPlan.toString
    assert(plan.contains("__salt"))
  }

  test("heavyHitters ranks keys by count with exact shares") {
    val d = (Seq.fill(6)("a") ++ Seq.fill(3)("b") ++ Seq("c")).toDF("k")
    val out = Profile.heavyHitters(d, col("k"), topN = 2)
      .as[(String, Long, Double)].collect().toSeq
    assert(out === Seq(("a", 6L, 0.6), ("b", 3L, 0.3)))
  }

  test("zValue interleaves bits; zOrderLayout yields disjoint partition z-ranges") {
    // a=3 (0011), b=5 (0101): z = a0<<0 | b0<<1 | a1<<2 | b1<<3 | a2<<4 | b2<<5
    //   = 1 + 2 + 4 + 0 + 0 + 32 = 39
    val one = Seq((3L, 5L)).toDF("a", "b")
      .select(graft.ops.Distribute.zValue(col("a"), col("b"), 4).as("z"))
      .as[Long].head()
    assert(one === 39L)

    val df = (0L until 1024L).map(i => (i % 32, i / 32)).toDF("a", "b")
    val laid = graft.ops.Distribute.zOrderLayout(df, col("a"), col("b"),
      bits = 8, partitions = 4)
    val ranges = laid.select(spark_partition_id().as("p"), col("z"))
      .groupBy("p").agg(min("z").as("lo"), max("z").as("hi"))
      .as[(Int, Long, Long)].collect().sortBy(_._2)
    ranges.sliding(2).foreach {
      case Array((_, _, hi1), (_, lo2, _)) => assert(hi1 <= lo2)
      case _ =>
    }
  }

  test("asofPriorTolerance nulls matches older than the tolerance") {
    def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)
    val e = Seq(
      (1L, ts(0), 7L, "view"),      // the only view for user 7
      (2L, ts(100), 7L, "purchase"), // fresh (100s old)
      (3L, ts(5000), 7L, "purchase") // stale (5000s > 3600)
    ).toDF("event_id", "ts", "user_id", "event_type")
    val out = graft.ops.Temporal.asofPriorTolerance(e,
      key = col("user_id"), ts = col("ts"), idCol = col("event_id"),
      leftPred = col("event_type") === "view",
      rightPred = col("event_type") === "purchase",
      maxAgeSeconds = 3600L)
      .select(col("id"), col("asof_id")).as[(Long, Option[Long])]
      .collect().toMap
    assert(out(2L) === Some(1L))
    assert(out(3L) === None)
  }

  test("bigramLm: counts and conditional probabilities over the corpus") {
    val d = Seq((1L, "a b a b"), (2L, "a b c")).toDF("doc_id", "text")
    val out = graft.ops.Text.bigramLm(d, topN = 10)
      .as[(String, String, Long, Double)].collect().toSeq
    // bigrams: doc1 (a,b),(b,a),(a,b); doc2 (a,b),(b,c) → c(a)=3, c(b)=2
    assert(out.head === (("a", "b", 3L, 1.0)))
    assert(out.toSet.contains(("b", "a", 1L, 0.5)))
    assert(out.toSet.contains(("b", "c", 1L, 0.5)))
  }

  test("profileNumeric handles an empty table: null bounds, zero counts") {
    val empty = Seq.empty[(Option[Long], Option[Double])].toDF("a", "b")
    val out = graft.ops.Profile.profileNumeric(empty, Seq("a", "b"))
      .as[(String, Option[Double], Option[Double], Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(out("a") === (("a", None, None, 0L, 0L)))
    assert(out("b") === (("b", None, None, 0L, 0L)))
  }

  test("mixtureSample with quota above the stratum size keeps the whole stratum") {
    val d = Seq((1L, "tiny"), (2L, "tiny")).toDF("doc_id", "source")
    val out = graft.ops.Shard.mixtureSample(d, col("source"), col("doc_id"), lit(100))
      .as[(Long, String)].collect()
    assert(out.length === 2)
  }

  test("boilerplateStrip with dfFrac=1.0 strips nothing (no word exceeds it)") {
    val d = Seq((1L, "a b"), (2L, "a c")).toDF("doc_id", "text")
    val out = graft.ops.Scrub.boilerplateStrip(d, dfFrac = 1.0)
      .as[(Long, String, Long)].collect().map(r => r._1 -> r._2).toMap
    assert(out(1L) === "a b" && out(2L) === "a c")
  }

  test("gdprDeleteAudit reports deleted vs remaining per table") {
    val events = Seq((1L, 97L), (2L, 97L), (3L, 5L)).toDF("id", "uid")
    val orders = Seq((10L, 5L), (11L, 7L)).toDF("oid", "cust")
    val forget = Seq(97L).toDF("forget_id")
    val out = graft.ops.Scrub.gdprDeleteAudit(Seq(
      ("events", events, col("uid")), ("orders", orders, col("cust"))), forget)
      .as[(String, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out("events") === ((2L, 1L)))
    assert(out("orders") === ((0L, 2L)))
  }

  test("refIntegrity counts orphan rows and keys per FK edge") {
    val child = Seq((1L, 100L), (2L, 100L), (3L, 999L)).toDF("id", "fk")
    val parent = Seq(100L).toDF("pk")
    val out = graft.ops.Quality.refIntegrity(Seq(
      ("child->parent", child, col("fk"), parent, col("pk")),
      ("parent->parent", parent, col("pk"), parent, col("pk"))))
      .as[(String, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out("child->parent") === ((1L, 1L)))   // fk 999: one row, one key
    assert(out("parent->parent") === ((0L, 0L)))  // self edge: no orphans
  }

  test("heavyHitters scans the input once (total reuses the counts exchange)") {
    val d = (1L to 200L).map(i => (i, s"k${i % 5}")).toDF("id", "k")
    val hh = Profile.heavyHitters(d, col("k"), topN = 3)
    hh.collect() // AQE plants ReusedExchange at stage materialization
    val plan = hh.queryExecution.executedPlan.toString
    assert(plan.contains("ReusedExchange"),
      s"expected the total branch to reuse the counts exchange:\n$plan")
  }

  test("mixtureSample maxQuota plants a WindowGroupLimit prune, same result") {
    val d = (1L to 100L).map(i => (i, if (i <= 60) "big" else "small"))
      .toDF("doc_id", "source")
    val quota = when(col("source") === "big", 10).otherwise(3)
    val pruned = Shard.mixtureSample(d, col("source"), col("doc_id"), quota,
      maxQuota = Some(10))
    assert(pruned.queryExecution.executedPlan.toString.contains("WindowGroupLimit"),
      "literal maxQuota bound should enable the WindowGroupLimit prune")
    val without = Shard.mixtureSample(d, col("source"), col("doc_id"), quota)
    assert(pruned.as[(Long, String)].collect().toSet ===
      without.as[(Long, String)].collect().toSet)
  }

  test("qualityWeightedSample: score 1 keeps all, 0 keeps none, higher " +
       "score never drops a kept row") {
    val d = (1L to 400L).map(i => (i, (i % 11).toDouble / 10.0)).toDF("id", "sc")
    def kept(scale: Double) = Shard.qualityWeightedSample(
        d.withColumn("sc", least(lit(1.0), col("sc") + scale)), col("id"), col("sc"))
      .select("id").as[Long].collect().toSet
    assert(Shard.qualityWeightedSample(
      d.withColumn("sc", lit(1.0)), col("id"), col("sc")).count() === 400L)
    assert(Shard.qualityWeightedSample(
      d.withColumn("sc", lit(0.0)), col("id"), col("sc")).count() === 0L)
    val base = kept(0.0)
    val boosted = kept(0.3)
    assert(base.subsetOf(boosted))
    assert(boosted.size > base.size)
  }

  test("qualityTopCut keeps exactly floor(n*pct/100) top-score rows per stratum") {
    // stratum a: 10 rows scores 0.1..1.0; stratum b: 7 rows 0.1..0.7
    val d = ((1 to 10).map(i => ("a", i.toLong, i / 10.0)) ++
      (1 to 7).map(i => ("b", 100L + i, i / 10.0))).toDF("src", "id", "sc")
    val out = Shard.qualityTopCut(d, col("src"), col("sc"), col("id"), keepPct = 25)
      .as[(String, Long, Double)].collect()
    val byS = out.groupBy(_._1)
    // floor(10*0.25)=2, floor(7*0.25)=1 — and they are the TOP scores
    assert(byS("a").map(_._2).sorted.toSeq === Seq(9L, 10L))
    assert(byS("b").map(_._2).toSeq === Seq(107L))
  }

  test("qualityTopCut tie at the cut line resolves by id, deterministically") {
    val d = (1L to 8L).map(i => ("s", i, 0.5)).toDF("src", "id", "sc")
    val out = Shard.qualityTopCut(d, col("src"), col("sc"), col("id"), keepPct = 50)
      .as[(String, Long, Double)].collect().map(_._2).sorted.toSeq
    assert(out === Seq(1L, 2L, 3L, 4L)) // all-equal scores: lowest ids win
  }

  test("changepointCusum finds the level-shift day in scaled integers") {
    // counts 1,1,1,5,5,5 -> mean 3; |S| peaks on day 3 (last pre-shift day)
    val rows = (1 to 6).flatMap { day =>
      val n = if (day <= 3) 1 else 5
      (1 to n).map(i => ("a", java.sql.Timestamp.valueOf(f"2024-01-0$day 12:00:0$i")))
    }
    val out = Profile.changepointCusum(rows.toDF("g", "ts"), col("g"), col("ts"))
      .as[(String, java.sql.Date, Long, Long, Long)].collect()
    assert(out.length === 1)
    val (_, day, s, nDays, total) = out.head
    assert(day.toString === "2024-01-03")
    assert((s, nDays, total) === ((-36L, 6L, 18L))) // 6*3 - 3*18
  }

  test("changepointCusum flat series: |S|=0 everywhere, earliest day wins") {
    val rows = (1 to 4).map(d =>
      ("b", java.sql.Timestamp.valueOf(s"2024-02-0$d 00:00:00")))
    val out = Profile.changepointCusum(rows.toDF("g", "ts"), col("g"), col("ts"))
      .as[(String, java.sql.Date, Long, Long, Long)].collect()
    assert(out.head._2.toString === "2024-02-01")
    assert(out.head._3 === 0L)
  }

  test("kAnonymity emits exactly the sub-k classes with their sizes") {
    val d = Seq(("a", 1), ("a", 1), ("a", 1), ("a", 2), ("b", 1), ("b", 1))
      .toDF("qi1", "qi2")
    val out = Scrub.kAnonymity(d, Seq(col("qi1"), col("qi2")), k = 3)
      .as[(String, Int, Long, Long)].collect().toSet
    // ("a",1) has 3 rows (>= k, suppressed from report); the others are at risk
    assert(out === Set(("a", 2, 1L, 1L), ("b", 1, 2L, 2L)))
    intercept[IllegalArgumentException] {
      Scrub.kAnonymity(d, Seq(col("qi1")), k = 1)
    }
  }

  test("hllSlidingDistinct: merged-register window estimate == single-shot " +
       "estimate on the window's raw slice (mergeability)") {
    val ev = for (d <- 0 until 10; u <- 0 until (20 + 3 * d))
      yield (d, (d * 37 + u * 13) % 200L)
    val df = ev.toDF("dn", "user_id")
      .select(date_add(lit("2024-01-01").cast("date"), col("dn")).as("ts"),
        col("user_id"), col("dn"))
    val slid = Profile.hllSlidingDistinct(df, col("ts").cast("timestamp"),
        col("user_id"), windowDays = 7)
      .select(col("day").cast("string"), col("n_exact"), col("hll_estimate"))
      .as[(String, Long, Double)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    // last day's trailing window = days 3..9; a fresh single-shot sketch
    // over exactly that slice must produce the identical estimate
    val oneShot = Profile.hllDistinct(
        df.filter(col("dn") >= 3), lit("w"), col("user_id"))
      .select(col("n_exact"), col("hll_estimate"))
      .as[(Long, Double)].collect().head
    assert(slid("2024-01-10") === ((oneShot._1, oneShot._2)))
    assert(slid.size === 10)
  }

  test("hllMergeRegs: any batching of the feed folds to the single-shot " +
       "register table") {
    val rnd = new scala.util.Random(3)
    val ev = Seq.fill(300)((rnd.nextInt(5), rnd.nextInt(400).toLong))
    val mk = (rows: Seq[(Int, Long)]) => Profile.hllDailyRegs(
      rows.toDF("dn", "user_id")
        .select(date_add(lit("2024-03-01").cast("date"), col("dn"))
          .cast("timestamp").as("ts"), col("user_id")),
      col("ts"), col("user_id"))
    val cuts = Seq(70, 180) // 3 uneven batches
    val folded = Seq(ev.slice(0, cuts(0)), ev.slice(cuts(0), cuts(1)),
        ev.drop(cuts(1)))
      .map(mk).reduce(Profile.hllMergeRegs)
    val single = mk(ev)
    val f = folded.select(col("day").cast("string"), col("__b"), col("M"))
      .as[(String, Long, Int)].collect().toSet
    val s = single.select(col("day").cast("string"), col("__b"), col("M"))
      .as[(String, Long, Int)].collect().toSet
    assert(f === s)
  }

  test("abTestReport matches a plain-Scala Welch z on a random feed") {
    val rnd = new scala.util.Random(7)
    val ev = Seq.fill(400)(
      (rnd.nextInt(40).toLong + 1, math.round(rnd.nextDouble() * 1e4) / 100.0))
    val got = Profile.abTestReport(ev.toDF("user_id", "value"),
        col("user_id"), col("value"))
      .as[(Long, Long, Double, Double, Double, Double)].collect().head
    // reference: per-unit cent totals, hash-parity arms, Welch z
    val perUnit = ev.groupBy(_._1).toSeq.map { case (u, es) =>
      (u * 1000003L % 1000000007L) % 2 -> es.map(e => math.round(e._2 * 100)).sum
    }
    def arm(a: Long) = {
      val s = perUnit.filter(_._1 == a).map(_._2.toDouble)
      val (n, t, q) = (s.length.toDouble, s.sum, s.map(x => x * x).sum)
      (n, t / n / 100.0, (q - t * t / n) / (n - 1) / 10000.0)
    }
    val ((n0, m0, v0), (n1, m1, v1)) = (arm(0), arm(1))
    def r6(x: Double) = math.round(x * 1e6) / 1e6
    assert(got._1 === n0.toLong && got._2 === n1.toLong)
    assert(math.abs(got._3 - r6(m0)) < 1e-9 && math.abs(got._4 - r6(m1)) < 1e-9)
    assert(math.abs(got._6 - r6((m1 - m0) / math.sqrt(v1 / n1 + v0 / n0))) < 1e-9)
  }

  test("profileNumeric: one row per column with min/max/nulls/distinct") {
    val d = Seq((Some(1L), Some(10.0)), (Some(5L), None), (Some(5L), Some(-2.5)))
      .toDF("a", "b")
    val out = Profile.profileNumeric(d, Seq("a", "b"))
      .as[(String, Option[Double], Option[Double], Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(out("a") === (("a", Some(1.0), Some(5.0), 0L, 2L)))
    assert(out("b") === (("b", Some(-2.5), Some(10.0), 1L, 2L)))
  }
}
