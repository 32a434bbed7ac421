package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Distribute, Profile}

/** Round-8 operator additions: the approx-percentile MAD sibling, the
  * deterministic bottom-k quantile sketch, and the NULL-skew join
  * bypass.
  */
class Round8OpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val sf = "/root/testdata/sf0.001"

  private def lineitem = Tables.lineitem(spark, sf)
  private def rowId = col("l_orderkey") * 8 + col("l_linenumber")

  test("sketchQuantiles: mergeability holds for ANY shard count (merged " +
       "per-shard sketches == the global sketch), and sub-k groups are " +
       "exact") {
    val global = Profile.sketchQuantiles(lineitem, col("l_returnflag"),
      rowId, col("l_extendedprice")).collect().sortBy(_.getString(0))
    for (shards <- Seq(2, 7, 16)) {
      val merged = Profile.sketchQuantilesMerged(lineitem,
        col("l_returnflag"), rowId, col("l_extendedprice"),
        shards = shards).collect().sortBy(_.getString(0))
      assert(merged.map(_.toString).toSeq === global.map(_.toString).toSeq,
        s"merge identity violated at shards=$shards")
    }
    // a group smaller than k is retained whole -> quantiles are EXACT
    val tiny = Profile.sketchQuantiles(
      lineitem.limit(40), lit("all"), rowId, col("l_extendedprice"), k = 256)
      .collect()
    assert(tiny.head.getLong(1) === 40) // sample_n == group size
  }

  test("sketchQuantiles: sample p50 lands inside the exact [p35, p65] " +
       "rank window (3-sigma binomial bound at k=256)") {
    val est = Profile.sketchQuantiles(lineitem, col("l_returnflag"),
      rowId, col("l_extendedprice"))
      .select(col("g"), col("p50"))
    val exact = lineitem
      .select(col("l_returnflag").as("g"),
        round(col("l_extendedprice") * 100).cast("long").as("c"))
      .groupBy(col("g"))
      .agg(percentile(col("c"), lit(0.35)).as("qlo"),
        percentile(col("c"), lit(0.65)).as("qhi"))
    val bad = est.join(exact, "g")
      .filter(col("p50") * 100 < col("qlo") || col("p50") * 100 > col("qhi"))
      .collect()
    assert(bad.isEmpty, s"sample median outside rank window: ${bad.mkString}")
  }

  test("sketch_quantiles plan: the literal-k filter compiles to a " +
       "WindowGroupLimit prune (O(k) rows per group reach the shuffle)") {
    val p = SparkEntry.queries("sketch_quantiles")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(p.contains("WindowGroupLimit"), p)
  }

  test("nullSkewLeftJoin == the plain left join, and the executed plan " +
       "joins only the non-null branch (one join, null rows bypass)") {
    val probe = Tables.events(spark, sf)
      .select(col("event_id"), col("event_type"),
        when(pmod(col("event_id"), lit(5)) < 3, col("user_id"))
          .otherwise(lit(null).cast("long")).as("fk"))
    val build = Tables.customer(spark, sf)
      .select(col("c_custkey"), col("c_mktsegment"))
    val ours = Distribute.nullSkewLeftJoin(probe, build, "fk", "c_custkey")
    val plain = probe.join(build, col("fk") === col("c_custkey"), "left")
    assert(ours.count() === plain.count())
    assert(ours.exceptAll(plain).isEmpty && plain.exceptAll(ours).isEmpty)
    val p = ours.queryExecution.executedPlan.toString
    assert("SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin".r
      .findAllIn(p).size === 1, p)
    assert(p.contains("Union"), p)
  }

  test("madOutliersApproxContract: GK rank bounds hold even at coarse " +
       "accuracy, and the approx median lands inside the ε-rank window " +
       "of the exact order statistics") {
    val ev = Tables.events(spark, sf)
      .select(col("event_type"), col("value"))
    // accuracy 50 so the sketch genuinely compresses at sf0.001 group
    // sizes (at the registered accuracy=1000 a small group is retained
    // exactly and the test would prove nothing)
    val out = Profile.madOutliersApproxContract(ev, col("event_type"),
      col("value"), accuracy = 50).collect()
    assert(out.length >= 2)
    out.foreach { r =>
      assert(r.getBoolean(2), s"median rank bound violated for ${r.getString(0)}")
      assert(r.getBoolean(3), s"MAD rank bound violated for ${r.getString(0)}")
    }

    // numeric check VERDICT r7 item 5 asks for: the approx median must
    // sit within the exact order statistics at p ± 2ε (2ε margin covers
    // the rank-convention gap between GK ranks 1..n and percentile's
    // interpolated 1+(n-1)p positions)
    val eps = 2.0 / 50
    val rows = ev.select(col("event_type").as("g"),
      round(col("value") * 100).cast("long").as("xc"))
    val apx = rows.groupBy(col("g"))
      .agg(percentile_approx(col("xc"), lit(0.5), lit(50)).as("amed"))
    val exact = rows.groupBy(col("g"))
      .agg(percentile(col("xc"), lit(0.5 - eps)).as("qlo"),
        percentile(col("xc"), lit(0.5 + eps)).as("qhi"))
    val bad = apx.join(exact, "g")
      .filter(col("amed").cast("double") < col("qlo") ||
        col("amed").cast("double") > col("qhi"))
      .collect()
    assert(bad.isEmpty,
      s"approx median outside the ε-rank window: ${bad.mkString(", ")}")
  }
}
