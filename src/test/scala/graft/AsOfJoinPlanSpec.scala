package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.AsOf

class AsOfJoinPlanSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def sides(sf: String) = {
    val e = Tables.events(spark, sf)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"))
    def side(t: String) = e.filter(col("event_type") === t)
      .select(col("user_id").as("key"), col("ts"), col("event_id").as("id"))
    (side("view"), side("purchase"))
  }

  test("native as-of join equals the window-based asofPrior") {
    val e = Tables.events(spark, "/root/testdata/sf0.001")
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"),
        col("value"), col("props"))
    val windowed = graft.ops.Temporal.asofPrior(e,
      key = col("user_id"), ts = col("ts"), idCol = col("event_id"),
      leftPred = col("event_type") === "view",
      rightPred = col("event_type") === "purchase")
      .select(col("key"), col("id"), col("asof_id"))
      .as[(Long, Long, Option[Long])].collect().toSet

    val (views, purchases) = sides("/root/testdata/sf0.001")
    val native = AsOf.asofJoin(views, purchases, "key", "ts", "id")
      .select(col("key"), col("id"), col("l_id"))
      .as[(Long, Long, Option[Long])].collect().toSet

    assert(native === windowed)
    assert(native.nonEmpty)
    assert(native.exists(_._3.isEmpty)) // purchases before any view → null
  }

  test("physical plan is the custom merge exec, partitioned on the key") {
    val (views, purchases) = sides("/root/testdata/sf0.001")
    val df = AsOf.asofJoin(views, purchases, "key", "ts", "id")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin")) // SparkPlan.nodeName strips "Exec"
    assert(plan.contains("hashpartitioning"))
    assert(!plan.toLowerCase.contains("cartesian"))
  }

  test("filters above the as-of join push through to both scans") {
    val (views, purchases) = sides("/root/testdata/sf0.001")
    val joined = AsOf.asofJoin(views, purchases, "key", "ts", "id")
    val filtered = joined.filter(col("key") === 7L && col("id") > 100L)
    val opt = filtered.queryExecution.optimizedPlan.toString

    // the outer Filter is consumed: both conjuncts sit below the AsOfJoin
    val firstFilterIdx = opt.indexOf("Filter")
    val ajIdx = opt.indexOf("AsOfJoin")
    assert(ajIdx >= 0 && (firstFilterIdx < 0 || firstFilterIdx > ajIdx),
      s"filter not pushed below AsOfJoin:\n$opt")

    // the key predicate mirrors to the left side and reaches BOTH scans
    // (formatted mode: the simple plan string elides long filter lists)
    val physical = filtered.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    val pushedCount = "EqualTo\\(user_id,7\\)".r.findAllIn(physical).length
    assert(pushedCount >= 2,
      s"key filter did not reach both parquet scans:\n$physical")

    // semantics preserved vs filtering the unpushed result
    AsOf.asofJoin(views, purchases, "key", "ts", "id") // re-register no-op
    val expected = joined.collect().filter(r =>
      r.getAs[Long]("key") == 7L && r.getAs[Long]("id") > 100L).length
    assert(filtered.count() === expected)
  }

  test("empty left side: every right row emits with null left columns") {
    val views = Seq.empty[(Long, Long, Long)].toDF("key", "ts", "id")
    val purchases = Seq((1L, 10L, 5L), (2L, 20L, 6L)).toDF("key", "ts", "id")
    val out = AsOf.asofJoin(views, purchases, "key", "ts", "id")
      .select(col("id"), col("l_id"))
      .as[(Long, Option[Long])].collect().toMap
    assert(out === Map(5L -> None, 6L -> None))
  }

  test("null keys never match: null-key right rows get null left columns") {
    val views = Seq((Some(1L), 5L, 1L), (None, 6L, 2L))
      .toDF("key", "ts", "id")
    val purchases = Seq((Some(1L), 10L, 5L), (None, 10L, 6L))
      .toDF("key", "ts", "id")
    val out = AsOf.asofJoin(views, purchases, "key", "ts", "id")
      .select(col("id"), col("l_id"))
      .as[(Long, Option[Long])].collect().toMap
    assert(out(5L) === Some(1L)) // key 1 matches its view
    assert(out(6L) === None)     // null key matches nothing (incl. null-key left)
  }

  test("null timestamps: left null-ts rows skipped, right null-ts rows get null left") {
    // key 1: a null-ts view must not block the ts=5 view from matching,
    // and a null-ts purchase matches nothing
    val views = Seq((1L, Some(5L), 1L), (1L, None, 9L))
      .toDF("key", "ts", "id")
    val purchases = Seq((1L, Some(10L), 5L), (1L, None, 6L))
      .toDF("key", "ts", "id")
    val out = AsOf.asofJoin(views, purchases, "key", "ts", "id")
      .select(col("id"), col("l_id"))
      .as[(Long, Option[Long])].collect().toMap
    assert(out(5L) === Some(1L)) // null-ts left row neither matches nor blocks
    assert(out(6L) === None)     // null right ts → no match
  }

  test("null tiebreaks compare nulls-first and do not crash the merge") {
    // equal ts everywhere; left ties (null, 3), right ties (2, null).
    // nulls-first order: null <= 2 and null <= null, but 3 > null.
    val views = Seq((1L, 10L, None, 101L), (1L, 10L, Some(3L), 103L))
      .toDF("key", "ts", "tie", "vid")
    val purchases = Seq((1L, 10L, Some(2L), 5L), (2L, 10L, None, 6L))
      .toDF("key", "ts", "tie", "pid")
    val out = AsOf.asofJoin(views, purchases, "key", "ts", "tie")
      .select(col("pid"), col("l_vid"))
      .as[(Long, Option[Long])].collect().toMap
    assert(out(5L) === Some(101L)) // null tie <= 2, but 3 > 2 excluded
    assert(out(6L) === None)       // key 2 has no views at all
  }

  test("non-deterministic filters are NOT pushed below the as-of join") {
    val (views, purchases) = sides("/root/testdata/sf0.001")
    val joined = AsOf.asofJoin(views, purchases, "key", "ts", "id")
    // rand > 0.5 survives Spark's OptimizeRand (a bound like > -1.0 folds to true)
    val filtered = joined.filter(rand(42) > lit(0.5) && col("key") === 7L)
    val opt = filtered.queryExecution.optimizedPlan
    // the rand() conjunct must stay in a Filter ABOVE the AsOfJoin node
    val kept = opt.collect {
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter
          if f.child.isInstanceOf[graft.plans.AsOfJoin] => f
    }
    assert(kept.nonEmpty, s"non-deterministic filter was pushed:\n$opt")
    assert(kept.head.condition.find(!_.deterministic).nonEmpty)
    // while the deterministic key conjunct still reached both scans
    val physical = filtered.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    assert("EqualTo\\(user_id,7\\)".r.findAllIn(physical).length >= 2)
  }

  test("tie on ts: only left rows with tie <= right tie match") {
    // key 1: views at (ts=10,id=1) and (ts=10,id=9); purchase (ts=10,id=5)
    // → the id=9 view is 'after' the purchase in (ts, id) order
    val views = Seq((1L, 10L, 1L), (1L, 10L, 9L)).toDF("key", "ts", "id")
    val purchases = Seq((1L, 10L, 5L), (1L, 5L, 2L)).toDF("key", "ts", "id")
    val out = AsOf.asofJoin(views, purchases, "key", "ts", "id")
      .select(col("id"), col("l_id"))
      .as[(Long, Option[Long])].collect().toMap
    assert(out(5L) === Some(1L)) // not the id=9 view
    assert(out(2L) === None)     // ts=5 precedes every view
  }
}
