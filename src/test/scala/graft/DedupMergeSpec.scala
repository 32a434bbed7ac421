package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Dedup, Merge}

class DedupMergeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ev(rows: (Long, String, String, Int)*) =
    rows.toDF("id", "key", "payload", "v")

  test("dedupExact keeps the first row per key by explicit order") {
    val out = Dedup.dedupExact(
      ev((2L, "a", "late", 0), (1L, "a", "early", 0), (3L, "b", "only", 0)),
      Seq("key"), Seq(col("id")))
    assert(out.orderBy("key").as[(Long, String, String, Int)].collect().toSeq ===
      Seq((1L, "a", "early", 0), (3L, "b", "only", 0)))
  }

  test("dedupLatest is latest-wins with deterministic tiebreak") {
    // v ties on key a → higher id wins (tiebreak desc)
    val out = Dedup.dedupLatest(
      ev((1L, "a", "old", 5), (2L, "a", "tie1", 9), (3L, "a", "tie2", 9)),
      Seq("key"), col("v"), Seq(col("id")))
    assert(out.select("payload").head().getString(0) === "tie2")
  }

  test("all-duplicate input collapses to one row per key") {
    val allDup = ev(Seq.fill(10)((1L, "k", "x", 1)): _*)
    assert(Dedup.dedupLatest(allDup, Seq("key"), col("v"), Seq(col("id"))).count() === 1)
  }

  test("mergeUpsert: source wins on match, target-only kept, source-only inserted") {
    val target = Seq((1L, "t1"), (2L, "t2")).toDF("k", "val")
    val source = Seq((2L, "s2"), (3L, "s3")).toDF("k", "val")
    val out = Merge.mergeUpsert(target, source, Seq("k"))
      .as[(Long, String)].collect().toMap
    assert(out === Map(1L -> "t1", 2L -> "s2", 3L -> "s3"))
  }

  test("mergeUpsert NULL keys never match (SQL MERGE semantics)") {
    val target = Seq((Option.empty[Long], "tnull"), (Some(1L), "t1")).toDF("k", "val")
    val source = Seq((Option.empty[Long], "snull")).toDF("k", "val")
    val out = Merge.mergeUpsert(target, source, Seq("k")).collect()
    // both NULL-key rows survive: target kept, source inserted
    assert(out.length === 3)
  }

  test("merge is idempotent: merge(merge(t,s),s) == merge(t,s)") {
    val target = Seq((1L, "t1"), (2L, "t2")).toDF("k", "val")
    val source = Seq((2L, "s2"), (3L, "s3")).toDF("k", "val")
    val once = Merge.mergeUpsert(target, source, Seq("k"))
    val twice = Merge.mergeUpsert(once, source, Seq("k"))
    assert(once.as[(Long, String)].collect().toSet ===
      twice.as[(Long, String)].collect().toSet)
  }
}
