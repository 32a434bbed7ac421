package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Temporal, Text}

/** Round-6 eleventh wave: SCD2 merge and per-source topic terms. */
class Wave11Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("scd2Merge: closes the open row at the first batch change, " +
       "chains batch versions, leaves history untouched") {
    val dim = Seq(
      // key a: one closed version + one open
      ("a", 1.0, 10L, 100L, Some(200L), false),
      ("a", 2.0, 11L, 200L, None, true),
      // key b: open only, no batch changes -> must stay open
      ("b", 9.0, 12L, 150L, None, true)
    ).toDF("k", "v", "id", "from_s", "to_s", "is_current")
      .select(col("k"), col("v"), col("id"),
        timestamp_seconds(col("from_s")).as("valid_from"),
        timestamp_seconds(col("to_s")).as("valid_to"), col("is_current"))
    val batch = Seq(("a", 3.0, 20L, 300L), ("a", 4.0, 21L, 400L))
      .toDF("k", "v", "id", "ts_s")
      .select(col("k"), col("v"), col("id"),
        timestamp_seconds(col("ts_s")).as("ts"))
    val out = Temporal.scd2Merge(dim, batch, Seq("k"), col("ts"),
        col("id"), Seq("v"))
      .select(col("k"), col("v"), col("valid_from").cast("long"),
        col("valid_to").cast("long"), col("is_current"))
      .as[(String, Double, Long, Option[Long], Boolean)].collect().toSet
    assert(out === Set(
      ("a", 1.0, 100L, Some(200L), false), // history untouched
      ("a", 2.0, 200L, Some(300L), false), // open row closed by batch
      ("a", 3.0, 300L, Some(400L), false), // batch chained
      ("a", 4.0, 400L, None, true),        // newest open
      ("b", 9.0, 150L, None, true)))       // unaffected key stays open
  }

  test("sourceTopTerms: a term concentrated in one source outranks a " +
       "corpus-common one there") {
    val docs = Seq(
      (1L, "zebra zebra common", "s1"),
      (2L, "common common common", "s2"),
      (3L, "common other", "s3")
    ).toDF("doc_id", "text", "source")
    val out = Text.sourceTopTerms(docs, topK = 1)
      .select("source", "term").as[(String, String)].collect().toMap
    // zebra: tf=2, source_df=1, n=3 -> score 6; common in s1: tf=1,
    // df=3 -> score 1
    assert(out("s1") === "zebra")
  }
}
