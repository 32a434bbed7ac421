package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Quality
import graft.ops.Quality.DqRule

/** Round-6 tenth wave: BM25 retrieval, config-driven DQ rules, seasonal
  * anomaly baseline.
  */
class Wave10Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("searchBm25: tf saturation — 10x the term count does NOT give " +
       "10x the score, and longer docs are penalized") {
    val docs = Seq(
      (1L, ("alpha " * 10).trim),              // tf=10, dl=10
      (2L, "alpha"),                           // tf=1,  dl=1
      (3L, ("alpha " + "pad " * 30).trim)      // tf=1,  dl=31
    ).toDF("doc_id", "text")
    val out = graft.ops.Text.searchBm25(docs, Seq("alpha"), k = 10)
      .select("doc_id", "score").as[(Long, Double)].collect().toMap
    assert(out(1L) > out(2L))              // more occurrences still help
    assert(out(1L) < 10 * out(2L))         // but sub-linearly (k1 saturation)
    assert(out(3L) < out(2L))              // length normalization penalty
  }

  test("rulesReport: one row per rule, violations counted in one scan, " +
       "tolerance decides pass") {
    val df = Seq(
      (1L, Some(5.0)), (2L, Some(-1.0)), (3L, None), (0L, Some(400.0))
    ).toDF("user_id", "value")
    val out = Quality.rulesReport(df, Seq(
        DqRule("v_not_null", "value", "not_null"),
        DqRule("v_nonneg", "value", "min", 0.0),
        DqRule("v_cap", "value", "max", 300.0, maxViolations = 1),
        DqRule("u_positive", "user_id", "positive")))
      .select("rule", "n_rows", "n_violations", "passed")
      .as[(String, Long, Long, Boolean)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(out("v_not_null") === ((4L, 1L, false)))
    assert(out("v_nonneg") === ((4L, 1L, false)))
    assert(out("v_cap") === ((4L, 1L, true))) // within tolerance
    assert(out("u_positive") === ((4L, 1L, false)))
  }

  test("anomaly_seasonal flags within (type, weekday) groups only") {
    val out = SparkEntry.queries("anomaly_seasonal")(spark,
        "/root/testdata/sf0.001")
      .select("season").as[String].collect()
    assert(out.forall(_.contains("|")))
  }
}
