package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Eval

/** Round-6 twenty-third wave: the evaluation suite — NDCG, gains
  * table, confusion cells, chi-squared screen, calibration bins.
  */
class Wave23Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("gain table: strictly decreasing, cum strictly increasing") {
    val g = Eval.gainScaled(5)
    assert(g.head === 1000000L)
    assert(g.sliding(2).forall(p => p(0) > p(1)))
    val c = Eval.cumGainScaled(5)
    assert(c.head === 0L && c.last === g.sum)
    assert(c.sliding(2).forall(p => p(0) < p(1)))
  }

  test("ndcgEval: all-relevant corpus scores exactly 1.0") {
    // 6 vectors, one label: every neighbor is relevant, dcg == idcg
    val vecs = (0L to 5L)
      .map(i => (i, Array.tabulate(3)(d => (i + d + 1).toFloat), 7))
      .toDF("vec_id", "embedding", "label")
    val out = Eval.ndcgEval(vecs, sampleMod = 3, k = 5)
      .select("ndcg", "hits", "idcg_scaled")
      .as[(Double, Long, Long)].collect()
    assert(out.nonEmpty)
    out.foreach { case (ndcg, hits, idcg) =>
      assert(ndcg === 1.0)
      assert(hits === 5L)
      assert(idcg === Eval.cumGainScaled(5).last)
    }
  }

  test("ndcgEval: R < k caps IDCG at the cum prefix") {
    // probe 0 has only 2 same-label partners -> idcg = cum(2)
    val vecs = Seq(
      (0L, Array(1f, 0f), 1), (1L, Array(0.9f, 0.1f), 1),
      (2L, Array(0.8f, 0.2f), 1), (3L, Array(0f, 1f), 2),
      (4L, Array(0.1f, 1f), 2), (5L, Array(0.2f, 1f), 2),
      (6L, Array(0.3f, 1f), 2)).toDF("vec_id", "embedding", "label")
    val row = Eval.ndcgEval(vecs, sampleMod = 7, k = 5)
      .filter(col("q_id") === 0L)
      .select("idcg_scaled", "ndcg").as[(Long, Double)].head()
    assert(row._1 === Eval.cumGainScaled(5)(2))
    // the two same-label vectors are the two nearest -> perfect score
    assert(row._2 === 1.0)
  }

  test("decileLift: deciles partition users, capture ends at 1.0") {
    val rows = SparkEntry.queries("decile_lift")(spark, sf)
      .orderBy("decile")
      .select("decile", "n_units", "positives", "cum_capture")
      .as[(Long, Long, Long, Double)].collect()
    assert(rows.map(_._1).toSeq === (0L to 9L))
    val users = Tables.events(spark, sf)
      .select("user_id").distinct().count()
    assert(rows.map(_._2).sum === users)
    assert(rows.last._4 === 1.0)
    // cum_capture is nondecreasing
    assert(rows.map(_._4).sliding(2).forall(p => p(0) <= p(1) + 1e-9))
  }

  test("eval_confusion: cells sum to probe count, margins consistent") {
    val cells = SparkEntry.queries("eval_confusion")(spark, sf)
      .select("true_label", "pred_label", "n", "true_total", "pred_total")
      .as[(Int, Int, Long, Long, Long)].collect()
    val probes = Tables.embeddings(spark, sf)
      .filter(col("vec_id") % 25 === 0).count()
    assert(cells.map(_._3).sum === probes)
    // row margins: per true_label, sum of n equals true_total
    cells.groupBy(_._1).foreach { case (_, g) =>
      assert(g.map(_._3).sum === g.head._4)
    }
    cells.groupBy(_._2).foreach { case (_, g) =>
      assert(g.map(_._3).sum === g.head._5)
    }
  }

  test("chi2Independence: an independent table has all-zero terms") {
    // value buckets identically distributed within each label
    val rows = for {
      lab <- Seq("a", "b"); v <- Seq(10.0, 10.0, 110.0); rep <- 1 to 4
    } yield (lab, v, rep)
    val df = rows.toDF("label", "value", "rep")
    val out = Eval.chi2Independence(df, col("value"), col("label"))
      .select("chi2_term", "expected", "observed")
      .as[(Double, Double, Long)].collect()
    assert(out.nonEmpty)
    out.foreach { case (term, expd, obs) =>
      assert(term === 0.0)
      assert(expd === obs.toDouble)
    }
  }

  test("calibration_bins: mean_pred lies inside its own bin") {
    val rows = SparkEntry.queries("calibration_bins")(spark, sf)
      .select("bin", "mean_pred", "n_units")
      .as[(Long, Double, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (bin, mp, _) =>
      if (bin < 9) assert(mp >= bin / 10.0 - 1e-9 && mp < (bin + 1) / 10.0)
      else assert(mp >= 0.9 - 1e-9 && mp <= 1.0)
    }
    val users = Tables.events(spark, sf)
      .select("user_id").distinct().count()
    assert(rows.map(_._3).sum === users)
  }
}
