package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Features, Profile, Shard}

/** Round-6 eighteenth wave: Mann-Whitney AUC, CUPED adjustment,
  * per-cell mutual information, priority-sampling.
  */
class Wave18Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("aucRank: perfect separation 1.0, anti-separation 0.0, ties 0.5") {
    // positives all above negatives -> AUC 1
    val perfect = Seq((0, 1.00), (0, 2.00), (1, 3.00), (1, 4.00))
      .toDF("y", "value")
    val p = Profile.aucRank(perfect, col("y") === 1, col("value"))
      .as[(Long, Long, Option[Double])].head()
    assert(p === ((2L, 2L, Some(1.0))))
    // all scores equal -> every pair is a tie -> AUC 0.5
    val ties = Seq((0, 5.00), (0, 5.00), (1, 5.00)).toDF("y", "value")
    val t = Profile.aucRank(ties, col("y") === 1, col("value"))
      .as[(Long, Long, Option[Double])].head()
    assert(t === ((1L, 2L, Some(0.5))))
    // single class -> NULL
    val mono = Seq((1, 1.00), (1, 2.00)).toDF("y", "value")
    val m = Profile.aucRank(mono, col("y") === 1, col("value"))
      .as[(Long, Long, Option[Double])].head()
    assert(m === ((2L, 0L, None)))
  }

  test("aucRank: hand-computed mixed case with a cross-class tie") {
    // scores: neg {1, 3}, pos {3, 5}. Pairs: (1,3)+, (1,5)+, (3,3)=tie,
    // (3,5)+ -> AUC = (3 + 0.5) / 4 = 0.875
    val df = Seq((0, 0.01), (0, 0.03), (1, 0.03), (1, 0.05))
      .toDF("y", "value")
    val r = Profile.aucRank(df, col("y") === 1, col("value"))
      .as[(Long, Long, Option[Double])].head()
    assert(r === ((2L, 2L, Some(0.875))))
  }

  test("cupedAdjust: zero-variance covariate relation recovers exactly") {
    // y = 2x per unit: theta = 2, so y_adj = y - 2(x - xbar) = 2*xbar
    // for EVERY unit -> both adjusted means equal, diff_adjusted = 0.
    val cutoff = "2024-01-16"
    val rows = (1L to 40L).flatMap { u =>
      val x = u.toDouble // pre-period dollars
      Seq((u, java.sql.Timestamp.valueOf("2024-01-05 00:00:00"), x),
        (u, java.sql.Timestamp.valueOf("2024-01-20 00:00:00"), 2 * x))
    }
    val df = rows.toDF("user_id", "ts", "value")
    val out = Profile.cupedAdjust(df, col("user_id"), col("ts"),
      col("value"), cutoff)
    val r = out.select(col("theta"), col("adj_control"),
      col("adj_treatment"), col("diff_adjusted"))
      .as[(Double, Double, Double, Double)].head()
    assert(r._1 === 2.0)
    assert(r._2 === r._3)
    assert(r._4 === 0.0)
    // adjusted mean = 2 * xbar = 2 * mean(1..40) = 41.0
    assert(r._2 === 41.0)
  }

  test("featureMi: independent feature has lift 1 and zero MI everywhere") {
    val rows = for (b <- 0 until 2; l <- Seq("a", "b"); _ <- 0 until 5)
      yield (b * 60.0 + 1.0, l) // buckets 0 and 1, balanced labels
    val out = Features.featureMi(rows.toDF("value", "event_type"),
        col("value"), col("event_type"))
      .as[(Long, String, Long, Double, Double)].collect()
    assert(out.length === 4)
    assert(out.forall(c => c._3 === 5L && c._4 === 1.0 && c._5 === 0.0))
  }

  test("featureMi: deterministic dependence gives ln-2 contributions") {
    // label fully determined by bucket, balanced: lift = 2,
    // mi_contrib per cell = 0.5 * ln 2; off-diagonal cells absent.
    val rows = (for (_ <- 0 until 6) yield (1.0, "a")) ++
      (for (_ <- 0 until 6) yield (61.0, "b"))
    val out = Features.featureMi(rows.toDF("value", "event_type"),
        col("value"), col("event_type"))
      .as[(Long, String, Long, Double, Double)].collect()
    assert(out.length === 2)
    val ln2Half = BigDecimal(0.5 * math.log(2.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out.forall(c => c._4 === 2.0 && c._5 === ln2Half))
  }

  test("weightedSample: top-k by w/u priority, exact integer output") {
    val df = (1L to 1000L).map(i => (i, i.toDouble / 100.0))
      .toDF("id", "w")
    val out = Shard.weightedSample(df, col("id"), col("w"), k = 10)
      .as[(Long, Long, Long, Long)].collect()
    assert(out.length === 10)
    // ranks are 1..10 and the emitted hash matches the formula
    assert(out.map(_._1).toSeq === (1L to 10L))
    assert(out.forall { case (_, id, w, h) =>
      h === (id * 1000003L) % 1000000007L + 1L && w === id
    })
    // the reported order really is descending priority
    val prios = out.map { case (_, _, w, h) => w.toDouble * 1e6 / h }
    assert(prios.toSeq === prios.sortBy(-_).toSeq)
    // selection is invariant to input partitioning
    val out1 = Shard.weightedSample(df.repartition(7), col("id"),
      col("w"), k = 10).as[(Long, Long, Long, Long)].collect()
    assert(out1.toSeq === out.toSeq)
  }
}
