package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Graph, Quality, Text}

/** Round-6 twenty-first wave: k-core peel, deterministic MLM masking,
  * Cohen's kappa rater agreement.
  */
class Wave21Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("kCore: pendant peels off, triangle survives k=2, nothing " +
       "survives k=3") {
    val edges = Seq(("a", "b"), ("b", "c"), ("c", "a"), ("c", "d"))
      .toDF("src", "dst")
    val core2 = Graph.kCore(spark, edges, k = 2)
      .as[(String, Long)].collect().toMap
    assert(core2 === Map("a" -> 2L, "b" -> 2L, "c" -> 2L))
    val core3 = Graph.kCore(spark, edges, k = 3)
    assert(core3.count() === 0L)
  }

  test("kCore: K4 with a tail keeps exactly the clique at k=3") {
    val k4 = Seq(("1", "2"), ("1", "3"), ("1", "4"), ("2", "3"),
      ("2", "4"), ("3", "4"), ("4", "5"), ("5", "6"))
      .toDF("src", "dst")
    val out = Graph.kCore(spark, k4, k = 3)
      .as[(String, Long)].collect().toMap
    assert(out === Map("1" -> 3L, "2" -> 3L, "3" -> 3L, "4" -> 3L))
  }

  test("mlmMask: masks exactly the hash-selected positions") {
    val toks = (0 until 12).map(i => s"w$i")
    val docId = 1L // positions 3..7 of 12 are hash-selected for this id
    val df = Seq((docId, toks.mkString(" "))).toDF("doc_id", "text")
    def flag(pos: Long): Boolean =
      ((docId * 131L + pos) * 1000003L % 1000000007L) % 100L < 15L
    val expMasked = toks.zipWithIndex
      .map { case (t, i) => if (flag(i)) "[MASK]" else t }.mkString(" ")
    val expLabels = toks.zipWithIndex.collect {
      case (t, i) if flag(i) => s"$i:$t"
    }.mkString(",")
    val expN = toks.indices.count(i => flag(i))
    assert(expN > 0, "test doc should have at least one masked position")
    val r = Text.mlmMask(df).as[(Long, String, Long, String)].head()
    assert(r === ((docId, expMasked, expN.toLong, expLabels)))
  }

  test("mlmMask: masking is a pure projection (no shuffle in the plan)") {
    val df = Seq((1L, "a b c")).toDF("doc_id", "text")
    val plan = Text.mlmMask(df).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"))
  }

  test("raterAgreement: perfect, independent, and degenerate cases") {
    // perfect agreement -> kappa 1
    val perfect = Seq((true, true), (false, false), (true, true))
      .toDF("a", "b")
    val p = Quality.raterAgreement(perfect, col("a"), col("b"))
      .as[(Long, Long, Long, Long, Double, Double, Option[Double])].head()
    assert(p._5 === 1.0 && p._7 === Some(1.0))
    // balanced independence -> po = pe = 0.5 -> kappa 0
    val indep = Seq((true, true), (true, false), (false, true),
      (false, false)).toDF("a", "b")
    val i = Quality.raterAgreement(indep, col("a"), col("b"))
      .as[(Long, Long, Long, Long, Double, Double, Option[Double])].head()
    assert(i === ((1L, 1L, 1L, 1L, 0.5, 0.5, Some(0.0))))
    // both raters constant -> pe = 1 -> kappa undefined (NULL)
    val const = Seq((true, true), (true, true)).toDF("a", "b")
    val c = Quality.raterAgreement(const, col("a"), col("b"))
      .as[(Long, Long, Long, Long, Double, Double, Option[Double])].head()
    assert(c._7 === None)
  }
}
