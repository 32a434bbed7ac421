package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Distribute

class DistributeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("saltedJoin result equals the plain join") {
    val big = (1L to 100L).map(i => (i, i % 3, s"p$i")).toDF("id", "k", "payload")
    val small = Seq((0L, "a"), (1L, "b"), (2L, "c")).toDF("k", "name")
    val plain = big.join(small, "k").select("id", "k", "payload", "name")
    val salted = Distribute.saltedJoin(big, small, Seq("k"),
        bigSalt = col("id"), salts = 4)
      .select("id", "k", "payload", "name")
    assert(salted.as[(Long, Long, String, String)].collect().toSet ===
      plain.as[(Long, Long, String, String)].collect().toSet)
  }

  test("bucketedJoin plan contains no shuffle exchange") {
    val l = (1L to 50L).map(i => (i, s"l$i")).toDF("lk", "lv")
    val r = (1L to 50L).map(i => (i % 25, s"r$i")).toDF("rk", "rv")
    val joined = Distribute.bucketedJoin(spark, l, r, "lk", "rk", 4, "graft_test_bkt")
    assert(joined.count() === 48) // keys 1..24 match, 2 right rows each
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("ShuffleExchange"),
      s"expected shuffle-free bucketed join, got:\n$plan")
  }
}
