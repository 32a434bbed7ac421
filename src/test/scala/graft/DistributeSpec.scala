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

  test("zValue raises on a key outside the bit budget instead of truncating") {
    val over = Seq((70000L, 1L)).toDF("a", "b") // 70000 >= 2^16
      .select(Distribute.zValue(col("a"), col("b"), 16).as("z"))
    val e = intercept[Exception](over.collect())
    assert(e.getMessage.contains("z-order key exceeds"),
      s"expected a loud budget failure, got: ${e.getMessage}")
    val neg = Seq((-1L, 1L)).toDF("a", "b")
      .select(Distribute.zValue(col("a"), col("b"), 16).as("z"))
    intercept[Exception](neg.collect())
  }

  test("dropManagedTable clears nested partitioned-table layouts") {
    val t = "graft_test_part_drop"
    Distribute.dropManagedTable(spark, t)
    (1L to 10L).map(i => (i, i % 2)).toDF("v", "p")
      .write.partitionBy("p").saveAsTable(t)
    val loc = new java.io.File(
      spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"), t)
    assert(loc.exists() && loc.listFiles().exists(_.isDirectory))
    Distribute.dropManagedTable(spark, t)
    assert(!loc.exists(), "partitioned warehouse dir should be fully removed")
    // and the location is reusable immediately
    Seq((1L, 0L)).toDF("v", "p").write.partitionBy("p").saveAsTable(t)
    Distribute.dropManagedTable(spark, t)
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
