package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Distribute

/** Statistics-driven planning, proved: at 100 TB the optimizer cannot
  * see that a filter on a high-ndv column leaves 50 rows of a 50 TB
  * table — unless column statistics tell it. Without stats Spark costs
  * a filtered scan at the FULL file size (size-only estimation), so the
  * join of two such filtered facts must sort-merge; with
  * `ANALYZE TABLE … COMPUTE STATISTICS FOR COLUMNS` + CBO, filter
  * selectivity shrinks the estimate below the broadcast threshold and
  * the SAME query broadcasts. This spec runs the same join both ways
  * and asserts the strategies differ — the mechanism ANALYZE exists
  * for, observed in the plan, not assumed.
  */
class CboStatsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val sf = "/root/testdata/sf0.001"

  test("ANALYZE column stats flip a filtered fact-fact join from " +
       "sort-merge to broadcast under CBO") {
    val s = spark.newSession()
    // AQE's runtime re-plan would mask the static decision under test;
    // disable it so the compile-time estimate is what we observe
    s.conf.set("spark.sql.adaptive.enabled", "false")
    s.conf.set("spark.sql.cbo.enabled", "true")
    s.conf.set("spark.sql.cbo.planStats.enabled", "true")

    Distribute.dropManagedTable(s, "cbo_lineitem")
    Tables.lineitem(s, sf)
      .select(col("l_orderkey"), col("l_partkey"), col("l_quantity"))
      .write.saveAsTable("cbo_lineitem")
    // threshold between the selective-filter estimate (~rows/ndv) and
    // the full table size, so the decision hinges on the estimate
    val bytes = new java.io.File(
      s.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"),
      "cbo_lineitem").listFiles().map(_.length()).sum
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", (bytes / 4).toString)

    def shape(): String = {
      val t = s.table("cbo_lineitem")
      val probe = t.filter(col("l_partkey") === 7)
        .select(col("l_orderkey"), col("l_quantity"))
      val build = t.filter(col("l_partkey") === 11)
        .select(col("l_orderkey"),
          col("l_quantity").as("q2"))
      probe.join(build, "l_orderkey").queryExecution.executedPlan.toString
    }

    val before = shape()
    assert(before.contains("SortMergeJoin") &&
      !before.contains("BroadcastHashJoin"),
      s"without stats the filtered join should sort-merge; got:\n$before")

    s.sql("ANALYZE TABLE cbo_lineitem COMPUTE STATISTICS FOR COLUMNS " +
      "l_orderkey, l_partkey, l_quantity")
    val after = shape()
    assert(after.contains("BroadcastHashJoin"),
      s"with column stats + CBO the filtered side should broadcast; " +
        s"got:\n$after")

    Distribute.dropManagedTable(s, "cbo_lineitem")
  }
}
