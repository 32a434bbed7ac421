package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-8: the eleven TPC-H shapes that complete the 22-query set
  * (Q2,Q3,Q4,Q6,Q7,Q8,Q10,Q11,Q12,Q14,Q16 adapted to this schema —
  * no partsupp / shipmode / commit-receipt columns, so each states its
  * surrogate in SparkEntry's scaladoc). Correctness of every shape is
  * oracle-gated in Verify; here we pin the semantic corner cases the
  * oracle can't isolate (ties, cross-multiplication vs division,
  * semi-join multiplicity) and the plan properties the scale story
  * depends on (no cartesian, residuals on hash joins, pushed filters).
  */
class TpchShapesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)
  private def plan(name: String): String =
    run(name).queryExecution.executedPlan.toString

  test("sql_q2_min_cost: output equals a plain-Scala replay — regional " +
       "restriction BEFORE the per-part min, ties all surfacing") {
    // replay from base tables: the in-region supplier set, the part
    // slice, per-(part, supp) min sale cents, then per-part argmin
    val inRegion = Tables.supplier(spark, sf)
      .join(Tables.nation(spark, sf), col("s_nationkey") === col("n_nationkey"))
      .join(Tables.region(spark, sf), col("n_regionkey") === col("r_regionkey"))
      .filter(col("r_name") === "EUROPE")
      .select("s_suppkey").as[Long].collect().toSet
    val slice = Tables.part(spark, sf)
      .filter(col("p_type") === "STANDARD" && col("p_size").between(10, 25))
      .select("p_partkey").as[Long].collect().toSet
    val cost = Tables.lineitem(spark, sf)
      .select(col("l_partkey"), col("l_suppkey"),
        round(col("l_extendedprice") * 100).cast("long").as("c"))
      .as[(Long, Long, Long)].collect()
      .filter(r => slice.contains(r._1) && inRegion.contains(r._2))
      .groupBy(r => (r._1, r._2))
      .map { case (k, rs) => k -> rs.map(_._3).min }
    val minPerPart = cost.groupBy(_._1._1)
      .map { case (p, m) => p -> m.values.min }
    val expect = cost.collect {
      case ((p, s), c) if c == minPerPart(p) => (p, s, c) }.toSet
    val got = run("sql_q2_min_cost")
      .select("p_partkey", "s_suppkey", "cost_cents")
      .as[(Long, Long, Long)].collect().toSet
    assert(got === expect)
    assert(got.nonEmpty)
  }

  test("sql_q4_order_priority: semi-join counts orders once however " +
       "many lineitems are late") {
    // total across priorities must not exceed the quarter's order count
    val total = run("sql_q4_order_priority")
      .agg(sum("order_count")).as[Long].head()
    val quarter = Tables.orders(spark, sf)
      .filter(col("o_orderdate").cast("date") >= lit("1996-07-01") &&
        col("o_orderdate").cast("date") < lit("1996-10-01"))
      .count()
    assert(total <= quarter && total > 0)
  }

  test("sql_q11_important: output equals a plain-Scala BigInt replay " +
       "of the cross-multiplied cutoff") {
    val sn = Tables.supplier(spark, sf)
      .join(Tables.nation(spark, sf),
        col("s_nationkey") === col("n_nationkey"))
      .filter(col("n_name").isin("NATION_3", "NATION_8"))
      .select("s_suppkey").as[Long].collect().toSet
    val vals = Tables.lineitem(spark, sf)
      .select(col("l_partkey"), col("l_suppkey"),
        (round(col("l_extendedprice") * 100).cast("long") *
          round(col("l_quantity")).cast("long")).as("v"))
      .as[(Long, Long, Long)].collect()
      .filter(r => sn.contains(r._2))
    val perPart = vals.groupBy(_._1).map { case (k, rs) =>
      k -> rs.map(r => BigInt(r._3)).sum }
    val total = perPart.values.sum
    val nParts = BigInt(perPart.size)
    // share > 1.5x mean, exact: 2*v*n_parts > 3*total
    val expect = perPart.filter { case (_, v) => v * nParts * 2 > total * 3 }
      .map { case (k, v) => k -> v.toLong }
    assert(expect.nonEmpty && expect.size < perPart.size) // non-degenerate
    val got = run("sql_q11_important")
      .select("l_partkey", "part_value_c").as[(Long, Long)]
      .collect().toMap
    assert(got === expect)
  }

  test("sql_q12_shipmode: high+low line counts partition the late set") {
    val rows = run("sql_q12_shipmode")
      .select("l_linestatus", "high_line_count", "low_line_count")
      .as[(String, Long, Long)].collect()
    assert(rows.length === 2) // two line statuses
    assert(rows.forall { case (_, h, l) => h >= 0 && l >= 0 && h + l > 0 })
  }

  test("sql_q8_market_share: nation revenue never exceeds total, and " +
       "the share is their exact quotient") {
    val rows = run("sql_q8_market_share")
      .select("nation_rev_mc", "total_rev_mc", "mkt_share")
      .as[(Long, Long, Double)].collect()
    rows.foreach { case (n, t, s) =>
      assert(n >= 0 && n <= t)
      assert(s === n.toDouble / t.toDouble) // bit-exact derivation
    }
  }

  test("sql_q16_supplier_cnt: negative-balance suppliers are excluded " +
       "from every count") {
    val bad = Tables.supplier(spark, sf)
      .filter(col("s_acctbal") < 0).select("s_suppkey").as[Long].collect().toSet
    // re-derive one group by hand from the base tables
    val pairs = Tables.lineitem(spark, sf)
      .join(Tables.part(spark, sf).filter(col("p_type") =!= "PROMO"),
        col("l_partkey") === col("p_partkey"))
      .select(col("p_brand"), col("p_size"), col("l_suppkey"))
      .as[(String, Int, Long)].collect()
      .filterNot(r => bad.contains(r._3))
    val expect = pairs.groupBy(r => (r._1, r._2))
      .map { case (k, rs) => k -> rs.map(_._3).distinct.length.toLong }
    val got = run("sql_q16_supplier_cnt")
      .select("p_brand", "p_size", "supplier_cnt")
      .as[(String, Int, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(got === expect)
  }

  test("join shapes: none of the eleven plans contains a cartesian " +
       "product (the 1-row scalar broadcasts excepted by construction)") {
    val names = Seq("sql_q2_min_cost", "sql_q3_shipping",
      "sql_q4_order_priority", "sql_q6_forecast", "sql_q7_nation_volume",
      "sql_q8_market_share", "sql_q10_returned", "sql_q11_important",
      "sql_q12_shipmode", "sql_q14_promo", "sql_q16_supplier_cnt")
    names.foreach { n =>
      val p = plan(n)
      assert(!p.contains("CartesianProduct"), s"$n has a cartesian")
    }
  }

  test("sql_q4 / sql_q12: the late comparison rides the order-key hash " +
       "join as a residual, not a nested loop") {
    Seq("sql_q4_order_priority", "sql_q12_shipmode").foreach { n =>
      val p = plan(n)
      assert(p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin") ||
        p.contains("ShuffledHashJoin"), s"$n lost its equi-join")
      assert(!p.contains("BroadcastNestedLoopJoin"), s"$n nested-loops")
    }
  }

  test("sql_q6_forecast: the quantity bound reaches the parquet scan " +
       "as a pushed filter (cast/arithmetic predicates cannot — they " +
       "run in the Filter above it)") {
    val p = run("sql_q6_forecast").queryExecution.executedPlan.toString
    // the PushedFilters list itself must name l_quantity
    val pushed = p.linesIterator.find(_.contains("PushedFilters"))
    assert(pushed.exists(_.contains("l_quantity")),
      s"l_quantity not in PushedFilters:\n${pushed.getOrElse(p)}")
    assert("FileScan|Scan parquet".r.findFirstIn(p).isDefined)
  }
}
