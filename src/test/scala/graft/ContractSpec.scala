package graft

import org.scalatest.funsuite.AnyFunSuite

/** Guards on the driver contract itself. */
class ContractSpec extends AnyFunSuite {

  test("every registered query has a DuckDB oracle (no weaker rows-only checks)") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert(q.diff(o).isEmpty, s"queries without oracle: ${q.diff(o)}")
    assert(o.diff(q).isEmpty, s"oracles without query: ${o.diff(q)}")
  }

  test("flagship entry returns rows on the smallest scale factor") {
    assert(SparkEntry.entry(TestSpark.spark).count() > 0)
  }
}
