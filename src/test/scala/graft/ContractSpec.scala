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

  test("no duplicate query/oracle registrations (a Map literal dedupes " +
       "SILENTLY — a repeated key shadows an op and its oracle still " +
       "matches, so only the source can reveal the collision)") {
    // count textual registrations in the source and compare with the
    // constructed maps; a duplicate key makes the map smaller
    val src = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("src/main/scala/graft/SparkEntry.scala")),
      "UTF-8")
    val names = "\"([a-z0-9_]+)\" -> \\(\\(s, dir\\)".r
      .findAllMatchIn(src).map(_.group(1)).toSeq
    // set equality (not a bare count): if the regex ever misses a
    // reformatted registration, the failure NAMES the drifted key
    // instead of reporting an opaque count mismatch
    assert(names.toSet === SparkEntry.queries.keySet,
      s"registry/source drift — regex-missed or shadowed keys: " +
        s"${(names.toSet diff SparkEntry.queries.keySet) union
            (SparkEntry.queries.keySet diff names.toSet)}")
    val dups = names.groupBy(identity).filter(_._2.size > 1).keys
    assert(dups.isEmpty, s"duplicate query registrations: $dups")
  }

  test("every registered query appears in the OPERATORS.md catalog " +
       "(the inventory the coverage judgment reads)") {
    val cat = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("OPERATORS.md")), "UTF-8")
    val documented = "`([a-z0-9_]+)`".r
      .findAllMatchIn(cat).map(_.group(1)).toSet
    val missing = SparkEntry.queries.keySet.diff(documented)
    assert(missing.isEmpty,
      s"registered but uncatalogued ops: ${missing.toSeq.sorted}")
  }
}
