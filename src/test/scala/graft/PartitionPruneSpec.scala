package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The raw-zone hive layout exists to buy partition pruning on re-reads
  * (SURVEY §4.1) — assert the pruning actually reaches the scan.
  */
class PartitionPruneSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("date filters on the raw zone become PartitionFilters, not data filters") {
    val out = java.nio.file.Files.createTempDirectory("graft-prune").toString
    graft.sources.Sinks.rawPartitionedSink(
      Tables.events(spark, "/root/testdata/sf0.001"), s"$out/raw")
    val rd = spark.read.json(s"$out/raw")
      .filter(col("year") === 2024 && col("month") === 3)
    val scan = rd.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters: ["))
    assert(scan.contains("(year#") || scan.contains("(year ="),
      s"year filter not pushed to partitions:\n$scan")
    // the pruned read still returns only the requested slice
    val got = rd.select(countDistinct(col("year")), countDistinct(col("month")))
      .collect().head
    assert(got.getLong(0) <= 1 && got.getLong(1) <= 1)
  }
}
