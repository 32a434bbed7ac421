package graft

import java.nio.file.{Files, Paths}
import org.scalatest.funsuite.AnyFunSuite

class PagedV2Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def writePages(dir: String): Unit =
    (1 to 3).foreach { p =>
      val recs = (1 to 4).map(i => {
        val id = (p - 1) * 4 + i
        s"""{"event_id":$id,"user_id":${id % 3},"event_type":"click","value":$id.5}"""
      }).mkString(",")
      Files.writeString(Paths.get(s"$dir/page_$p.json"),
        s"""{"records":[$recs],"pagination":{"has_next":${p < 3}}}""")
    }

  test("DSv2 source plans one partition per page and reads all records") {
    val d = Files.createTempDirectory("graft-v2").toString
    writePages(d)
    val df = spark.read.format("graft.sources.v2.PagedJsonSource")
      .option("path", d).load()
    assert(df.count() === 12)
    assert(df.rdd.getNumPartitions === 3)
  }

  test("DSv2 column pruning reaches the reader") {
    val d = Files.createTempDirectory("graft-v2p").toString
    writePages(d)
    val df = spark.read.format("graft.sources.v2.PagedJsonSource")
      .option("path", d).load().select("event_id")
    val scan = df.queryExecution.executedPlan.toString
    assert(scan.contains("event_id"))
    assert(!scan.contains("event_type"), s"pruning failed:\n$scan")
    assert(df.collect().map(_.getLong(0)).sorted.toSeq === (1L to 12L))
  }
}
