package graft

import org.scalatest.funsuite.AnyFunSuite

/** Cross-cutting invariants of the analytics queries (properties the
  * hash oracle can't express).
  */
class AnalyticsInvariantSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("funnel step counts are monotonically nonincreasing") {
    val r = SparkEntry.queries("events_funnel")(spark, sf)
      .as[(Long, Long, Long)].head()
    assert(r._1 >= r._2 && r._2 >= r._3)
    assert(r._1 > 0)
  }

  test("pack_bins: bins are contiguous and within one doc of the budget") {
    val rows = SparkEntry.queries("pack_bins")(spark, sf)
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    // bin ids nondecreasing in doc order
    assert(rows.map(_._3).sliding(2).forall(p => p.length < 2 || p(0) <= p(1)))
    val maxDoc = rows.map(_._2).max
    rows.groupBy(_._3).foreach { case (bin, ds) =>
      val total = ds.map(_._2).sum
      assert(total <= 2048 + maxDoc, s"bin $bin holds $total tokens")
    }
  }

  test("dedup_canonical count + removed duplicates == corpus size") {
    val canon = SparkEntry.queries("dedup_canonical")(spark, sf)
      .as[(Long, Long)].collect()
    val nDocs = Tables.documents(spark, sf).count()
    // cluster sizes of the canonical rows sum to the whole corpus
    assert(canon.map(_._2).sum === nDocs)
  }
}
