package graft

import java.nio.file.{Files, Paths}
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Paginated

class PaginatedSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def page(dir: String, p: Int, ids: Seq[Int], hasNext: Boolean): Unit = {
    val recs = ids.map(i =>
      s"""{"event_id":$i,"user_id":1,"event_type":"click","value":1.5}""").mkString(",")
    Files.writeString(Paths.get(s"$dir/page_$p.json"),
      s"""{"records":[$recs],"pagination":{"has_next":$hasNext}}""")
  }

  private def tmp() = Files.createTempDirectory("graft-pages").toString

  test("withRetries: transient failures recover within budget, exhaust beyond it") {
    var calls = 0
    val out = Paginated.withRetries(maxRetries = 2) { () =>
      calls += 1
      if (calls < 3) throw new RuntimeException("transient")
      42
    }
    assert(out === 42 && calls === 3) // failed twice, third attempt succeeds

    var calls2 = 0
    val thrown = intercept[RuntimeException] {
      Paginated.withRetries(maxRetries = 2) { () =>
        calls2 += 1
        throw new RuntimeException(s"always $calls2")
      }
    }
    assert(calls2 === 3) // 1 attempt + 2 retries, then the last error surfaces
    assert(thrown.getMessage === "always 3")
  }

  test("fetches pages until has_next=false; later pages ignored (ref :55-56)") {
    val d = tmp()
    page(d, 1, Seq(1, 2), hasNext = true)
    page(d, 2, Seq(3), hasNext = false)
    page(d, 3, Seq(99), hasNext = true) // must never be fetched
    val got = Paginated.fetchAll(spark, d).select("event_id")
      .collect().map(_.getLong(0)).sorted
    assert(got.toSeq === Seq(1L, 2L, 3L))
  }

  test("stops on missing page (non-200 analog, ref :36-38)") {
    val d = tmp()
    page(d, 1, Seq(1), hasNext = true)
    // page_2 missing
    page(d, 3, Seq(9), hasNext = true)
    assert(Paginated.fetchAll(spark, d).count() === 1)
  }

  test("stops on empty records page (ref :42-43)") {
    val d = tmp()
    page(d, 1, Seq(1, 2), hasNext = true)
    page(d, 2, Seq(), hasNext = true)
    page(d, 3, Seq(9), hasNext = true)
    assert(Paginated.fetchAll(spark, d).count() === 2)
  }

  test("empty endpoint yields empty typed DataFrame") {
    val df = Paginated.fetchAll(spark, tmp())
    assert(df.count() === 0)
    assert(df.schema === Paginated.recordSchema)
  }
}
