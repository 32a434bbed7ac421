package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Multimodal

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("encodeBmp produces a valid header that decodeBmp reads back") {
    val bytes = Multimodal.encodeBmp(17, 9, "pixels".getBytes)
    assert(bytes(0) === 'B'.toByte && bytes(1) === 'M'.toByte)
    val f = Multimodal.decodeBmp(42L, bytes)
    assert(f === Multimodal.BmpFeatures(42L, 17, 9, 24,
      54L + ((17 * 3 + 3) / 4) * 4 * 9))
    // rows pad to 4-byte boundaries: 17*3=51 → 52 per row
    assert(bytes.length === 54 + 52 * 9)
  }

  test("decodeBmp rejects non-BMP payloads") {
    intercept[IllegalArgumentException] {
      Multimodal.decodeBmp(1L, "not an image".getBytes)
    }
  }

  test("bmpRoundTrip decodes the geometry the encoder was given, per doc") {
    val docs = Seq((5L, "abc", "en"), (40L, "xyz", "en"))
      .toDF("doc_id", "text", "lang")
    val out = Multimodal.bmpRoundTrip(docs)
      .as[(Long, Int, Int, Int, Long)].collect().map(r => r._1 -> r).toMap
    assert(out(5L) === ((5L, 21, 13, 24, 54L + ((21 * 3 + 3) / 4) * 4 * 13)))
    assert(out(40L) === ((40L, 24, 16, 24, 54L + ((24 * 3 + 3) / 4) * 4 * 16)))
  }
}
