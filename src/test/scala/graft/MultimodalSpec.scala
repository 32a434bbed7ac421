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

  test("encodeWav produces a valid RIFF header that decodeWav reads back") {
    val bytes = Multimodal.encodeWav(16000, 2, 16, 250, "audio".getBytes)
    assert(new String(bytes, 0, 4, "US-ASCII") === "RIFF")
    val f = Multimodal.decodeWav(7L, bytes)
    assert(f === Multimodal.WavFeatures(7L, 16000, 2, 16, 250L,
      250L * 1000L / 16000L))
    assert(bytes.length === 44 + 250 * 2 * 2) // header + samples×channels×2B
    intercept[IllegalArgumentException] {
      Multimodal.decodeWav(8L, "definitely not audio bytes ........".getBytes)
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
