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

  test("dHash: monotone rows hash all-ones, flat rows all-zeros, and it sees pixels") {
    // flat image (every pixel byte equal): no gradient anywhere -> hash 0
    val flat = Multimodal.dHash(1L, Multimodal.encodeBmp(18, 9, Array[Byte](7)))
    assert(flat.phash === 0L && flat.width === 18 && flat.height === 9)
    // strictly increasing bytes across the whole data section (16x2:
    // dataSize = 48*2 = 96 fits one unwrapped byte ramp): gray(o) = o+1,
    // so every horizontal neighbor pair rises -> all 64 bits set
    val rising = Multimodal.dHash(2L,
      Multimodal.encodeBmp(16, 2, Array.tabulate[Byte](96)(_.toByte)))
    assert(rising.phash === -1L) // all 64 bits = two's-complement -1
    // same dims, different pixels -> different hash (content-sensitive)
    val other = Multimodal.dHash(3L,
      Multimodal.encodeBmp(18, 9, "zqjxkvbw".getBytes))
    assert(other.phash !== flat.phash)
  }

  test("encodePng produces a valid signature/IHDR/CRC that decodePng " +
       "reads back; the stored-deflate size law holds") {
    val bytes = Multimodal.encodePng(11, 7, "pixels".getBytes)
    assert((bytes(0) & 0xff) === 0x89 &&
      new String(bytes, 1, 3, "US-ASCII") === "PNG")
    val f = Multimodal.decodePng(42L, bytes)
    assert(f === Multimodal.PngFeatures(42L, 11, 7, 8, 0,
      68L + 7 * (1 + 11)))
    assert(bytes.length === 68 + 7 * 12)
    // the IDAT payload is a real zlib stream: java.util.zip agrees
    val inf = new java.util.zip.Inflater()
    inf.setInput(bytes, 8 + 25 + 8, bytes.length - (8 + 25 + 8) - 4 - 12)
    val out = new Array[Byte](7 * 12)
    assert(inf.inflate(out) === 7 * 12)
  }

  test("decodePng rejects a corrupted IHDR (CRC verify is real)") {
    val bytes = Multimodal.encodePng(11, 7, "pixels".getBytes)
    bytes(16) = (bytes(16) ^ 1).toByte // flip a width bit, keep old CRC
    intercept[IllegalArgumentException] {
      Multimodal.decodePng(1L, bytes)
    }
    intercept[IllegalArgumentException] {
      Multimodal.decodePng(1L, "not a png".getBytes)
    }
  }

  test("decodeFeatures dispatches on magic bytes: BMP, WAV, PNG, GIF and " +
       "JPEG rows are all REAL-parsed (every fixture slice has a codec)") {
    // doc_id % 4 selects the payload family: 0,1 -> BMP, 2 -> WAV;
    // % 8 = 3 -> PNG, % 16 = 7 -> GIF, % 16 = 15 -> JPEG via ImageIO
    val docs = Seq((4L, "bmp doc", "en"), (5L, "bmp too", "en"),
      (6L, "wav doc", "en"), (7L, "gif doc", "en"),
      (11L, "png doc", "en"), (15L, "opaque bytes", "en"))
      .toDF("doc_id", "text", "lang")
    val out = Multimodal.decodeFeatures(docs).collect()
      .map(r => r.getLong(0) -> r).toMap

    val bmp = out(4L) // w = 16+4%32 = 20, h = 8+4%16 = 12, rowSize = 60
    assert(bmp.getString(1) === "image/bmp")
    assert(bmp.getInt(2) === 20 && bmp.getInt(3) === 12 && bmp.getInt(4) === 24)
    assert(bmp.isNullAt(5) && bmp.isNullAt(6))
    assert(bmp.getLong(7) === 54L + 60 * 12)

    val wav = out(6L) // rate idx (6%16)/4 = 1 -> 16000; ch = 1+(6/4)%2 = 2
    assert(wav.getString(1) === "audio/wav")
    assert(wav.isNullAt(2) && wav.isNullAt(3))
    assert(wav.getInt(4) === 16 && wav.getInt(5) === 16000 && wav.getInt(6) === 2)
    assert(wav.getLong(7) === 44L + (100 + 6) * 2 * 2)

    val gif = out(7L) // w = 10+7%20 = 17, h = 5+7%10 = 12
    assert(gif.getString(1) === "image/gif")
    assert(gif.getInt(2) === 17 && gif.getInt(3) === 12 && gif.getInt(4) === 1)
    assert(gif.isNullAt(5) && gif.isNullAt(6))
    // lzw = (6*204+10)/8 = 154 -> one sub-block: 32 + 154 + 1
    assert(gif.getLong(7) === 187L)

    val jpg = out(15L) // w = 12+15%20 = 27, h = 6+15%10 = 11, real JPEG
    assert(jpg.getString(1) === "image/jpeg")
    assert(jpg.getInt(2) === 27 && jpg.getInt(3) === 11 && jpg.getInt(4) === 24)
    assert(jpg.isNullAt(5) && jpg.isNullAt(6))
    // n_bytes = decoded framebuffer (lossy container length isn't analytic)
    assert(jpg.getLong(7) === 27L * 11L * 3L)

    // the defensive stub branch survives for genuinely unknown
    // containers (no registered slice routes here anymore)
    val raw = Multimodal.sniffDecode(99L, "no codec for this".getBytes)
    assert(raw.format === "application/octet-stream")
    assert(raw.n_bytes === "no codec for this".length.toLong)

    val png = out(11L) // w = 8+11%24 = 19, h = 4+11%12 = 15
    assert(png.getString(1) === "image/png")
    assert(png.getInt(2) === 19 && png.getInt(3) === 15 && png.getInt(4) === 8)
    assert(png.isNullAt(5) && png.isNullAt(6))
    assert(png.getLong(7) === 68L + 15 * 20)

    // resize geometry covers exactly the image rows
    val rs = Multimodal.resizePlan(
      Multimodal.decodeFeatures(docs).filter(col("format") === "image/bmp"))
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(rs.keySet === Set(4L, 5L))
    assert(rs(4L).getInt(3) === 224 && rs(4L).getInt(4) === 12 * 224 / 20)
  }

  test("perceptualHash groups identical content; pixelStats is exact") {
    // same (text, dims) -> same pixels -> same phash; doc ids 7 and 519
    // share dims (519 % 32 == 7 % 32, 519 % 16 == 7 % 16) and text
    val docs = Seq((7L, "same pixels", "en"), (519L, "same pixels", "en"),
      (39L, "other content", "en")).toDF("doc_id", "text", "lang")
    val ph = Multimodal.perceptualHash(docs)
      .as[(Long, Long, Int, Int, Long)].collect().map(r => r._1 -> r).toMap
    assert(ph(7L)._2 === ph(519L)._2 && ph(7L)._5 === 2L && ph(519L)._5 === 2L)
    assert(ph(39L)._5 === 1L)

    val st = Multimodal.pixelStats(Seq((5L, "ab", "en")).toDF("doc_id", "text", "lang"))
      .as[(Long, Long, Long, Int, Int)].collect().head
    // doc 5: w=21 h=13, rowSize=64, dataSize=832; "ab" cycled: 416 a's+b's
    assert(st === ((5L, 832L, 416L * ('a' + 'b'), 'a'.toInt, 'b'.toInt)))
  }

  test("encodeGif produces a valid header that decodeGif reads back, " +
       "with the analytic file size") {
    val seed = "gifpixels".getBytes
    val bytes = Multimodal.encodeGif(17, 12, seed)
    val f = Multimodal.decodeGif(7L, bytes)
    // lzw = (6*204+10)/8 = 154 -> one sub-block -> 32 + 154 + 1
    assert(f === Multimodal.GifFeatures(7L, 17, 12, 1, 187L))
    assert(bytes.length === 187)
    // a raster big enough to need two 255-byte sub-blocks
    val big = Multimodal.encodeGif(29, 14, seed)
    val lzw = (6 * 29 * 14 + 10) / 8
    assert(Multimodal.decodeGif(0L, big).n_bytes === 32L + lzw + 2)
  }

  test("THIRD-PARTY validity: the JDK's own ImageIO codecs decode the " +
       "BMP, PNG and GIF payloads with matching dimensions and pixels") {
    import javax.imageio.ImageIO
    import java.io.ByteArrayInputStream
    val seed = "decode me".getBytes("US-ASCII")

    val gif = ImageIO.read(new ByteArrayInputStream(
      Multimodal.encodeGif(17, 12, seed)))
    assert(gif != null && gif.getWidth === 17 && gif.getHeight === 12)
    // pixel (x,y) = seed((y*w+x) % len) & 1 through the 2-color palette
    for (y <- 0 until 12; x <- 0 until 17) {
      val want = if ((seed((y * 17 + x) % seed.length) & 1) == 1)
        0xffffffff else 0xff000000
      assert(gif.getRGB(x, y) === want, s"gif pixel ($x,$y)")
    }

    val png = ImageIO.read(new ByteArrayInputStream(
      Multimodal.encodePng(19, 15, seed)))
    assert(png != null && png.getWidth === 19 && png.getHeight === 15)
    for (y <- 0 until 15; x <- 0 until 19)
      assert(png.getRaster.getSample(x, y, 0) ===
        (seed((y * 19 + x) % seed.length) & 0xff), s"png pixel ($x,$y)")

    val bmp = ImageIO.read(new ByteArrayInputStream(
      Multimodal.encodeBmp(17, 9, seed)))
    assert(bmp != null && bmp.getWidth === 17 && bmp.getHeight === 9)
    // bottom-up rows, BGR byte order, 52-byte padded rows filled from
    // the cycled seed (padding consumes seed bytes too)
    val rowSize = 52
    for (y <- 0 until 9; x <- 0 until 17) {
      val base = (8 - y) * rowSize + x * 3
      def px(i: Int) = seed((base + i) % seed.length) & 0xff
      val want = 0xff000000 | (px(2) << 16) | (px(1) << 8) | px(0)
      assert(bmp.getRGB(x, y) === want, s"bmp pixel ($x,$y)")
    }
  }
}
