package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Text, TextDedup}

/** Round-9 operators: Unicode canonicalization and ExactSubstr apply. */
class Round9OpsSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  // ---- textNormalize ---------------------------------------------------

  test("textNormalize: composed and decomposed accents hash-merge under " +
       "both NFC and NFKC (the canonicalize-before-sha2 contract)") {
    val df = Seq(
      (1L, "Café au lait"),   // composed U+00E9
      (2L, "Café au lait"),  // decomposed e + combining acute
      (3L, "ﬁn de siècle"), // ﬁ ligature (compatibility form)
      (4L, "fin de siècle")
    ).toDF("doc_id", "text")
    for (form <- Seq("NFC", "NFKC")) {
      val h = Text.textNormalize(df, form = form)
        .select(col("doc_id"), col("content_hash"))
        .as[(Long, String)].collect().toMap
      assert(h(1L) === h(2L), s"$form must merge composed/decomposed")
      if (form == "NFKC")
        assert(h(3L) === h(4L), "NFKC folds the fi ligature")
      else
        assert(h(3L) !== h(4L), "NFC must NOT fold compatibility forms")
    }
  }

  test("textNormalize: control strip + whitespace collapse + trim + " +
       "optional lowercase") {
    val df = Seq((1L, "  Hello  World\tX\n ")).toDF("doc_id", "text")
    val out = Text.textNormalize(df, lowercase = true)
      .select(col("text")).as[String].head()
    //  (BEL) and  (VT) stripped, runs of space/tab/newline
    // collapsed, ends trimmed, lowercased
    assert(out === "hello world x")
    val kept = Text.textNormalize(df)
      .select(col("text")).as[String].head()
    assert(kept === "Hello World X")
  }

  test("textNormalize is IDEMPOTENT on random mixed junk (normalize of " +
       "normalized text is a no-op — the property that makes re-running " +
       "the canonicalize stage safe in any pipeline replay)") {
    val rnd = new scala.util.Random(7)
    val alphabet = "ab c\t\né" + "́" + "ﬁＡ㎒  "
    val docs = (1L to 64L).map { i =>
      (i, Seq.fill(24)(alphabet(rnd.nextInt(alphabet.length))).mkString)
    }.toDF("doc_id", "text")
    for (form <- Seq("NFC", "NFKC")) {
      val once = Text.textNormalize(docs, form = form)
        .select(col("doc_id"), col("text"))
      val twice = Text.textNormalize(once, form = form)
        .select(col("doc_id"), col("text").as("text2"))
      val bad = once.join(twice, "doc_id")
        .filter(col("text") =!= col("text2"))
        .collect()
      bad.take(2).foreach { r =>
        println(s"[$form] doc=${r.getLong(0)}")
        println("  once : " + r.getString(1).map(c => f"${c.toInt}%04x").mkString(" "))
        println("  twice: " + r.getString(2).map(c => f"${c.toInt}%04x").mkString(" "))
      }
      assert(bad.length === 0, s"$form normalization is not idempotent")
    }
  }

  test("textNormalize: null text passes through as null (no NPE in the " +
       "codegen path)") {
    val df = Seq((1L, null.asInstanceOf[String]), (2L, "ok"))
      .toDF("doc_id", "text")
    val out = Text.textNormalize(df)
      .select(col("doc_id"), col("text")).as[(Long, String)].collect().toMap
    assert(out(1L) === null && out(2L) === "ok")
  }

  // ---- exactSubstrDedup -------------------------------------------------

  test("exactSubstrDedup removes an off-by-3-words repeat that " +
       "paragraphDedup's fixed 16-word grid misses entirely") {
    val p = (1 to 8).map(i => s"p$i").mkString(" ") // the copied phrase
    val doc1 = (p +: (1 to 8).map(i => s"b$i")).mkString(" ")         // P at offset 0
    val doc2 = (Seq("f1", "f2", "f3") ++ Seq(p) ++
      (1 to 5).map(i => s"c$i")).mkString(" ")                        // P at offset 3
    val docs = Seq((1L, doc1), (2L, doc2)).toDF("doc_id", "text")

    // the grid path: both docs are one 16-word chunk each, the chunks
    // differ (offset 3), so NOTHING is removed
    val para = TextDedup.paragraphDedup(docs)
      .select(col("doc_id"), col("n_chunks"), col("n_kept"), col("text_dedup"))
      .as[(Long, Long, Long, String)].collect().map(r => r._1 -> r).toMap
    assert(para(2L)._3 === para(2L)._2, "grid dedup keeps every chunk")
    assert(para(2L)._4 === doc2, "grid dedup leaves the copy in place")

    // the ExactSubstr path: doc 2's phrase window (pos 3) is flagged,
    // its 8 tokens removed, first occurrence (doc 1) untouched
    val es = TextDedup.exactSubstrDedup(docs)
      .select(col("doc_id"), col("n_tokens"), col("n_removed"), col("text_dedup"))
      .as[(Long, Long, Long, String)].collect().map(r => r._1 -> r).toMap
    assert(es(1L)._3 === 0L && es(1L)._4 === doc1, "first occurrence kept")
    assert(es(2L)._3 === 8L)
    assert(es(2L)._4 === "f1 f2 f3 c1 c2 c3 c4 c5")
  }

  test("exactSubstrDedup: self-repeat within one doc keeps only the " +
       "first copy; docs shorter than w pass through") {
    val p = (1 to 8).map(i => s"s$i").mkString(" ")
    val docs = Seq(
      (1L, s"$p $p"),      // the phrase twice back-to-back
      (2L, "tiny doc")     // < 8 tokens: no windows, untouched
    ).toDF("doc_id", "text")
    val es = TextDedup.exactSubstrDedup(docs)
      .select(col("doc_id"), col("n_removed"), col("text_dedup"))
      .as[(Long, Long, String)].collect().map(r => r._1 -> r).toMap
    assert(es(1L)._2 === 8L && es(1L)._3 === p)
    assert(es(2L)._2 === 0L && es(2L)._3 === "tiny doc")
  }

  // ---- curationPipeline ----------------------------------------------

  test("curationPipeline: unicode twins merge in the exact stage (stage " +
       "coupling — they hash-merge IFF normalize ran), near-copies get " +
       "near_dup verdicts, the rest stay kept") {
    val body = (1 to 30).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      (1L, "Caf\u00e9 " + body),                     // composed form
      (2L, "Cafe\u0301 " + body),                    // decomposed twin of 1
      (3L, "Caf\u00e9 " + body + " tail1 tail2"),     // near-copy of 1
      (4L, (1 to 30).map(i => s"z$i").mkString(" ")) // unrelated
    ).toDF("doc_id", "text")
    val out = TextDedup.curationPipeline(docs)
      .as[(Long, String, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out(1L) === (("kept", 1L)))
    assert(out(2L) === (("exact_dup", 1L)), "decomposed twin must merge " +
      "with the composed original — only NFC makes their hashes equal")
    assert(out(3L) === (("near_dup", 1L)))
    assert(out(4L) === (("kept", 4L)))
  }

  // ---- thumbnail -------------------------------------------------------

  test("thumbnail: output is a VALID BMP (own decoder + the JDK ImageIO " +
       "codec both parse it) and the checksum matches the re-encoded bytes") {
    val docs = Seq((4L, "pixel seed payload for the thumbnail test", "en"))
      .toDF("doc_id", "text", "lang")
    val row = graft.ops.Multimodal.thumbnail(docs).collect()(0)
    assert(row.getInt(3) === 16 && row.getInt(4) === 8)
    assert(row.getLong(6) === 54L + 48 * 8)
    // reproduce the thumb bytes independently and cross-parse them
    val w = row.getInt(1); val h = row.getInt(2)
    assert(w === 20 && h === 12) // 16+4%32, 8+4%16
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(
      graft.ops.Multimodal.encodeBmp(16, 8, Array.fill(384)(7: Byte))))
    assert(img.getWidth === 16 && img.getHeight === 8,
      "ImageIO must agree the encoder emits a real BMP")
  }

  test("thumbnail: identity-size resample reproduces the source pixels " +
       "(nearest-neighbor with tw=w, th=h is the identity)") {
    val text = "abcdefghijklmnopqrstuvwxyz0123456789"
    val docs = Seq((4L, text, "en")).toDF("doc_id", "text", "lang")
    // doc 4: w=20, h=12 — identity thumb
    val row = graft.ops.Multimodal.thumbnail(docs, tw = 20, th = 12)
      .collect()(0)
    // expected: sum over the 20x12 raster of text bytes cycled over the
    // source data area, sampled at sx=x, sy=y (identity)
    val w = 20; val h = 12; val rowSize = ((w * 3 + 3) / 4) * 4
    var exp = 0L
    for (y <- 0 until h; x <- 0 until w; c <- 0 until 3)
      exp += text((y * rowSize + x * 3 + c) % text.length).toLong
    assert(row.getLong(5) === exp)
  }

  // ---- qualityProbe ---------------------------------------------------

  test("qualityProbe: training moves scores the right way on a separable " +
       "fixture (en docs long-worded, others short-worded), and the " +
       "arithmetic is reproducible run-to-run") {
    val docs = (1L to 40L).map { i =>
      if (i % 2 == 0)
        (i, "en", Seq.fill(20)(s"wonderful$i word${i % 7}").mkString(" "))
      else
        (i, "xx", Seq.fill(20)(s"a$i b${i % 7}").mkString(" "))
    }.toDF("doc_id", "lang", "text")
    val out = Text.qualityProbe(docs)
      .select(col("doc_id"), col("label"), col("score_q"))
      .as[(Long, Long, Long)].collect()
    val en = out.filter(_._2 == 1L).map(_._3.toDouble)
    val xx = out.filter(_._2 == 0L).map(_._3.toDouble)
    // mean-word-length separates the classes; after 6 GD steps the en
    // mean score must sit strictly above the xx mean score
    assert(en.sum / en.length > xx.sum / xx.length,
      s"probe failed to separate: en=${en.sum / en.length} " +
      s"xx=${xx.sum / xx.length}")
    // bit-reproducible: a second training run returns identical scores
    val out2 = Text.qualityProbe(docs)
      .select(col("doc_id"), col("score_q")).as[(Long, Long)].collect().toMap
    out.foreach { case (id, _, s) => assert(out2(id) === s) }
  }

  // ---- charFunnelParams ---------------------------------------------

  test("charFunnelParams: the derivation reproduces the measured gate " +
       "constants at t=0.5 and adapts the df cap with corpus size") {
    // gate corpora (500 / 5 000 docs): 32 bands of 2 rows, Hoeffding
    // margin 0.2203 (same minAgree=18 as the old 0.22 constant), df cap
    // pinned at the exhaustive floor
    for (n <- Seq(500L, 5000L)) {
      val (bands, cap, margin) = TextDedup.charFunnelParams(0.5, n)
      assert(bands === 32 && cap === 100)
      assert(math.abs(margin - 0.2203) < 5e-4)
      assert(math.ceil((0.5 - margin) * 64).toInt ===
             math.ceil((0.5 - 0.22) * 64).toInt, "minAgree unchanged")
    }
    // at 10⁹ docs the cap hits the explode-bound ceiling
    assert(TextDedup.charFunnelParams(0.5, 1000000000L)._2 === 1024)
    // a higher threshold affords denser banding (fewer candidates):
    // at t=0.9, r=4 rows/band has miss (1-0.9⁴)^16 ≈ 4e-8
    assert(TextDedup.charFunnelParams(0.9, 5000L)._1 === 16)
  }

  test("exactSubstrDedup agrees with an independent plain-Scala " +
       "reference on seeded random corpora (tiny vocab forces repeats)") {
    val rnd = new scala.util.Random(42)
    val vocab = Array("x", "y", "z") // 3 symbols → dense w-gram collisions
    val w = 4
    val corpus = (0L until 12L).map { id =>
      (id, Seq.fill(6 + rnd.nextInt(10))(vocab(rnd.nextInt(3))).mkString(" "))
    }
    // reference: global first-occurrence scan in (doc_id, pos) order
    val seen = scala.collection.mutable.Set[String]()
    val expected = corpus.map { case (id, text) =>
      val toks = text.split(" ")
      val flagged = (0 to toks.length - w).filter { i =>
        val g = toks.slice(i, i + w).mkString(" ")
        if (seen.contains(g)) true else { seen += g; false }
      }
      val removed = flagged.flatMap(i => i until i + w).toSet
      val keptText = toks.zipWithIndex.collect {
        case (t, j) if !removed.contains(j) => t }.mkString(" ")
      id -> ((removed.size.toLong, keptText))
    }.toMap
    val got = TextDedup.exactSubstrDedup(corpus.toDF("doc_id", "text"), w)
      .select(col("doc_id"), col("n_removed"), col("text_dedup"))
      .as[(Long, Long, String)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got === expected)
  }
}
