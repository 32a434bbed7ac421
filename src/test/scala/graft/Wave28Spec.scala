package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Text

/** Round-8 wave 28: Gopher repetition filters + CCNet perplexity
  * terciles.
  *
  * The synthetic corpus contains NO repeated word 5..10-grams at ANY SF
  * (measured), so the oracle gate sees `dup{5..10}_frac` identically
  * zero — "correctly empty". These specs are therefore the only
  * evidence the dup accumulator computes anything: constructed
  * repetitive corpora with hand-computed fractions, plus a plain-Scala
  * replay on seeded random small-alphabet corpora that force
  * duplicated n-grams.
  */
class Wave28Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Plain-Scala reference: explode every n-gram, count, then
    * top = max(c·len), dup = Σ_{c≥2} c·len — the oracle's algorithm,
    * independently of Spark. */
  private def refStats(text: String, n: Int): (Long, Long) = {
    val ws = text.split(" ")
    if (ws.length < n) return (0L, 0L)
    val grams = ws.sliding(n).map(_.mkString(" ")).toSeq
    val cnt = grams.groupBy(identity).map { case (g, o) => g -> o.size.toLong }
    val top = cnt.map { case (g, c) => c * g.length }.max
    val dup = cnt.collect { case (g, c) if c >= 2 => c * g.length }.sum
    (top, dup)
  }

  test("gopherRepetition: hand-computed fractions on a constructed " +
       "repetitive doc (dup path live)") {
    // "ab cd ab cd ab" — 2-grams: "ab cd"(2x, len 5), "cd ab"(2x, len 5)
    // top2 = 2*5 = 10; dup5: the only 5-gram occurs once -> 0
    // text len = 14
    val docs = Seq((1L, "ab cd ab cd ab", "en")).toDF("doc_id", "text", "lang")
    val r = Text.gopherRepetition(docs)
      .select("top2_frac", "top3_frac", "dup5_frac", "gopher_pass")
      .as[(Double, Double, Double, Boolean)].head()
    assert(r._1 === 10.0 / 14.0)          // "ab cd" twice
    // 3-grams: "ab cd ab"(2x, len 8), "cd ab cd"(1x) -> top3 = 16/14 > 1
    assert(r._2 === 16.0 / 14.0)
    assert(r._3 === 0.0)
    assert(!r._4)                          // top2 10/14 > 0.20 threshold
  }

  test("gopherRepetition: a doc whose repeated 5-gram drives dup5..dup10") {
    // "a b c d e" repeated 3 times: the 5-gram "a b c d e" occurs 3x
    // (plus rotations twice each)
    val text = Seq.fill(3)("a b c d e").mkString(" ") // 15 words, len 29
    val docs = Seq((1L, text, "en")).toDF("doc_id", "text", "lang")
    val got = Text.gopherRepetition(docs)
      .select("dup5_frac", "dup6_frac", "dup10_frac")
      .as[(Double, Double, Double)].head()
    val tc = text.length.toDouble
    assert(got._1 === refStats(text, 5)._2 / tc)
    assert(got._2 === refStats(text, 6)._2 / tc)
    assert(got._3 === refStats(text, 10)._2 / tc)
    assert(got._1 > 0.0 && got._3 > 0.0) // the dup path actually fired
  }

  test("gopherRepetition == plain-Scala reference on seeded random " +
       "small-alphabet corpora (duplicated n-grams forced)") {
    val rnd = new scala.util.Random(28)
    for (round <- 1 to 3) {
      val alpha = Seq("x", "y", "z")
      val rows = (1L to (4 + rnd.nextInt(4)).toLong).map { i =>
        val ws = Seq.fill(8 + rnd.nextInt(20))(alpha(rnd.nextInt(3)))
        (i, ws.mkString(" "), "en")
      } :+ (99L, Seq.fill(12)("x y z").mkString(" "), "en")
      // the appended doc REPEATS "x y z" 12x, so dup5..dup10 > 0 by
      // construction — non-degeneracy can't depend on the random draw
      val docs = rows.toDF("doc_id", "text", "lang")
      val got = Text.gopherRepetition(docs)
        .select("doc_id", "top2_frac", "top4_frac", "dup5_frac",
          "dup7_frac", "dup10_frac")
        .as[(Long, Double, Double, Double, Double, Double)]
        .collect().map(r => r._1 -> r).toMap
      rows.foreach { case (id, text, _) =>
        val tc = text.length.toDouble
        val want = (id,
          refStats(text, 2)._1 / tc, refStats(text, 4)._1 / tc,
          refStats(text, 5)._2 / tc, refStats(text, 7)._2 / tc,
          refStats(text, 10)._2 / tc)
        assert(got(id) === want, s"round=$round doc=$id text=$text")
      }
      // 3-letter alphabet at length >= 8 guarantees repeated short
      // grams; assert the dup columns are NOT uniformly zero
      assert(got.values.exists(_._4 > 0.0), s"round=$round: dup5 all zero")
    }
  }

  test("gopherRepetition: short docs (< n words) get 0.0 fractions, " +
       "not a descending-sequence explosion") {
    val docs = Seq((1L, "solo", "en"), (2L, "two words", "en"),
      (3L, "", "en")).toDF("doc_id", "text", "lang")
    val got = Text.gopherRepetition(docs)
      .select("doc_id", "top2_frac", "dup10_frac", "gopher_pass")
      .as[(Long, Double, Double, Boolean)].collect().sortBy(_._1)
    assert(got(0) === ((1L, 0.0, 0.0, true))) // 1 word: no 2-gram
    // "two words": one 2-gram ("two words", len 9, count 1), len 9
    assert(got(1) === ((2L, 1.0, 0.0, false)))
    // empty text: the one zero denominator — 0.0 fractions and a real
    // boolean, never NULL/NaN
    assert(got(2) === ((3L, 0.0, 0.0, true)))
  }

  test("ccnetBuckets: per-language terciles are balanced (sizes differ " +
       "by <= 1) and ordered — every head score >= every middle >= " +
       "every tail within a language") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val out = Text.ccnetBuckets(docs)
      .select("lang", "bucket", "lm_score")
      .as[(String, String, Double)].collect()
    out.groupBy(_._1).foreach { case (lang, rows) =>
      val sizes = rows.groupBy(_._2).view.mapValues(_.size)
      assert(sizes.keySet === Set("head", "middle", "tail"))
      assert(sizes.values.max - sizes.values.min <= 1, s"lang=$lang")
      def scores(b: String) = rows.filter(_._2 == b).map(_._3)
      assert(scores("head").min >= scores("middle").max, s"lang=$lang")
      assert(scores("middle").min >= scores("tail").max, s"lang=$lang")
    }
  }

  test("shardManifest: describes exactly corpusShuffle's shards, and " +
       "the checksum is order-independent but content-sensitive") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val manifest = graft.ops.Shard.shardManifest(docs, nShards = 8)
      .select("shard", "n_docs", "checksum")
      .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    // membership agreement with the shuffle op it documents
    val shuffled = graft.ops.Shard
      .corpusShuffle(docs.select(col("doc_id")), col("doc_id"), 8)
      .groupBy("shard").count()
      .as[(Long, Long)].collect().toMap
    assert(manifest.view.mapValues(_._1).toMap === shuffled)
    // order-independence: a reshuffled input lands the same manifest
    val manifest2 = graft.ops.Shard
      .shardManifest(docs.orderBy(col("text")), nShards = 8)
      .select("shard", "n_docs", "checksum")
      .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(manifest2 === manifest)
    // content sensitivity: flipping ONE doc's text changes exactly the
    // checksums of that doc's shard
    val tampered = docs.withColumn("text",
      when(col("doc_id") === 7L, concat(col("text"), lit(" tampered")))
        .otherwise(col("text")))
    val manifest3 = graft.ops.Shard.shardManifest(tampered, nShards = 8)
      .select("shard", "n_docs", "checksum")
      .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    val shard7 = (7L * 1000003L % 1000000007L) % 8
    assert(manifest3(shard7)._2 !== manifest(shard7)._2)
    assert(manifest3.removed(shard7) === manifest.removed(shard7))
  }

  test("shardManifest: hand-computed on a two-doc corpus") {
    val docs = Seq((1L, "ab c", "en"), (2L, "xyz", "en"))
      .toDF("doc_id", "text", "lang")
    val got = graft.ops.Shard.shardManifest(docs, nShards = 2)
      .select("shard", "n_docs", "n_tokens", "n_chars", "min_doc_id",
        "max_doc_id", "checksum")
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    def fp(ws: Seq[String]) =
      ws.foldLeft(0L)((a, w) =>
        (a * 1000003L + (w.head.toLong * 31 + w.length)) % 1000000007L)
    val s1 = (1L * 1000003L % 1000000007L) % 2
    val s2 = (2L * 1000003L % 1000000007L) % 2
    assert(got(s1) === ((s1, 1L, 2L, 4L, 1L, 1L, fp(Seq("ab", "c")))))
    assert(got(s2) === ((s2, 1L, 1L, 3L, 2L, 2L, fp(Seq("xyz")))))
  }

  test("ccnetBuckets: scores only LM-scorable docs and matches " +
       "docLmScore's population") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val n = Text.docLmScore(docs).count()
    assert(Text.ccnetBuckets(docs).count() === n)
    assert(n > 0)
  }
}
