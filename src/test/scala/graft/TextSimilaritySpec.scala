package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Similarity, Text, TextDedup}

class TextSimilaritySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def docs(rows: (Long, String)*) =
    rows.toDF("doc_id", "text").withColumn("lang", lit("en"))

  test("shingles: docs shorter than k are excluded; sets are distinct") {
    val sh = TextDedup.shingles(docs((1L, "a b"), (2L, "a b c a b c")), 3)
    val got = sh.as[(Long, String)].collect().toSet
    assert(got.map(_._1) === Set(2L))
    assert(got === Set((2L, "a b c"), (2L, "b c a"), (2L, "c a b")))
  }

  test("identical docs have Jaccard 1.0; disjoint docs produce no pair") {
    val out = TextDedup.nearDupJaccard(docs(
      (1L, "x y z x y z x y"), (2L, "x y z x y z x y"),
      (3L, "p q r s t u v w")), k = 3, threshold = 0.5)
      .as[(Long, Long, Double)].collect()
    assert(out.toSeq === Seq((1L, 2L, 1.0)))
  }

  test("minhash LSH finds exact duplicates (signature equality)") {
    val out = TextDedup.minhashLshPairs(docs(
      (1L, "x y z x y z x y"), (2L, "x y z x y z x y"),
      (3L, "p q r s t u v w")), k = 3, threshold = 0.5)
      .as[(Long, Long, Double)].collect()
    assert(out.toSeq === Seq((1L, 2L, 1.0)))
  }

  test("simHashPairs: banded candidates equal brute-force Hamming pairs") {
    val d = Tables.documents(spark, "/root/testdata/sf0.001")
    val banded = TextDedup.simHashPairs(d, maxHamming = 3, bands = 4)
      .as[(Long, Long, Long)].collect().toSet
    val sigs = TextDedup.simHash(d)
    val brute = sigs.as("a").crossJoin(sigs.as("b"))
      .filter(col("a.doc_id") < col("b.doc_id"))
      .withColumn("hamming",
        bit_count(col("a.simhash").bitwiseXOR(col("b.simhash"))).cast("long"))
      .filter(col("hamming") <= 3)
      .select(col("a.doc_id"), col("b.doc_id"), col("hamming"))
      .as[(Long, Long, Long)].collect().toSet
    assert(banded === brute)
    assert(banded.nonEmpty) // testdata contains Hamming-near fingerprints
  }

  test("char n-gram near-dup: rare-shingle candidates reach full recall") {
    // maxDf-capped candidate generation + exact verify must equal the
    // effectively-uncapped run (cap above the doc count = complete index)
    for (sf <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val d = Tables.documents(spark, sf)
      val capped = TextDedup.nearDupJaccardChars(d, maxDf = 100)
        .as[(Long, Long, Double)].collect().toSet
      val uncapped = TextDedup.nearDupJaccardChars(d, maxDf = 1000000)
        .as[(Long, Long, Double)].collect().toSet
      assert(capped === uncapped, s"at $sf")
      assert(capped.nonEmpty, s"at $sf")
    }
  }

  test("char n-gram Jaccard: identical docs pair at 1.0, disjoint do not") {
    val out = TextDedup.nearDupJaccardChars(docs(
      (1L, "abcdefghij"), (2L, "abcdefghij"), (3L, "zzzzyyyyxxxx")), n = 5,
      threshold = 0.5)
      .as[(Long, Long, Double)].collect()
    assert(out.toSeq === Seq((1L, 2L, 1.0)))
  }

  test("doc_chunking: chunks reconstruct the document (stride overlap dropped)") {
    val out = SparkEntry.queries("doc_chunking")(spark, "/root/testdata/sf0.001")
      .select("doc_id", "chunk_idx", "chunk_text")
      .as[(Long, Int, String)].collect()
      .groupBy(_._1).map { case (id, rows) =>
        id -> rows.sortBy(_._2).map(_._3.split(" ").toSeq)
      }
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .select("doc_id", "text").as[(Long, String)].collect().toMap
    assert(out.nonEmpty)
    out.foreach { case (id, chunks) =>
      // chunk i starts at token i*48; dropping the 16-token overlap from
      // every chunk after the first must reconstruct the document
      val rebuilt = chunks.head ++ chunks.tail.flatMap(_.drop(64 - 48))
      assert(rebuilt === docs(id).split(" ").toSeq, s"doc $id")
    }
  }

  test("dedupClusters: chained pairs merge transitively into one component") {
    // a-b and b-c similar but a-c not a pair: all three must still land
    // in one cluster (a chain, not a clique — label propagation needs the
    // extra round the near-clique testdata never exercises)
    val d = docs((1L, "x"), (2L, "x"), (3L, "x"), (9L, "x"))
    val pairs = Seq((1L, 2L, 1.0), (2L, 3L, 1.0)).toDF("doc_a", "doc_b", "jaccard")
    val out = TextDedup.dedupClusters(d, pairs)
      .as[(Long, Long, Long)].collect().toSet
    assert(out === Set((1L, 1L, 3L), (2L, 1L, 3L), (3L, 1L, 3L), (9L, 9L, 1L)))
  }

  test("dedupClusters: long chain (diameter 17) converges across checkpoint boundaries") {
    // an 18-node path needs 17 propagation rounds — crossing the
    // periodic localCheckpoint at iterations 8 and 16 — and must still
    // produce one component labeled by the minimum doc_id; the loop's
    // graph-sized shuffle override must NOT leak into the caller's conf
    val ids = (1L to 18L)
    val d = docs(ids.map(i => (i, "x")): _*)
    val pairs = ids.init.map(i => (i, i + 1, 1.0)).toDF("doc_a", "doc_b", "jaccard")
    val confBefore = spark.conf.get("spark.sql.shuffle.partitions")
    val out = TextDedup.dedupClusters(d, pairs, maxIters = 20)
      .as[(Long, Long, Long)].collect().toSet
    assert(out === ids.map(i => (i, 1L, 18L)).toSet)
    assert(spark.conf.get("spark.sql.shuffle.partitions") === confBefore)
  }

  test("dedupClusters fails loudly when maxIters is below the chain diameter") {
    // a 5-node path needs >1 propagation round; maxIters=1 must throw,
    // not silently emit a split clustering
    val d = docs((1L, "x"), (2L, "x"), (3L, "x"), (4L, "x"), (5L, "x"))
    val pairs = Seq((1L, 2L, 1.0), (2L, 3L, 1.0), (3L, 4L, 1.0), (4L, 5L, 1.0))
      .toDF("doc_a", "doc_b", "jaccard")
    val ex = intercept[IllegalStateException] {
      TextDedup.dedupClusters(d, pairs, maxIters = 1).collect()
    }
    assert(ex.getMessage.contains("did not converge"))
  }

  test("repetitionScore: top shingle share via sorted-run fold, no shuffle") {
    // "a b a b a b" → shingles (a b a),(b a b),(a b a),(b a b): top 2 of 4
    val out = TextDedup.repetitionScore(
      docs((1L, "a b a b a b"), (2L, "u v w x y z"), (3L, "too short")))
      .as[(Long, Long, Long, Double)].collect()
      .map { case (id, tf, n, r) => id -> ((tf, n, r)) }.toMap
    assert(out(1L) === ((2L, 4L, 0.5)))
    assert(out(2L) === ((1L, 4L, 0.25)))
    assert(!out.contains(3L)) // fewer than k words → excluded
    // plan sanity: a per-row operator must not shuffle beyond Par.widen
    val plan = TextDedup.repetitionScore(docs((1L, "a b c d")))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("hashpartitioning"),
      s"repetitionScore should not shuffle on a key:\n$plan")
  }

  test("contentHashDedup groups exact copies and keeps min doc_id") {
    val out = TextDedup.contentHashDedup(docs((5L, "same"), (9L, "same"), (7L, "other")))
      .select("doc_id", "n_copies").as[(Long, Long)].collect().toSet
    assert(out === Set((5L, 2L), (7L, 1L)))
  }

  test("fingerprint is order-sensitive") {
    val fp = Text.docFingerprint(docs((1L, "a b"), (2L, "b a")))
      .as[(Long, Long)].collect().toMap
    assert(fp(1L) !== fp(2L))
  }

  test("dimStats: exact per-dimension n/mean/min/max") {
    val e = Seq((1L, Array(1.0f, 2.0f)), (2L, Array(3.0f, 6.0f)),
      (3L, Array(2.0f, 4.0f))).toDF("vec_id", "embedding")
    val out = Similarity.dimStats(e)
      .as[(Int, Long, Double, Double, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(out(0) === ((3L, 2.0, 1.0, 3.0)))
    assert(out(1) === ((3L, 4.0, 2.0, 6.0)))
  }

  test("LSH cosine near-dup has full recall vs the exact all-pairs result") {
    // sf0.1 carries 14 pairs barely above the 0.5 threshold (cos .50-.60)
    // — the worst case for hyperplane LSH recall; seed is fixed, so a pass
    // here is deterministic
    for (sf <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.1")) {
      val e = Tables.embeddings(spark, sf)
      val lsh = Similarity.cosineNearDup(e, 0.5)
        .as[(Long, Long, Double)].collect().toSet
      val exact = Similarity.cosineNearDupExact(e, 0.5)
        .as[(Long, Long, Double)].collect().toSet
      assert(lsh === exact, s"at $sf")
    }
  }

  test("cosineNearDup at threshold 0.9 with bandingFor params matches exact") {
    // a production-strength sweep (cos >= 0.9) must not inherit the 0.5
    // test tuning: bandingFor derives (bits, bands) from the threshold
    // angle + corpus size, and the LSH result must equal the exact
    // all-pairs oracle (fixed seed => deterministic pass)
    val base = (0 until 20).map(i =>
      Array.tabulate(8)(d => math.sin(i * 1.3 + d * 0.9).toFloat))
    val e = base.zipWithIndex.flatMap { case (v, i) =>
      // a near-copy at cos >= 0.9 for every even vector
      val copy = v.map(x => (x + 0.02f * (if (i % 2 == 0) 1 else 5)))
      Seq((i.toLong * 2, v), (i.toLong * 2 + 1, copy))
    }.toDF("vec_id", "embedding")
    val n = e.count()
    val (bits, bands) = Similarity.bandingFor(0.9, n)
    assert(bits >= 4 && bands >= 8)
    val lsh = Similarity.cosineNearDup(e, 0.9, bitsPerBand = bits, bands = bands)
      .as[(Long, Long, Double)].collect().toSet
    val exact = Similarity.cosineNearDupExact(e, 0.9)
      .as[(Long, Long, Double)].collect().toSet
    assert(exact.nonEmpty) // the fixture must actually exercise 0.9 pairs
    assert(lsh === exact)
  }

  test("bandingFor reproduces the verified gate tuning and scales with corpus") {
    assert(Similarity.bandingFor(0.5, 500L) === ((4, 32)))
    val (bitsBig, _) = Similarity.bandingFor(0.5, 1000000L)
    assert(bitsBig > 4) // bucket population follows the corpus
    val (_, bandsHigh) = Similarity.bandingFor(0.9, 500L)
    val (_, bandsLow) = Similarity.bandingFor(0.5, 500L)
    assert(bandsHigh < bandsLow) // tighter threshold needs fewer bands
  }

  test("brute-force top-k: nearest neighbor of a vector is its duplicate") {
    val e = Seq(
      (0L, Array(1.0f, 0.0f)), (1L, Array(1.0f, 0.0f)),
      (2L, Array(0.0f, 1.0f)), (3L, Array(0.9f, 0.1f))
    ).toDF("vec_id", "embedding")
    val out = Similarity.bruteForceTopK(e, e.filter(col("vec_id") === 0), 2)
      .select("neighbor_id", "rank").as[(Long, Int)].collect().toSet
    assert(out === Set((1L, 1), (3L, 2))) // self excluded, cosine order
  }

  test("IVF top-k returns self-consistent ranks within probed buckets") {
    val e = (0L until 40L).map(i =>
      (i, Array.tabulate(4)(d => math.sin(i * 0.7 + d).toFloat))).toDF("vec_id", "embedding")
    val out = Similarity.ivfTopK(e, e.filter(col("vec_id") < 4), 3, nlist = 4, nprobe = 2)
    val byQ = out.select("q_id", "rank").as[(Long, Int)].collect().groupBy(_._1)
    assert(byQ.keySet === Set(0L, 1L, 2L, 3L))
    byQ.values.foreach(rs => assert(rs.map(_._2).sorted.toSeq === Seq(1, 2, 3)))
  }

  test("sourceMinhashSim: identical sources estimate 1.0; disjoint near 0; " +
       "estimate tracks exact within MinHash sampling error") {
    val mk = (src: String, texts: Seq[String], base: Long) =>
      texts.zipWithIndex.map { case (t, i) => (base + i, t, src) }
    val common = (0 until 30).map(i => s"w$i x$i y$i z$i q$i r$i")
    val other = (0 until 30).map(i => s"aa$i bb$i cc$i dd$i ee$i ff$i")
    val d = (mk("s1", common, 0) ++ mk("s2", common, 100) ++
        mk("s3", other, 200))
      .toDF("doc_id", "text", "source")
    val out = TextDedup.sourceMinhashSim(d)
      .select("src_a", "src_b", "est_sim", "exact_sim")
      .as[(String, String, Double, Double)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    assert(out(("s1", "s2")) === ((1.0, 1.0)))   // same shingle set
    assert(out(("s1", "s3"))._2 === 0.0)         // disjoint truth
    assert(out(("s1", "s3"))._1 <= 0.05)         // sketch near zero
    // half/half mixture: exact = 30/(30+30+30) = 1/3; 64 hashes gives
    // stderr ~ sqrt(J(1-J)/64) ~ 0.06 — assert within 4 sigma
    val mixed = (mk("m1", common ++ other, 300) ++ mk("m2", common, 500))
      .toDF("doc_id", "text", "source")
    val mix = TextDedup.sourceMinhashSim(mixed)
      .select("src_a", "src_b", "est_sim", "exact_sim")
      .as[(String, String, Double, Double)].collect().head
    assert(mix._4 === 0.5) // |A∩B| = common's 120 shingles, |A∪B| = 240
    assert(math.abs(mix._3 - mix._4) < 0.25)
  }
}
