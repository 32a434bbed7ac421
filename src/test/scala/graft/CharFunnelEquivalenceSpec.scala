package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.TextDedup

/** Pins the round-11 fusion's correctness argument as a property, not
  * prose: the fused candidate builder (signature-agreement filter run
  * INSIDE the band self-join / on the rare-pair stream) must admit
  * EXACTLY the pair set of the staged r10 shape
  * (union → distinct → signature joins → filter) — the equivalence
  * filter∘distinct∘union ≡ distinct∘union∘filter for a per-pair
  * predicate, which holds only while the fused path applies the SAME
  * predicate with the SAME minAgree to BOTH generators. A future edit
  * that, say, drops the prefilter on the rare path (an attractive
  * "optimization" — it only ADDS stage-2 work, the final output is
  * unchanged) would silently break the documented equivalence; this
  * spec makes that a red test instead of a stale scaladoc.
  *
  * The staged reference is reconstructed HERE from the surviving
  * building blocks (bucketPairs, bandsOf, pairIntersections) — the
  * exact round-10 composition, kept in the test so the op code carries
  * no dead path.
  */
class CharFunnelEquivalenceSpec extends AnyFunSuite {

  private val dir = "/root/testdata/sf0.001"
  private val n = 5
  private val threshold = 0.5

  private def stagedCandidates(hashed: DataFrame, sigs: DataFrame,
                               cap: Int, bands: Int,
                               margin: Double): DataFrame = {
    val minAgree =
      math.max(0, math.ceil((threshold - margin) *
        TextDedup.charNumHashes)).toInt
    val sigInts = sigs.select(col("doc_id"),
      transform(col("sig"), v => v.cast("int")).as("sig"))
    val cand = TextDedup
      .bucketPairs(TextDedup.bandsOf(sigs, TextDedup.charNumHashes, bands))
      .unionByName(TextDedup.pairIntersections(
        hashed.withColumnRenamed("x", "shingle"), cap)
        .select(col("doc_a"), col("doc_b")))
      .distinct()
    cand
      .join(sigInts.select(col("doc_id").as("doc_a"), col("sig").as("sig_a")), "doc_a")
      .join(sigInts.select(col("doc_id").as("doc_b"), col("sig").as("sig_b")), "doc_b")
      .filter(size(filter(zip_with(col("sig_a"), col("sig_b"),
        (x, y) => when(x === y, lit(1))), e => e.isNotNull)) >= minAgree)
      .select(col("doc_a"), col("doc_b"))
  }

  test("fused candidate set == staged r10 candidate set (sf0.001)") {
    val spark = TestSpark.spark
    spark.catalog.clearCache()
    val docs = Tables.documents(spark, dir).select(col("doc_id"), col("text"))
    val (bands, cap, margin) =
      TextDedup.charFunnelParams(threshold, docs.count())
    val hashed = TextDedup.charHashedShingles(docs, n).persist()
    val sigs = TextDedup.minhashSigs(hashed, TextDedup.charNumHashes,
      TextDedup.lshPrime).persist()
    try {
      val fused = TextDedup
        .charFusedCandidates(hashed, sigs, cap, bands, threshold, margin)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val staged = stagedCandidates(hashed, sigs, cap, bands, margin)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(fused.nonEmpty, "degenerate: zero candidates on the gate corpus")
      val onlyFused = fused -- staged
      val onlyStaged = staged -- fused
      assert(onlyFused.isEmpty && onlyStaged.isEmpty,
        s"candidate sets diverged: ${onlyFused.size} only-fused " +
        s"(e.g. ${onlyFused.take(3)}), ${onlyStaged.size} only-staged " +
        s"(e.g. ${onlyStaged.take(3)})")
    } finally { hashed.unpersist(); sigs.unpersist() }
  }

  test("all three A/B LSH shapes admit the identical candidate set") {
    // the r12 skew A/B (tools.AbChar / BENCH_NOTES) compared plan
    // SHAPES only; this pins that the toggle arms are semantically one
    // operator, so a timing rerun can never compare different outputs
    val spark = TestSpark.spark
    spark.catalog.clearCache()
    val docs = Tables.documents(spark, dir).select(col("doc_id"), col("text"))
    val (bands, cap, margin) =
      TextDedup.charFunnelParams(threshold, docs.count())
    val hashed = TextDedup.charHashedShingles(docs, n).persist()
    val sigs = TextDedup.minhashSigs(hashed, TextDedup.charNumHashes,
      TextDedup.lshPrime).persist()
    val prev = sys.props.get("graft.char.lsh")
    try {
      val sets = Seq("join", "join_repart", "group").map { arm =>
        sys.props("graft.char.lsh") = arm
        arm -> TextDedup
          .charFusedCandidates(hashed, sigs, cap, bands, threshold, margin)
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      }
      assert(sets.head._2.nonEmpty, "degenerate: zero candidates")
      for (Seq((a, sa), (b, sb)) <- sets.sliding(2))
        assert(sa == sb, s"$a vs $b candidate sets diverged: " +
          s"${(sa -- sb).size} only-$a, ${(sb -- sa).size} only-$b")
    } finally {
      prev match {
        case Some(v) => sys.props("graft.char.lsh") = v
        case None => sys.props -= "graft.char.lsh"
      }
      hashed.unpersist(); sigs.unpersist()
    }
  }
}
