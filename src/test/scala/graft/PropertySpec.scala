package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Dedup, Merge}

/** Property-style tests over seeded random inputs (SURVEY §5.2.3).
  * Deterministic seed — each case runs real Spark jobs, so the case count
  * stays small.
  */
class PropertySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val rnd = new scala.util.Random(7)
  private def randRows(n: Int): Seq[(Long, Long, String)] =
    Seq.fill(n)((rnd.nextInt(9).toLong, rnd.nextInt(21).toLong,
      rnd.alphanumeric.take(4).mkString))

  test("dedupLatest output has unique keys and rows drawn from the input") {
    for (_ <- 1 to 5) {
      val rows = randRows(1 + rnd.nextInt(40))
      val out = Dedup.dedupLatest(rows.toDF("k", "ts", "payload"), Seq("k"),
        col("ts"), Seq(col("payload"))).as[(Long, Long, String)].collect()
      assert(out.map(_._1).distinct.length === out.length)
      val in = rows.toSet
      assert(out.forall(in.contains))
    }
  }

  test("merge idempotency: merge(merge(t,s),s) == merge(t,s)") {
    for (_ <- 1 to 5) {
      def dedup(rows: Seq[(Long, Long, String)]) =
        Dedup.dedupLatest(rows.toDF("k", "ts", "payload"), Seq("k"),
          col("ts"), Seq(col("payload")))
      val tgt = dedup(randRows(rnd.nextInt(30)))
      val src = dedup(randRows(rnd.nextInt(30)))
      val once = Merge.mergeUpsert(tgt, src, Seq("k"))
      val twice = Merge.mergeUpsert(once, src, Seq("k"))
      assert(once.as[(Long, Long, String)].collect().toSet ===
        twice.as[(Long, Long, String)].collect().toSet)
    }
  }

  test("conditional latest-wins merge is batching-independent (streaming invariant)") {
    for (splits <- 1 to 4) {
      val rows = randRows(1 + rnd.nextInt(40))
      def latest(df: org.apache.spark.sql.DataFrame) =
        Dedup.dedupLatest(df, Seq("k"), col("ts"), Seq(col("payload")))
      val all = latest(rows.toDF("k", "ts", "payload"))
        .as[(Long, Long, String)].collect().toSet
      val chunkSize = math.max(1, rows.size / splits)
      val incremental = rows.grouped(chunkSize)
        .foldLeft(Seq.empty[(Long, Long, String)].toDF("k", "ts", "payload")) {
          (target, batch) =>
            latest(target.unionByName(batch.toDF("k", "ts", "payload")))
        }.as[(Long, Long, String)].collect().toSet
      assert(incremental === all)
    }
  }

  test("zValue is a bijection on the bits-bounded domain") {
    // every (a, b) pair in [0, 2^5)² maps to a distinct z — no collisions
    // means sorting by z is a true space-filling-curve order
    val pairs = for (a <- 0L until 32L; b <- 0L until 32L) yield (a, b)
    val zs = pairs.toDF("a", "b")
      .select(graft.ops.Distribute.zValue(col("a"), col("b"), 5).as("z"))
      .as[Long].collect()
    assert(zs.distinct.length === 1024)
    assert(zs.min === 0L && zs.max === 1023L) // exactly fills [0, 2^10)
  }

  test("piiRedact is idempotent: redacting redacted text changes nothing") {
    val texts = Seq.fill(20)(
      s"u${rnd.nextInt(100)}@x.org 10.0.${rnd.nextInt(256)}.1 " +
        s"call ${100 + rnd.nextInt(900)}-${1000 + rnd.nextInt(9000)} " +
        rnd.alphanumeric.take(12).mkString)
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val once = graft.ops.Scrub.piiRedact(df)
    val twice = graft.ops.Scrub.piiRedact(
      once.select(col("doc_id"), col("clean_text").as("text")))
    val a = once.select("doc_id", "clean_text").as[(Long, String)].collect().toSet
    val b = twice.select("doc_id", "clean_text").as[(Long, String)].collect().toSet
    assert(a === b)
    // and the second pass finds zero PII
    assert(twice.agg(sum(col("n_emails") + col("n_ips") + col("n_phones")))
      .as[Long].head() === 0L)
  }

  test("splitAssign proportions approximate 80/10/10 over a large id range") {
    val out = graft.ops.Shard.splitAssign((1L to 5000L).toDF("doc_id"), col("doc_id"))
      .groupBy("split").count().as[(String, Long)].collect().toMap
    assert(math.abs(out("train") - 4000L) < 200)
    assert(math.abs(out("val") - 500L) < 120)
    assert(math.abs(out("test") - 500L) < 120)
  }
}
