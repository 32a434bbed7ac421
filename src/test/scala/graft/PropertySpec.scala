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
}
