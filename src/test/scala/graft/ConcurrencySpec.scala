package graft

import org.scalatest.funsuite.AnyFunSuite

import java.util.concurrent.Executors
import scala.concurrent.duration.Duration
import scala.concurrent.{Await, ExecutionContext, Future}

/** Concurrent-query isolation: several registered queries — including
  * the child-session users (link_predict, dedup_canonical re-size their
  * loop shuffles in an isolated SQLConf) — run AT THE SAME TIME on one
  * SparkSession, and must (a) produce results hash-identical to their
  * sequential runs and (b) leave the parent session's conf untouched.
  * This is the proof behind SCALE.md's claim that the per-op conf
  * scoping is safe under a multi-tenant driver: a shared Spark
  * ThriftServer / notebook server runs exactly this shape.
  */
class ConcurrencySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  // a deliberate mix: two child-session graph loops, a SQL-surface
  // query with temp views, joins/windows/aggregates, and a sketch
  private val names = Seq(
    "link_predict", "dedup_canonical", "agg_rollup", "window_latest",
    "similarity_topk", "sql_correlated_agg", "hll_distinct", "dq_report")

  /** Canonical fingerprint of a query result: rows rendered to sorted
    * strings (the driver's own hash-compare discipline). */
  private def fingerprint(name: String): Seq[String] =
    SparkEntry.queries(name)(spark, sf)
      .collect().map(_.toString).sorted.toSeq

  test("8 queries run concurrently on one session: results identical " +
       "to sequential, no conf leakage") {
    val parts0 = spark.conf.get("spark.sql.shuffle.partitions")
    val sequential = names.map(n => n -> fingerprint(n)).toMap

    val pool = Executors.newFixedThreadPool(names.size)
    implicit val ec: ExecutionContext =
      ExecutionContext.fromExecutorService(pool)
    try {
      val concurrent = Await.result(
        Future.sequence(names.map(n => Future(n -> fingerprint(n)))),
        Duration.Inf).toMap
      names.foreach { n =>
        assert(concurrent(n) === sequential(n),
          s"$n diverged under concurrency")
      }
    } finally pool.shutdown()

    assert(spark.conf.get("spark.sql.shuffle.partitions") === parts0,
      "a query leaked a shuffle-partitions override into the shared session")
  }
}
