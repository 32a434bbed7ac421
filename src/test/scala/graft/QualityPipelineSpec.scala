package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Quality
import graft.runner.Pipeline

class QualityPipelineSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val contract = Quality.DqContract(Seq("k", "v"), Seq("k"))

  private def report(df: org.apache.spark.sql.DataFrame) =
    Quality.dqReport(df, contract).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap

  test("empty input fails empty_input and low_volume (ref :94-96,119-120)") {
    val r = report(Seq.empty[(Long, String)].toDF("k", "v"))
    assert(r("empty_input") === ((0L, false)))
    assert(r("low_volume") === ((0L, false)))
    assert(r("null_keys") === ((0L, true)))
  }

  test("missing required column is reported (ref :97-103)") {
    val r = report(Seq((1L, "x")).toDF("k", "other"))
    assert(r("required_columns") === ((1L, false)))
  }

  test("null keys and duplicate keys counted in one pass (ref :105-116)") {
    val df = Seq((Some(1L), "a"), (None, "b"), (Some(1L), "c"), (Some(2L), "d"),
      (Some(3L), "e")).toDF("k", "v")
    val r = report(df)
    assert(r("null_keys") === ((1L, false)))
    assert(r("duplicate_keys") === ((1L, false))) // NULL group counts once too
    assert(r("low_volume") === ((5L, true)))
  }

  test("observedChecks collects DQ metrics during the sink action — no extra scan") {
    val df = Seq((Some(1L), "a"), (None, "b"), (Some(3L), "c"))
      .toDF("k", "v")
    val (observed, obs) = Quality.observedChecks(df, contract)
    // the metrics ride the caller's own action (here: the sink write)
    val out = java.nio.file.Files.createTempDirectory("graft-obs").toString
    observed.write.mode("overwrite").parquet(out)
    val verdict = Quality.observedVerdict(obs, contract)
      .map { case (name, metric, ok) => name -> ((metric, ok)) }.toMap
    assert(verdict("empty_input") === ((3L, true)))
    assert(verdict("null_keys") === ((1L, false))) // one null key
    assert(verdict("low_volume") === ((3L, false))) // < 5 rows
    // and the written data is untouched by the observation
    assert(spark.read.parquet(out).count() === 3L)
  }

  test("pipeline: fatal DQ issue skips load and audits FAILED (ref :252-262)") {
    val out = java.nio.file.Files.createTempDirectory("graft-audit").toString
    val source = Seq.empty[(Long, String, Long)].toDF("id", "key", "v")
      .select(col("id"), col("key"), col("v"))
    val target = Seq((1L, "a", 1L)).toDF("id", "key", "v")
    val res = Pipeline.run(spark, source, target,
      Quality.DqContract(Seq("id", "key"), Seq("key")),
      ts = col("v"), tiebreak = Seq(col("id")),
      tableName = "t", auditPath = s"$out/audit")
    assert(res.status === "FAILED")
    val audit = res.audit.collect()
    assert(audit.length === 1)
    assert(audit.head.getAs[String]("status").startsWith("FAILED:"))
    assert(audit.head.getAs[Long]("record_count") === 0L)
    // target untouched
    assert(res.merged.count() === 1)
  }

  test("pipeline: exception during merge still audits FAILED (ref :266-271)") {
    val out = java.nio.file.Files.createTempDirectory("graft-audit3").toString
    // poison the ts column with a deterministic UDF that throws at
    // execution time: the DQ scan prunes it (only keys are aggregated), so
    // the failure surfaces in the merge materialization, not the gate.
    // spark.range (not Seq.toDF) keeps the source out of LocalRelation
    // reach — ConvertToLocalRelation would otherwise evaluate the UDF
    // eagerly inside the DQ plan's optimization.
    val boom = udf((id: Long) => if (id == 12L) throw new RuntimeException("injected") else id)
    val source = spark.range(10, 15).toDF("id")
      .withColumn("key", concat(lit("k"), col("id")))
      .withColumn("v", boom(col("id")))
    val target = Seq((1L, "z", 1L)).toDF("id", "key", "v")
    val thrown = intercept[Throwable] {
      Pipeline.run(spark, source, target,
        Quality.DqContract(Seq("id", "key"), Seq("key"), minRows = 1),
        ts = col("v"), tiebreak = Seq(col("id")),
        tableName = "t", auditPath = s"$out/audit")
    }
    info("thrown: " + thrown.toString.take(300))
    val audit = spark.read.parquet(s"$out/audit").collect()
    assert(audit.length === 1)
    assert(audit.head.getAs[String]("status").startsWith("FAILED:"))
    assert(audit.head.getAs[Long]("record_count") === 0L)
  }

  test("pipeline: duplicate keys dedup-and-continue (ref :256-258)") {
    val out = java.nio.file.Files.createTempDirectory("graft-audit2").toString
    val source = Seq((10L, "a", 5L), (11L, "a", 9L), (12L, "b", 1L))
      .toDF("id", "key", "v")
    val target = Seq((1L, "c", 1L)).toDF("id", "key", "v")
    val res = Pipeline.run(spark, source, target,
      Quality.DqContract(Seq("id", "key"), Seq("key"), minRows = 1),
      ts = col("v"), tiebreak = Seq(col("id")),
      tableName = "t", auditPath = s"$out/audit")
    assert(res.status === "SUCCESS")
    val rows = res.merged.as[(Long, String, Long)].collect().toSet
    // latest per key from source (id=11 wins for 'a'), target-only 'c' kept
    assert(rows === Set((11L, "a", 9L), (12L, "b", 1L), (1L, "c", 1L)))
  }
}
