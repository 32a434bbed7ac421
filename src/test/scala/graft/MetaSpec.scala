package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Meta

class MetaSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("coerceDate: invalid dates become NULL (pandas errors='coerce', ref :131-132)") {
    val df = Seq("2024-01-31", "not-a-date", "2024-13-99").toDF("d")
      .select(Meta.coerceDate(col("d")).as("d"))
    val got = df.collect().map(r => Option(r.getDate(0)).map(_.toString))
    assert(got.toSeq === Seq(Some("2024-01-31"), None, None))
  }

  test("sanitizeComplex stringifies arrays/structs/maps only (ref :20-23)") {
    val df = Seq((1L, Seq(1, 2), ("x", 3))).toDF("id", "xs", "st")
    val out = Meta.sanitizeComplex(df)
    assert(out.schema.fields.map(_.dataType.typeName).toSeq ===
      Seq("long", "string", "string"))
    val r = out.head()
    assert(r.getString(1) === "[1,2]")
    assert(r.getString(2) === """{"_1":"x","_2":3}""")
  }

  test("addMetadata adds lineage columns (ref :79-81)") {
    val out = Meta.addMetadata(Seq(1).toDF("x"),
      clock = to_timestamp(lit("2026-01-01 00:00:00")),
      sourceFile = lit("f.json"))
    assert(out.columns.toSeq === Seq("x", "load_timestamp", "source_file"))
    assert(out.head().getString(2) === "f.json")
  }
}
