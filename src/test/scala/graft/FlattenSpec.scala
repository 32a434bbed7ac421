package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Flatten

class FlattenSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("nested structs flatten with sep, like json_normalize(sep='_')") {
    val df = spark.read.json(Seq(
      """{"visitId":"1","device":{"browser":"ff","os":{"name":"nix"}},"totals":{"hits":3}}"""
    ).toDS())
    val flat = Flatten.flatten(df)
    assert(flat.columns.toSet ===
      Set("visitId", "device_browser", "device_os_name", "totals_hits"))
    val r = flat.select("device_os_name", "totals_hits").head()
    assert(r.getString(0) === "nix" && r.getLong(1) === 3L)
  }

  test("name collisions get numeric suffixes instead of duplicate labels") {
    val df = spark.read.json(Seq(
      """{"a_b": 1, "a": {"b": 2}}"""
    ).toDS())
    val flat = Flatten.flatten(df)
    assert(flat.columns.sorted === Array("a_b", "a_b_1"))
    // first-in-schema-order wins the base name (json reader sorts keys,
    // so nested a.b precedes top-level a_b here); the other gets _1
    assert(flat.select("a_b").head().getLong(0) === 2L)
    assert(flat.select("a_b_1").head().getLong(0) === 1L)
  }

  test("arrays pass through untouched (sanitize handles them)") {
    val df = spark.read.json(Seq("""{"xs":[1,2],"s":{"y":9}}""").toDS())
    val flat = Flatten.flatten(df)
    assert(flat.columns.toSet === Set("xs", "s_y"))
    assert(flat.schema("xs").dataType.typeName === "array")
  }

  test("custom separator") {
    val df = spark.read.json(Seq("""{"a":{"b":1}}""").toDS())
    assert(Flatten.flatten(df, ".").columns === Array("a.b"))
  }
}
