package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import scala.collection.mutable

/** Recursive struct flattening — the Spark-native equivalent of pandas
  * `json_normalize(records, sep="_")` (reference:
  * `pipeline/data_pipeline.py:74`). Nested struct fields are promoted to
  * top-level columns named `a<sep>b<sep>c`. Arrays/maps are left intact
  * (see [[Sanitize]] for the reference's list/dict → JSON-string pass,
  * `data_pipeline.py:20-23`).
  *
  * Collision policy (SURVEY §7.3): if a flat column `a_b` and a nested
  * `a.b` both map to `a_b`, later occurrences get a numeric suffix
  * (`a_b_1`) — json_normalize would emit duplicate labels, which Spark
  * forbids, so we make the policy explicit.
  *
  * Scale: this is a pure projection (one `select`), so it stays inside
  * whole-stage codegen and costs nothing beyond the column reads; parquet
  * schema pruning still applies to the accessed leaf fields.
  */
object Flatten {

  private def quote(part: String): String = "`" + part.replace("`", "``") + "`"

  def flatten(df: DataFrame, sep: String = "_"): DataFrame = {
    val out  = mutable.ListBuffer.empty[org.apache.spark.sql.Column]
    val seen = mutable.Map.empty[String, Int]

    def walk(path: Seq[String], dt: DataType): Unit = dt match {
      case s: StructType =>
        s.fields.foreach(f => walk(path :+ f.name, f.dataType))
      case _ =>
        val base = path.mkString(sep)
        val n    = seen.getOrElse(base, 0)
        seen(base) = n + 1
        val name = if (n == 0) base else s"$base$sep$n"
        out += col(path.map(quote).mkString(".")).as(name)
    }

    df.schema.fields.foreach(f => walk(Seq(f.name), f.dataType))
    df.select(out.toSeq: _*)
  }

  /** Parse a JSON string column into a struct with the given schema, then
    * flatten — the full `json_normalize` analog for string-typed JSON
    * (reference ingests raw JSON pages, `data_pipeline.py:40-44,74`).
    */
  def flattenJsonColumn(df: DataFrame, jsonCol: String, schema: StructType,
                        sep: String = "_"): DataFrame =
    flatten(df.withColumn(jsonCol, from_json(col(jsonCol), schema)), sep)
}
