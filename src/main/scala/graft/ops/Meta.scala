package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Per-row metadata / normalization / sanitize projections — the
  * reference's transform stage (`pipeline/data_pipeline.py:69-88,126-152`).
  * All three are pure projections: zero shuffles, fully inside
  * whole-stage codegen.
  */
object Meta {

  /** Add lineage columns: `load_timestamp` + `source_file`
    * (`data_pipeline.py:79-81`). The clock is a parameter so verified
    * outputs can pin it (SURVEY §7.3 — `current_timestamp()` can never
    * hash-match an oracle); production callers pass the default.
    */
  def addMetadata(df: DataFrame,
                  clock: Column = current_timestamp(),
                  sourceFile: Column = input_file_name()): DataFrame =
    df.withColumn("load_timestamp", clock)
      .withColumn("source_file", sourceFile)

  /** JSON-stringify every residual complex column (array/map/struct) —
    * the reference's `sanitize_dataframe` (`data_pipeline.py:20-23`,
    * applied `:82,138`) which `json.dumps`s any list/dict cell before
    * load.
    */
  def sanitizeComplex(df: DataFrame): DataFrame = {
    val complexCols = df.schema.fields.collect {
      case f if f.dataType.isInstanceOf[ArrayType] ||
                f.dataType.isInstanceOf[MapType]   ||
                f.dataType.isInstanceOf[StructType] => f.name
    }
    complexCols.foldLeft(df)((d, c) => d.withColumn(c, to_json(col(c))))
  }

  /** Type normalization with coerce-to-NULL semantics
    * (`data_pipeline.py:131-136`): date parse failures become NULL (the
    * pandas `errors="coerce"` contract), ids are forced to string. Uses
    * `try_cast` because Spark 4 runs ANSI mode by default (a plain cast
    * would throw on the reference's dirty dates).
    */
  def coerceDate(c: Column): Column = c.try_cast(DateType)

  def coerceString(c: Column): Column = c.cast(StringType)
}
