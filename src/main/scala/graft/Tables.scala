package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver's parquet testdata (TESTDATA.md).
  * All operators take `(SparkSession, sfDir)` and read via these so the
  * same code runs at any scale factor — and, on a real cluster, against
  * any parquet root.
  */
object Tables {
  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String)     = t(s, d, "region")
  def nation(s: SparkSession, d: String)     = t(s, d, "nation")
  def customer(s: SparkSession, d: String)   = t(s, d, "customer")
  def supplier(s: SparkSession, d: String)   = t(s, d, "supplier")
  def part(s: SparkSession, d: String)       = t(s, d, "part")
  def orders(s: SparkSession, d: String)     = t(s, d, "orders")
  def lineitem(s: SparkSession, d: String)   = t(s, d, "lineitem")
  /** events.parquet stores `ts` as TIMESTAMP(NANOS), which Spark 4's
    * parquet reader rejects outright. Read it as raw nanos
    * (legacy.parquet.nanosAsLong) and truncate to Spark's native
    * microsecond TimestampType — same truncation DuckDB applies on
    * `CAST(ts AS TIMESTAMP)`, so oracles line up.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = t(s, d, "events")
    if (raw.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      raw.withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
    else raw
  }
  def documents(s: SparkSession, d: String)  = t(s, d, "documents")
  def embeddings(s: SparkSession, d: String) = t(s, d, "embeddings")
}
