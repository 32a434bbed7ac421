package graft.ops

import org.apache.spark.sql.DataFrame

/** Parallelism guard for CPU-heavy per-row operators (shingling,
  * hashing, vector math): small single-file parquet inputs arrive as ONE
  * partition, which would serialize the whole computation on one core.
  * Widening to the session's default parallelism is a no-op on real
  * cluster inputs (already wider) and a cheap shuffle of the narrow input
  * otherwise.
  */
object Par {
  def widen(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }
}
