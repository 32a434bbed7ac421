package graft.tools

import org.apache.spark.sql.SparkSession

/** One-query fingerprint probe: prints the PlanFingerprintSpec token
  * counts (parquet scans, line-anchored shuffle exchanges, BNLJ/
  * cartesian tokens) for a registered query without running the full
  * Plans regeneration — the fast loop for authoring a new golden.
  *
  *   sbt "runMain graft.tools.PlanProbe <query> [sfDir]"
  */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse(
      sys.error("usage: PlanProbe <query> [sfDir]"))
    val sfDir = args.drop(1).headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir", "/root/repo/target/spark-warehouse")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.SparkEntry.queries(name)(spark, sfDir)
    val plan = df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    def cnt(n: String): Int = {
      var c = 0; var i = plan.indexOf(n)
      while (i >= 0) { c += 1; i = plan.indexOf(n, i + 1) }
      c
    }
    val exch = """(?m)^[\s+:|-]*Exchange \(""".r.findAllIn(plan).size
    println(s"[probe] $name: scans=${cnt("Scan parquet")} " +
      s"exchanges=$exch bnlj=${cnt("BroadcastNestedLoopJoin")} " +
      s"cartesian=${cnt("CartesianProduct")} " +
      s"inmemory=${cnt("InMemoryRelation")}")
    spark.stop()
  }
}
