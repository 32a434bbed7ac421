package graft.tools
import org.apache.spark.sql.SparkSession
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.SparkEntry.queries(args(0))(spark, args.lift(1).getOrElse("/root/testdata/sf0.001"))
    val plan = df.queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
    def count(n: String) = plan.sliding(n.length).count(_ == n)
    println("scanTokens=" + count("Scan parquet"))
    println("exchTokens=" + """(?m)^[\s+:|-]*Exchange \(""".r.findAllIn(plan).size)
    println("reused=" + count("ReusedExchange"))
    println("sorts=" + count("Sort ("))
    println("bnlj=" + count("BroadcastNestedLoopJoin"))
    println("cartesian=" + count("CartesianProduct"))
    println(plan.linesIterator.filter(l => l.contains("Exchange") || l.contains("SortMergeJoin") || l.contains("ShuffledHashJoin")).take(40).mkString("\n"))
    spark.stop()
  }
}
