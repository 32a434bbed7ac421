package graft.tools
import org.apache.spark.sql.SparkSession

/** Print the captured micro-batch plan of a streaming op (the evidence
  * [[Plans]] audits) — PlanProbe's streaming sibling.
  */
object StreamPlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.streaming.Streaming.lastMicroBatchPlan = ""
    graft.SparkEntry.queries(args(0))(spark,
      args.lift(1).getOrElse("/root/testdata/sf0.001")).count()
    println("=== captured micro-batch plan ===")
    println(graft.streaming.Streaming.lastMicroBatchPlan)
    spark.stop()
  }
}
