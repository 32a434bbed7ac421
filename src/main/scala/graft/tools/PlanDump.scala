package graft.tools
import org.apache.spark.sql.SparkSession

/** One-off formatted-plan dump for plan audits (PlanProbe's sibling —
  * prints the WHOLE formatted plan instead of token counts).
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.SparkEntry.queries(args(0))(spark,
      args.lift(1).getOrElse("/root/testdata/sf0.001"))
    println(df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode))
    spark.stop()
  }
}
