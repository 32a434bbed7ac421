package graft.tools

import org.apache.spark.sql.SparkSession

/** Interleaved one-JVM A/B/C of the char-funnel LSH candidate shapes
  * (BENCH_NOTES r12) — alternating passes so host drift hits all arms
  * equally. Usage: runMain graft.tools.AbChar [sfDir] [rounds]
  */
object AbChar {
  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val rounds = args.lift(1).map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val arms = Seq("join", "join_repart", "group")
    val times = scala.collection.mutable.Map[String, List[Double]]()
      .withDefaultValue(Nil)
    var rowsSeen = scala.collection.mutable.Map[String, Long]()
    // one untimed warmup per arm
    for (a <- arms) {
      sys.props("graft.char.lsh") = a
      spark.catalog.clearCache()
      rowsSeen(a) = graft.SparkEntry.queries("near_dedup_chars")(spark, sfDir).count()
    }
    for (r <- 1 to rounds; a <- arms) {
      sys.props("graft.char.lsh") = a
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      val n = graft.SparkEntry.queries("near_dedup_chars")(spark, sfDir).count()
      val dt = (System.nanoTime() - t0) / 1e9
      times(a) = dt :: times(a)
      println(f"round$r $a%12s $dt%7.2f s rows=$n")
    }
    for (a <- arms)
      println(f"$a%12s min=${times(a).min}%6.2f med=${times(a).sorted.apply(times(a).size/2)}%6.2f rows=${rowsSeen(a)}")
    spark.stop()
  }
}
