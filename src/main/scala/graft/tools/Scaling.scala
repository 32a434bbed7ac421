package graft.tools

import org.apache.spark.sql.SparkSession

import java.nio.file.{Files, Paths}

/** Empirical scaling-exponent harness (round-9 verdict item 4): the
  * 100 TB story was argued entirely from plan shapes; this measures it.
  * For the heavy warm tail, run sf0.01 and sf0.1 in ONE JVM (1 cold +
  * 2 warm passes per SF, per-query warm MIN — the bench's own noise
  * methodology) and report t(0.1)/t(0.01) plus the implied exponent
  * log10(ratio): 1.0 = linear, 2.0 = quadratic. Both SFs run under the
  * same host conditions minutes apart, so the RATIO is far more
  * load-robust than either absolute number.
  *
  * Output: /root/repo/SCALING.json (committed; ScalingSpec gates it)
  * and a markdown table on stdout for SCALE.md.
  *
  * Usage: sbt "runMain graft.tools.Scaling [topN]"  (default 12 —
  * the latest committed bench's top-N warm queries)
  */
object Scaling {

  /** Top-N warm query names from the newest PARSEABLE bench snapshot
    * on disk — the same selection HeavyTailAuditSpec uses
    * ([[BenchFiles.latestWarm]] skips the driver's truncated-tail
    * wrapper files, which have no warm map).
    */
  def topWarm(n: Int): Seq[String] = {
    val (_, warm) = BenchFiles.latestWarm()
    warm.toSeq.sortBy(-_._2).take(n).map(_._1)
  }

  def main(args: Array[String]): Unit = {
    val topN = args.headOption.map(_.toInt).getOrElse(12)
    val names = topWarm(topN)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir", "/root/repo/target/spark-warehouse")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def measure(sfDir: String): Map[String, Double] = {
      def once(name: String): Double = {
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(name)(spark, sfDir).count()
        val dt = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        dt
      }
      names.map { n =>
        once(n) // cold: classload/codegen/page-cache amortization
        n -> math.min(once(n), once(n)) // warm MIN of two passes
      }.toMap
    }

    val t001 = measure("/root/testdata/sf0.01")
    val t01 = measure("/root/testdata/sf0.1")

    val rows = names.map { n =>
      val a = t001(n); val b = t01(n)
      val ratio = b / a
      val expo = math.log10(ratio)
      (n, a, b, ratio, expo)
    }.sortBy(-_._4)

    println("| query | t(sf0.01) s | t(sf0.1) s | ratio | exponent |")
    println("|---|---|---|---|---|")
    rows.foreach { case (n, a, b, r, e) =>
      println(f"| `$n` | $a%.2f | $b%.2f | $r%.1fx | $e%.2f |")
    }

    val json = rows.map { case (n, a, b, r, e) =>
      f"""{"query":"$n","t001":$a%.4f,"t01":$b%.4f,"ratio":$r%.3f,"exponent":$e%.3f}"""
    }.mkString("""{"data_ratio":10.0,"entries":[""", ",", "]}")
    Files.writeString(Paths.get("/root/repo/SCALING.json"), json + "\n")
    println(s"wrote SCALING.json (${rows.size} queries)")
    spark.stop()
  }
}
