package graft.tools

import org.apache.spark.sql.SparkSession

import java.nio.file.{Files, Paths}

/** Empirical scaling-exponent harness (round-9 verdict item 4): the
  * 100 TB story was argued entirely from plan shapes; this measures it.
  * Run sf0.001, sf0.01 and sf0.1 in ONE JVM and report BOTH decades:
  *  - ratio   = t(0.1)/t(0.01)  (10× data)  with exponent log10(ratio)
  *  - ratio100 = t(0.1)/t(0.001) (100× data) with exponent
  *    log10(ratio100)/2
  * 1.0 = linear, 2.0 = quadratic. All SFs run under the same host
  * conditions minutes apart, so the RATIOS are far more load-robust
  * than the absolute numbers.
  *
  * Two output tiers (round-12 verdict item 2 — sub-bar ops used to ship
  * with no standing measurement):
  *  - SCALING.json — every query above `marginBar` (1.5 s) warm in the
  *    newest isolated snapshot, measured 1 cold + 2 warm passes per SF
  *    (warm MIN — the bench's noise methodology). ScalingSpec gates the
  *    ratios and coverage at 2.0 s, so the 0.5 s margin absorbs
  *    round-to-round warm drift (±20–30% measured).
  *  - SCALING_SUB.json — EVERY other registered query, 1 cold + 1 warm
  *    pass per SF (sub-bar ops are fixed-overhead-dominated; the point
  *    is a standing 3-SF profile, not gating precision). ScalingSpec
  *    asserts the two files together cover the full registry, so no op
  *    can ship measurement-free.
  *
  * Honest decades (round-12 verdict item 3): the documents/embeddings
  * tables do not grow across the first decade (500 rows at sf0.001 AND
  * sf0.01), so a text op's "100×" column is really one decade. Each
  * entry carries the testdata tables its PLAN scans and
  * `honest_decades` derived from the measured per-table row counts
  * (2 = both steps grow ≥2×, 1 = only the second, 0 = neither; null =
  * derivation unavailable — e.g. streaming readouts whose returned
  * plan is a memory table). ScalingSpec gates ratio100 ≤ 100 only for
  * honest_decades = 2 entries and ≤ 10 (one real decade) otherwise.
  *
  * Usage: sbt "runMain graft.tools.Scaling [marginBarSec]"
  */
object Scaling {

  private val SfDirs =
    Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
      "/root/testdata/sf0.1")

  /** All query names above `bar` seconds warm in the newest PARSEABLE
    * bench snapshot on disk — the same source HeavyTailAuditSpec uses
    * ([[BenchFiles.latestWarm]] skips the driver's truncated-tail
    * wrapper files, which have no warm map).
    */
  def warmAbove(bar: Double): Seq[String] = {
    val (_, warm) = BenchFiles.latestWarm()
    warm.toSeq.filter(_._2 > bar).sortBy(-_._2).map(_._1)
  }

  /** The testdata tables a query reads: primarily by path regex over
    * the returned plan's formatted explain; when the returned plan has
    * no file scan (streaming memory-table readouts, post-loop
    * LogicalRDD tails), fall back to the REGISTRATION-source evidence —
    * the [[graft.Tables]] loader calls recorded while the registration
    * ran (VERDICT r13 item 6: those queries used to yield None and kept
    * the weakest legacy ratio100 bound). A registration that throws is
    * logged loudly per query instead of silently classified (ADVICE
    * r13) — by this point the sweep has already executed every query
    * 3×(1+warm) times, so a throw here is a real defect, but the
    * recorded loads are still better evidence than null.
    */
  private def scannedTables(spark: SparkSession, name: String,
                            sfDir: String): Option[Set[String]] = {
    val rec = scala.collection.mutable.Set[String]()
    graft.Tables.recording.set(rec)
    try {
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      val tables = "testdata/sf[0-9.]+/([a-z_]+)\\.parquet".r
        .findAllMatchIn(plan).map(_.group(1)).toSet
      // plan scan wins (actual executed-scan evidence); otherwise the
      // recorded registration loads — INCLUDING the empty set, which
      // for a completed registration is the honest statement "this op
      // reads no testdata table at all" (mock REST sources, literal
      // sinks): zero real decades of input growth, gated at the tight
      // single-decade bound rather than the legacy null/100 one
      if (tables.nonEmpty) Some(tables)
      else Some(rec.toSet)
    } catch {
      case scala.util.control.NonFatal(e) =>
        System.err.println(s"[scaling] $name: registration threw " +
          s"${e.getClass.getName}: ${e.getMessage}")
        if (rec.nonEmpty) Some(rec.toSet) else None
    } finally {
      graft.Tables.recording.remove()
      // each construction can leave operator-internal persist marks
      // (ADVICE r14) — clear so derivations stay per-query independent
      spark.catalog.clearCache()
    }
  }

  /** Row count per (table, sfDir) from the parquet footers. A missing
    * SF dir is a hard error (every honest-decade gate depends on these
    * counts), not an NPE. */
  private def tableCounts(spark: SparkSession)
      : Map[(String, String), Long] =
    (for {
      dir <- SfDirs
      f <- Option(new java.io.File(dir).listFiles()).getOrElse(
        sys.error(s"testdata dir missing or unreadable: $dir")).toSeq
      if f.getName.endsWith(".parquet")
    } yield {
      val t = f.getName.stripSuffix(".parquet")
      (t, dir) -> spark.read.parquet(f.getPath).count()
    }).toMap

  /** 2 / 1 / 0 honest decades for a table set, from measured counts:
    * a step is honest when at least one scanned table grows ≥2× over
    * it (the input that drives the work actually grew).
    */
  private def honestDecades(tables: Set[String],
                            counts: Map[(String, String), Long]): Int = {
    def grows(from: String, to: String): Boolean =
      tables.exists { t =>
        val a = counts.getOrElse((t, from), 0L)
        val b = counts.getOrElse((t, to), 0L)
        a > 0 && b >= 2 * a
      }
    val step1 = grows(SfDirs(0), SfDirs(1))
    val step2 = grows(SfDirs(1), SfDirs(2))
    (if (step1) 1 else 0) + (if (step2) 1 else 0)
  }

  def main(args: Array[String]): Unit = {
    val marginBar = args.headOption.map(_.toDouble).getOrElse(1.5)
    val heavy = warmAbove(marginBar)
    val all = graft.SparkEntry.queries.keys.toSeq.sorted
    val sub = all.filterNot(heavy.toSet)
    println(s"measuring ${heavy.size} gated (> $marginBar s warm) + " +
      s"${sub.size} sub-bar queries at sf0.001 / sf0.01 / sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir", "/root/repo/target/spark-warehouse")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def once(name: String, sfDir: String): Double = {
      val t0 = System.nanoTime()
      // noop-sink materialization, mirroring graft.Bench's timed action
      // (count() lets the optimizer eliminate enrichment joins and
      // unreferenced projections — the Bench.scala round-15 note), so
      // the sweep's ratios measure the operator's actual work
      graft.SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      dt
    }
    // warm = MIN over `warmPasses` timed passes after one cold pass
    def measure(names: Seq[String], sfDir: String,
                warmPasses: Int): Map[String, Double] =
      names.map { n =>
        once(n, sfDir) // cold: classload/codegen/page-cache amortization
        n -> (1 to warmPasses).map(_ => once(n, sfDir)).min
      }.toMap

    def sweep(names: Seq[String], warmPasses: Int)
        : Map[String, Seq[Double]] = {
      val bySf = SfDirs.map(d => measure(names, d, warmPasses))
      names.map(n => n -> bySf.map(_(n))).toMap
    }

    val heavyTimes = sweep(heavy, warmPasses = 2)
    val subTimes = sweep(sub, warmPasses = 1)

    println("deriving scanned tables + honest decades")
    val counts = tableCounts(spark)
    val tablesOf: Map[String, Option[Set[String]]] =
      all.map(n => n -> scannedTables(spark, n, SfDirs(0))).toMap

    def rows(times: Map[String, Seq[Double]]) =
      times.toSeq.map { case (n, Seq(s, a, b)) =>
        val r10 = b / a
        val r100 = b / s
        (n, s, a, b, r10, math.log10(r10), r100, math.log10(r100) / 2.0)
      }.sortBy(-_._5)

    def entryJson(r: (String, Double, Double, Double, Double, Double,
                      Double, Double)): String = {
      val (n, s, a, b, r10, e10, r100, e100) = r
      val (tablesField, honestField) = tablesOf(n) match {
        case Some(ts) =>
          (ts.toSeq.sorted.map(t => s""""$t"""").mkString("[", ",", "]"),
            honestDecades(ts, counts).toString)
        case None => ("[]", "null")
      }
      f"""{"query":"$n","t0001":$s%.4f,"t001":$a%.4f,"t01":$b%.4f,""" +
        f""""ratio":$r10%.3f,"exponent":$e10%.3f,""" +
        f""""ratio100":$r100%.3f,"exponent100":$e100%.3f,""" +
        s""""tables":$tablesField,"honest_decades":$honestField}"""
    }

    def writeFile(path: String, rs: Seq[(String, Double, Double, Double,
        Double, Double, Double, Double)], warmPasses: Int): Unit = {
      val json = rs.map(entryJson).mkString(
        """{"data_ratio":10.0,"data_ratio_100":100.0,"margin_bar_sec":""" +
          f"$marginBar%.1f" + s""","warm_passes":$warmPasses,"entries":[""",
        ",", "]}")
      Files.writeString(Paths.get(path), json + "\n")
      println(s"wrote $path (${rs.size} queries)")
    }

    val heavyRows = rows(heavyTimes)
    println("| query | t(sf0.001) s | t(sf0.01) s | t(sf0.1) s | " +
      "ratio 10x | exp | ratio 100x | exp |")
    println("|---|---|---|---|---|---|---|---|")
    heavyRows.foreach { case (n, s, a, b, r, e, r2, e2) =>
      println(f"| `$n` | $s%.2f | $a%.2f | $b%.2f | $r%.1fx | $e%.2f " +
        f"| $r2%.1fx | $e2%.2f |")
    }
    writeFile("/root/repo/SCALING.json", heavyRows, warmPasses = 2)
    writeFile("/root/repo/SCALING_SUB.json", rows(subTimes),
      warmPasses = 1)
    spark.stop()
  }
}
