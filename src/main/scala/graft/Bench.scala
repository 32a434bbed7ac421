package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // pin managed-table location inside the repo regardless of cwd
      .config("spark.sql.warehouse.dir", "/root/repo/target/spark-warehouse")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // local iteration aid, mirrors Verify: SPARK_GRAFT_ONLY=q1,q2
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    val selected = only.fold(SparkEntry.queries)(
      names => SparkEntry.queries.filter { case (n, _) => names(n) })
    // Timed action (round 15): full-column materialization into the
    // no-op sink, NOT count(). Spark 4's optimizer eliminates an
    // unreferenced left join whose right keys are distinct (and prunes
    // unreferenced projections to the scan), so `.count()` silently
    // SKIPS the load-bearing work of enrichment-shaped ops — measured
    // at sf0.1: web_pipeline_near counts in 0.6 s but takes 4.3 s to
    // materialize (the near-verify arms never ran under count), and
    // web_pipeline's cleaning folds prune to a bare scan. The noop
    // write consumes every output row and column, so the timed window
    // covers the operator's actual work while writing nothing.
    // SPARK_GRAFT_BENCH_ACTION=count restores the legacy action for
    // same-HEAD A/B comparisons against pre-r15 snapshots.
    val legacyCount = sys.env.get("SPARK_GRAFT_BENCH_ACTION").contains("count")
    def once(): (Map[String, Double], List[String]) = {
      var failed = List.empty[String]
      val times = selected.map { case (name, fn) =>
        val t0 = System.nanoTime()
        try {
          val df = fn(spark, sfDir)
          if (legacyCount) df.count()
          else df.write.format("noop").mode("overwrite").save()
        }
        catch { case _: Throwable => failed ::= name }
        val dt = (System.nanoTime() - t0) / 1e9
        // operator-internal persists (shingle sets, signatures, k-means
        // corpus) are scoped to one query — drop them so queries time
        // independently instead of competing for the storage pool
        spark.catalog.clearCache()
        name -> dt
      }
      (times, failed.reverse)
    }
    // pass 1 = cold (the headline, methodology-compatible with earlier
    // rounds); passes 2..REPS = warm (JVM/codegen/page-cache amortized).
    // queries_warm reports the per-query MIN over the warm passes:
    // single-run deltas at sf0.1 sit inside ±30% host-load noise, so a
    // per-query minimum is what makes cross-round comparisons
    // code-attributable rather than load-attributable.
    val reps = math.max(2,
      sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt)
    val (cold, coldFailed) = once()
    val warmRuns = (2 to reps).map(_ => once())
    val warm: Map[String, Double] =
      warmRuns.map(_._1).reduce((a, b) => a.map { case (k, v) => k -> math.min(v, b(k)) })
    val warmFailed = warmRuns.flatMap(_._2).distinct.toList
    def fmt(m: Map[String, Double]) =
      m.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    def arr(xs: List[String]) = xs.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = cold.values.sum
    // variance auto-flag: compare this run's warm times against the
    // previous target/bench.json (same box, usually same code). A ≥2×
    // move on a ≥0.5 s query is exactly the class of anomaly that cost a
    // round-7 judge cycle (containment_pairs' unexplained 2× spread) —
    // surface it in the output instead of waiting for a human diff.
    // Parsing is a line-local regex over our own single-line format;
    // only runs comparing against the same SF dir.
    val action = if (legacyCount) "count" else "noop_write"
    val prevWarm: Map[String, Double] =
      try {
        val prev = Files.readString(Paths.get("/root/repo/target/bench.json"))
        // a previous file without an "action" field is a pre-r15 count
        // run — cross-action comparison would flag the methodology
        // change itself, so only compare same-action snapshots
        val prevAction =
          "\"action\":\"([a-z_]+)\"".r.findFirstMatchIn(prev)
            .map(_.group(1)).getOrElse("count")
        if (!prev.contains("\"sf\":\"" + sfDir + "\"") ||
            prevAction != action) Map.empty
        else {
          val body = prev.split("\"queries_warm\":\\{", 2)(1).split("\\}", 2)(0)
          "\"([a-z0-9_]+)\":([0-9.Ee+-]+)".r.findAllMatchIn(body)
            .map(m => m.group(1) -> m.group(2).toDouble).toMap
        }
      } catch { case _: Throwable => Map.empty }
    val flagged = warm.flatMap { case (k, v) =>
      prevWarm.get(k).collect {
        case p if math.max(p, v) >= 0.5 && math.min(p, v) > 0 &&
                  math.max(p, v) / math.min(p, v) >= 2.0 =>
          k -> (v / p)
      }
    }
    if (flagged.nonEmpty)
      System.err.println("[bench] variance flags (warm vs previous run, " +
        "ratio this/prev): " + flagged.map { case (k, r) =>
          f"$k=${r}%.2fx" }.mkString(", "))
    // cold-anomaly flag: a cold time ≥10× the query's OWN warm minimum on
    // a ≥2 s cold query is either first-touch codegen/classload or in-sweep
    // host interference — round 8 had three such spikes (rendezvous_hash
    // 37.6 s cold / 1.1 s warm) that the warm-only comparator never saw.
    // Surfacing the ratio makes each one attributable instead of silent.
    val flaggedCold = cold.flatMap { case (k, c) =>
      warm.get(k).collect {
        case w if c >= 2.0 && w > 0 && c / w >= 10.0 => k -> (c / w)
      }
    }
    if (flaggedCold.nonEmpty)
      System.err.println("[bench] cold-anomaly flags (cold/warm ratio): " +
        flaggedCold.map { case (k, r) => f"$k=${r}%.1fx" }.mkString(", "))
    val json =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":${fmt(cold)},""" +
      s""""total_warm":${warm.values.sum},"queries_warm":${fmt(warm)},""" +
      s""""warm_passes":${reps - 1},"action":"$action",""" +
      s""""variance_flags":${fmt(flagged)},""" +
      s""""variance_flags_cold":${fmt(flaggedCold)},""" +
      s""""failed":${arr(coldFailed)},"failed_warm":${arr(warmFailed)},"sf":"$sfDir"}"""
    println(json)
    // stdout of a 260-query run has been truncated by capture layers
    // before (round 6 lost 197 of 262 per-query numbers) — the file copy
    // is the durable, machine-readable record the next round diffs
    Files.createDirectories(Paths.get("/root/repo/target"))
    Files.writeString(Paths.get("/root/repo/target/bench.json"), json + "\n")
    spark.stop()
  }
}
