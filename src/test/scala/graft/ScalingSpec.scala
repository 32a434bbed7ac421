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
  * and t(0.1)/t(0.001) bounded by the data that ACTUALLY grew — the
  * round-12 verdict's honest-decade point: documents/embeddings do not
  * grow across the first decade, so a text op's "100×" column is really
  * one 10× step and is gated at 10, not 100. Each entry's
  * `honest_decades` (derived by the harness from per-table row counts)
  * picks the bound. Since round 14 the derivation falls back from the
  * returned plan's file scans to the REGISTRATION-time loader record
  * ([[graft.Tables.recording]]), so streaming readouts and post-loop
  * LogicalRDD tails carry real values too; `null` now only means the
  * registration THREW during derivation and is spec-gated to zero
  * below (it would keep the legacy 100 bound here).
  * A quadratic stage would show ratio → 100 (10⁴ over the long decade);
  * shuffle-volume blowups show well above the bar long before that.
  * Ratios BELOW 1 happen when fixed overhead dominates at both SFs —
  * fine, the gates are one-sided.
  *
  * Coverage is gated twice:
  *  - the measured GATED set must contain every query above
  *    `coverageBarSec` warm in the newest isolated bench snapshot
  *    (round-11 item 3 — a future heavy op cannot ship unmeasured; the
  *    harness sweeps above a LOWER 1.5 s margin bar so warm drift
  *    cannot turn this red);
  *  - SCALING.json ∪ SCALING_SUB.json must equal the full registry
  *    (round-12 item 2 — sub-bar ops get a standing 3-SF profile too,
  *    so NO op ships measurement-free). The sub file's ratios are NOT
  *    gated: sub-second queries are scheduler-noise-dominated and a
  *    ratio gate there would fire on noise, not plans.
  *
  * Both files are committed artifacts (all SFs measured in ONE JVM,
  * minutes apart, so the ratios are host-load-robust); this spec fails
  * loudly when either is missing so the measurement cannot silently
  * rot.
  */
class ScalingSpec extends AnyFunSuite {

  private val maxRatio10 = 10.0
  private val maxRatio100 = 100.0
  private val coverageBarSec = 2.0

  private def load(path: String, hint: String) = {
    val f = new File(path)
    assert(f.exists(),
      s"$path missing — run `sbt \"runMain graft.tools.Scaling\"` " +
      s"and commit the result ($hint)")
    new com.fasterxml.jackson.databind.ObjectMapper().readTree(f)
  }
  private lazy val root = load("/root/repo/SCALING.json", "gated tier")
  private lazy val subRoot =
    load("/root/repo/SCALING_SUB.json", "sub-bar tier")

  private def entriesOf(r: com.fasterxml.jackson.databind.JsonNode) = {
    val e = r.get("entries")
    assert(e != null && e.isArray, "entries array missing")
    (0 until e.size()).map(e.get)
  }
  private def entries = {
    val e = entriesOf(root)
    assert(e.size >= 10, "SCALING.json has fewer than 10 measured queries")
    e
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

  test("every measured heavy query's long-decade ratio stays under its " +
       "HONEST data growth (ratio100 ≤ 100 for two-decade inputs, ≤ 10 " +
       "when only one decade actually grew)") {
    assert(root.get("data_ratio_100").asDouble() === 100.0,
      "SCALING.json predates the two-decade measurement — regenerate")
    val bad = entries.flatMap { e =>
      val r = e.get("ratio100").asDouble()
      val hd = e.get("honest_decades")
      assert(hd != null,
        s"${e.get("query").asText()} lacks honest_decades — regenerate " +
        "SCALING.json with the round-13 harness")
      val bound =
        if (hd.isNull) maxRatio100 // unknown inputs: keep the legacy bound
        else if (hd.asInt() >= 2) maxRatio100
        else maxRatio10 // one (or zero) real decades of growth
      if (r > bound)
        Some(f"${e.get("query").asText()} (ratio100 $r%.1f > bound " +
          f"$bound%.0f, honest_decades=$hd)")
      else None
    }
    assert(bad.isEmpty,
      "queries scaling worse than their honest data growth: " +
      bad.mkString(", "))
  }

  test(s"the gated set covers every > $coverageBarSec s warm query " +
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

  test("SCALING.json ∪ SCALING_SUB.json covers the FULL registry — no " +
       "op ships without a standing 3-SF profile (round-12 item 2)") {
    val gated = entries.map(_.get("query").asText()).toSet
    val sub = entriesOf(subRoot).map(_.get("query").asText()).toSet
    val overlap = gated.intersect(sub)
    assert(overlap.isEmpty,
      s"queries measured in BOTH tiers (stale file?): ${overlap.toSeq.sorted}")
    val registry = SparkEntry.queries.keySet
    val unmeasured = registry.diff(gated ++ sub)
    assert(unmeasured.isEmpty,
      "registered queries with no scaling profile — rerun the harness: " +
      unmeasured.toSeq.sorted.mkString(", "))
    val stale = (gated ++ sub).diff(registry)
    assert(stale.isEmpty,
      s"measured queries no longer registered (stale artifact): " +
      stale.toSeq.sorted.mkString(", "))
  }

  test("every entry in BOTH tiers carries a DERIVED honest_decades — " +
       "null (registration threw during derivation) gated to zero " +
       "(round-14, VERDICT r13 item 6)") {
    val nulls = (entries ++ entriesOf(subRoot)).filter { e =>
      val hd = e.get("honest_decades")
      hd == null || hd.isNull
    }.map(_.get("query").asText())
    assert(nulls.isEmpty,
      "entries with null honest_decades — the registration-source " +
      "recorder should cover every query since round 14; a null means " +
      "the registration THREW in the sweep's derivation pass: " +
      nulls.sorted.mkString(", "))
  }
}
