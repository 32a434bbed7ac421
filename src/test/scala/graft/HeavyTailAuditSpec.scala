package graft

import org.scalatest.funsuite.AnyFunSuite

/** The plan-audit criterion as a GATE, not a round-boundary promise:
  * every query above 3 s warm in the LATEST committed bench snapshot
  * must appear in [[graft.tools.Plans.auditedNames]] (i.e. have a
  * PLANS.md entry — batch formatted-explain or captured micro-batch
  * plan — and, transitively, a fingerprint row). Round 8 closed this
  * criterion against round 8's *list* and round 9's bench quietly grew
  * four unaudited >3 s queries; diffing the bench file itself means the
  * criterion cannot drift again — a future heavy query lands RED until
  * someone audits it (or speeds it up below the bar).
  *
  * Reads the newest snapshot file ON DISK (committed or not — the
  * builder produces the isolated snapshot and gates against it before
  * committing both together) that actually CONTAINS a parsed
  * `queries_warm` map, via [[graft.tools.BenchFiles.latestWarm]]. The
  * driver's own `BENCH_rN.json` is a wrapper with a truncated `tail`
  * and no warm map; round 10's gate assumed every max-round file was
  * parseable and NPE'd on it — the shared helper skips wrappers and
  * fails with a message naming them when no snapshot qualifies. Warm
  * is the criterion because cold times carry first-touch/JIT noise the
  * cold-anomaly comparator already flags separately.
  */
class HeavyTailAuditSpec extends AnyFunSuite {

  private val barSec = 3.0

  test(s"every query > $barSec s warm in the latest bench is plan-audited") {
    val (fname, warm) = graft.tools.BenchFiles.latestWarm()
    assert(warm.exists(_._2 > barSec),
      s"$fname: zero >$barSec s queries — either the bench " +
      "snapshot is truncated or the bar needs lowering; inspect")
    val unaudited = graft.tools.BenchFiles.unauditedHeavy(
      warm, barSec, graft.tools.Plans.auditedNames)
    assert(unaudited.isEmpty,
      s"$fname: heavy-tail queries with NO plan audit " +
      s"(add to tools.Plans + PlanFingerprintSpec): " +
      unaudited.map { case (q, t) => f"$q (${t}%.1f s)" }.mkString(", "))
  }

  test("the gate red-flags an unaudited heavy query via the real path") {
    // Drive the actual bar-filter + audited-subset function (not just
    // set membership — ADVICE r12) with a synthetic warm map covering
    // all three classes: audited-heavy passes, unaudited-light passes,
    // unaudited-heavy is flagged (and ordered worst-first).
    val auditedName = graft.tools.Plans.auditedNames.headOption.getOrElse(
      fail("auditedNames is empty — the audit registry itself is broken"))
    val warm = Map(
      auditedName -> 9.9,                      // heavy but audited → OK
      "zz_light_unaudited" -> (barSec - 0.1),  // unaudited but light → OK
      "zz_heavy_unaudited" -> (barSec + 1.0),  // the case that must bite
      "zz_heavier_unaudited" -> (barSec + 5.0))
    val flagged = graft.tools.BenchFiles.unauditedHeavy(
      warm, barSec, graft.tools.Plans.auditedNames)
    assert(flagged ==
      Seq("zz_heavier_unaudited" -> (barSec + 5.0),
          "zz_heavy_unaudited" -> (barSec + 1.0)),
      s"gate decision function returned $flagged")
  }

  test("a corrupted _local snapshot fails loudly instead of silently " +
       "demoting the gate to an older round (ADVICE r12)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-benchfiles")
    java.nio.file.Files.writeString(dir.resolve("BENCH_r01_local.json"),
      """{"queries_warm":{"q":1.0}}""")
    java.nio.file.Files.writeString(dir.resolve("BENCH_r02_local.json"),
      """{"queries_warm": TRUNCATED GARBAGE""")
    val e = intercept[IllegalStateException] {
      graft.tools.BenchFiles.latestWarm(dir.toString)
    }
    assert(e.getMessage.contains("BENCH_r02_local.json"))
    // a parseable _local WITHOUT a warm map is equally a red flag
    java.nio.file.Files.writeString(dir.resolve("BENCH_r02_local.json"),
      """{"n": 2, "tail": "wrapper-shaped"}""")
    val e2 = intercept[IllegalStateException] {
      graft.tools.BenchFiles.latestWarm(dir.toString)
    }
    assert(e2.getMessage.contains("no queries_warm"))
    // driver wrapper files stay skippable: same content, non-_local name
    java.nio.file.Files.delete(dir.resolve("BENCH_r02_local.json"))
    java.nio.file.Files.writeString(dir.resolve("BENCH_r02.json"),
      """{"n": 2, "tail": "wrapper-shaped"}""")
    val (fname, warm) = graft.tools.BenchFiles.latestWarm(dir.toString)
    assert(fname == "BENCH_r01_local.json" && warm == Map("q" -> 1.0))
  }
}
