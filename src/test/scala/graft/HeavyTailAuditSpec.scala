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
    val heavy = warm.toSeq.filter(_._2 > barSec)
    assert(heavy.nonEmpty,
      s"$fname: zero >$barSec s queries — either the bench " +
      "snapshot is truncated or the bar needs lowering; inspect")
    val unaudited = heavy.filterNot { case (q, _) =>
      graft.tools.Plans.auditedNames.contains(q) }
    assert(unaudited.isEmpty,
      s"$fname: heavy-tail queries with NO plan audit " +
      s"(add to tools.Plans + PlanFingerprintSpec): " +
      unaudited.sortBy(-_._2).map { case (q, t) =>
        f"$q (${t}%.1f s)" }.mkString(", "))
  }

  test("the gate still red-flags a hypothetical unaudited heavy query") {
    // the verdict's done-criterion: prove the subset assertion bites
    val fake = Seq(("zz_unaudited_hypothetical", 9.9))
    val unaudited = fake.filterNot { case (q, _) =>
      graft.tools.Plans.auditedNames.contains(q) }
    assert(unaudited.nonEmpty)
  }
}
