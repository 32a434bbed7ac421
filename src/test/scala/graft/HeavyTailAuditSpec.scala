package graft

import org.scalatest.funsuite.AnyFunSuite

import java.io.File

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
  * Reads the newest `BENCH_r*_local.json` (the isolated builder run;
  * falls back to the newest driver `BENCH_r*.json` if no local snapshot
  * exists) and parses `queries_warm` — warm is the criterion because
  * cold times carry first-touch/JIT noise the cold-anomaly comparator
  * already flags separately.
  */
class HeavyTailAuditSpec extends AnyFunSuite {

  private val barSec = 3.0

  private def latestBench(): Option[File] = {
    val repo = new File("/root/repo")
    val all = repo.listFiles((_: File, n: String) =>
      n.matches("BENCH_r\\d+(_local)?\\.json")).toSeq
    if (all.isEmpty) None
    else {
      def round(f: File): Int =
        "\\d+".r.findFirstIn(f.getName).get.toInt
      // prefer the isolated _local snapshot at the same round
      val maxRound = all.map(round).max
      val atMax = all.filter(round(_) == maxRound)
      Some(atMax.find(_.getName.contains("_local")).getOrElse(atMax.head))
    }
  }

  test(s"every query > $barSec s warm in the latest bench is plan-audited") {
    val f = latestBench().getOrElse(
      fail("no BENCH_r*.json snapshot in /root/repo"))
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = mapper.readTree(f)
    val warm = Option(root.get("queries_warm")).getOrElse(
      root.get("queries")) // very old snapshots had no warm pass
    val heavy = scala.collection.mutable.ArrayBuffer[(String, Double)]()
    warm.fields().forEachRemaining { e =>
      val t = e.getValue.asDouble()
      if (t > barSec) heavy += ((e.getKey, t))
    }
    assert(heavy.nonEmpty,
      s"${f.getName}: zero >$barSec s queries — either the bench " +
      "snapshot is truncated or the bar needs lowering; inspect")
    val unaudited = heavy.filterNot { case (q, _) =>
      graft.tools.Plans.auditedNames.contains(q) }
    assert(unaudited.isEmpty,
      s"${f.getName}: heavy-tail queries with NO plan audit " +
      s"(add to tools.Plans + PlanFingerprintSpec): " +
      unaudited.sortBy(-_._2).map { case (q, t) =>
        f"$q (${t}%.1f s)" }.mkString(", "))
  }
}
