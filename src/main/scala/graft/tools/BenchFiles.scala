package graft.tools

import com.fasterxml.jackson.databind.ObjectMapper

import java.io.File

/** Selects the newest bench snapshot ON DISK that actually contains a
  * parsed per-query warm map — shared by the HeavyTailAuditSpec gate
  * and the Scaling harness.
  *
  * Why the existence check: the driver's per-round `BENCH_rN.json` is a
  * wrapper `{n, rc, cpus, sf, tail, parsed: null}` whose `tail` is a
  * TRUNCATED suffix of the real JSON line — unparseable by design.
  * Round 10 shipped no isolated `_local` snapshot, so the gate (which
  * assumed every max-round file had `queries_warm`) selected the
  * wrapper and NPE'd, turning the suite red (round-10 verdict, What's
  * wrong #1). Selection here: highest round first, `_local` (the
  * isolated builder run) preferred within a round, SKIPPING any file
  * without a `queries_warm` (or legacy `queries`) object, and failing
  * with a message naming what was skipped when none qualifies.
  *
  * Note this reads the newest qualifying snapshot file on disk —
  * committed or not. An uncommitted snapshot steering the gate is
  * intentional: the builder produces the isolated snapshot and runs the
  * gate against it BEFORE committing both together (advice round 10).
  */
object BenchFiles {

  /** (filename, warm-query map) of the newest parseable snapshot.
    * `dir` is overridable so the corrupt-snapshot failure path is unit
    * testable against a scratch directory.
    */
  def latestWarm(dir: String = "/root/repo"): (String, Map[String, Double]) = {
    val repo = new File(dir)
    val all = Option(repo.listFiles((_: File, n: String) =>
      n.matches("BENCH_r\\d+(_local)?\\.json"))).map(_.toSeq).getOrElse(Seq.empty)
    require(all.nonEmpty, s"no BENCH_r*.json snapshot in $dir")
    def round(f: File): Int = "\\d+".r.findFirstIn(f.getName).get.toInt
    // highest round first; _local preferred within a round
    val ordered = all.sortBy(f => (-round(f), if (f.getName.contains("_local")) 0 else 1))
    val mapper = new ObjectMapper()
    val parsed = ordered.iterator.map { f =>
      val warm =
        try {
          val root = mapper.readTree(f)
          Option(root.get("queries_warm"))
            .orElse(Option(root.get("queries"))) // pre-warm-pass snapshots
            .filter(_.isObject)
        } catch {
          case e: Exception if f.getName.contains("_local") =>
            // A corrupted isolated snapshot must NOT silently demote the
            // heavy-tail gate to an older round's data (ADVICE r12):
            // _local files are this repo's own artifacts — fail loudly.
            throw new IllegalStateException(
              s"isolated snapshot ${f.getName} exists but fails to parse" +
              " — regenerate it rather than gating against stale data", e)
          case _: Exception => None // driver wrapper files: skippable
        }
      if (warm.isEmpty && f.getName.contains("_local"))
        throw new IllegalStateException(
          s"isolated snapshot ${f.getName} parses but has no " +
          "queries_warm/queries object — regenerate it rather than " +
          "gating against stale data")
      f.getName -> warm
    }
    val found = parsed.collectFirst { case (name, Some(node)) =>
      val buf = scala.collection.mutable.Map[String, Double]()
      node.fields().forEachRemaining(e => buf += (e.getKey -> e.getValue.asDouble()))
      (name, buf.toMap)
    }
    found.getOrElse(throw new IllegalStateException(
      "no bench snapshot with a parsed queries_warm/queries object " +
      s"among ${ordered.map(_.getName).mkString(", ")} — run " +
      "`sbt \"runMain graft.Bench\"` to produce an isolated BENCH_rN_local.json"))
  }

  /** The heavy-tail gate's decision function, extracted so the spec can
    * drive the REAL bar-filter + audited-subset path with a synthetic
    * warm map (ADVICE r12 — the previous \"gate bites\" test only
    * checked set membership of a made-up name). Returns the queries
    * above `barSec` warm that are absent from `audited`, worst first.
    */
  def unauditedHeavy(warm: Map[String, Double], barSec: Double,
                     audited: Set[String]): Seq[(String, Double)] =
    warm.toSeq.filter(_._2 > barSec)
      .filterNot { case (q, _) => audited.contains(q) }
      .sortBy(-_._2)
}
