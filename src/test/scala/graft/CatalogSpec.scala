package graft

import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.{Files, Paths}

/** CATALOG.md generator — the registry-derived cross-check table the
  * round-9 verdict asked for (stretch item 8): OPERATORS.md stays the
  * hand-written narrative catalog (gate-checked by ContractSpec), and
  * CATALOG.md is EMITTED from `SparkEntry.queries` plus the other
  * machine-readable registries, so per-query coverage facts (oracle
  * kind, plan audit, fingerprint, narrative entry) can never lag the
  * registry even transiently — [[CatalogSpec]] fails when the committed
  * file differs from a fresh render.
  *
  * Regenerate with: sbt "Test/runMain graft.CatalogGen"
  */
object CatalogGen {

  def render(): String = {
    val queries = SparkEntry.queries.keySet
    val oracles = SparkEntry.oracleSql.keySet
    val audited = graft.tools.Plans.auditedNames
    val fps = PlanFingerprintSpec.fingerprintedNames
    val narrative = "`([a-z0-9_]+)`".r
      .findAllMatchIn(new String(
        Files.readAllBytes(Paths.get("OPERATORS.md")), "UTF-8"))
      .map(_.group(1)).toSet

    val sb = new StringBuilder
    sb ++= "# CATALOG — registry-derived coverage table (GENERATED)\n\n"
    sb ++= "Generated from `SparkEntry.queries` / `SparkEntry.oracleSql` /\n"
    sb ++= "`tools.Plans.auditedNames` / `PlanFingerprintSpec` goldens by\n"
    sb ++= "`sbt \"Test/runMain graft.CatalogGen\"`. Do not edit by hand —\n"
    sb ++= "CatalogSpec fails when this file is stale.\n\n"
    sb ++= s"- registered queries: ${queries.size}\n"
    sb ++= s"- with DuckDB oracle SQL: ${(queries & oracles).size}" +
      s" (rows-only checks: ${(queries -- oracles).size})\n"
    sb ++= s"- plan-audited in PLANS.md: ${(queries & audited).size}\n"
    sb ++= s"- golden plan fingerprints: ${(queries & fps).size}\n\n"
    sb ++= "| query | oracle | plan audit | fingerprint | OPERATORS.md |\n"
    sb ++= "|---|---|---|---|---|\n"
    queries.toSeq.sorted.foreach { q =>
      def yn(b: Boolean) = if (b) "yes" else ""
      sb ++= s"| `$q` | ${if (oracles(q)) "sql" else "rows-only"} " +
        s"| ${yn(audited(q))} | ${yn(fps(q))} | ${yn(narrative(q))} |\n"
    }
    sb.toString
  }

  def main(args: Array[String]): Unit = {
    Files.write(Paths.get("CATALOG.md"),
      render().getBytes("UTF-8"))
    println(s"wrote CATALOG.md (${SparkEntry.queries.size} queries)")
  }
}

class CatalogSpec extends AnyFunSuite {

  test("CATALOG.md matches a fresh render of the registry (regenerate " +
       "with sbt \"Test/runMain graft.CatalogGen\")") {
    val committed = new String(
      Files.readAllBytes(Paths.get("CATALOG.md")), "UTF-8")
    assert(committed == CatalogGen.render(),
      "CATALOG.md is stale — the registry changed since it was emitted")
  }

  test("audit/fingerprint registries reference only registered queries " +
       "(a rename must not leave a stale golden behind)") {
    val queries = SparkEntry.queries.keySet
    val staleAudit = graft.tools.Plans.auditedNames.diff(queries)
    assert(staleAudit.isEmpty, s"audited but unregistered: $staleAudit")
    val staleFp = PlanFingerprintSpec.fingerprintedNames.diff(queries)
    assert(staleFp.isEmpty, s"fingerprinted but unregistered: $staleFp")
  }
}
