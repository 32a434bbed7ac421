package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.BooleanType
import org.scalatest.funsuite.AnyFunSuite

/** Structural guard against the "correctly empty" oracle blind spot.
  *
  * The driver's oracle compares Spark vs DuckDB output hashes — but an
  * empty result hash-matches an empty oracle, so a query whose predicate
  * degenerated to FALSE (or whose flag column became structurally
  * constant) passes every gate while verifying nothing. That class bit
  * three rounds running (TPC-H Q7/Q11 degenerate date predicates, the
  * bpe_train state destruction, gopher_repetition's structurally-zero
  * dup columns) and each time was caught by a HAND-run row-count audit.
  * This spec is the structural replacement for the hand audit:
  *
  *  1. every registered query must return rows at sf0.001, unless it is
  *     on the [[emptyOk]] allowlist with a written justification;
  *  2. every BooleanType column in a multi-row result must be
  *     non-constant (a flag that never fires — or always fires — flags
  *     nothing), unless on [[constantFlagOk]] with a justification;
  *  3. curated filter-shaped ops must actually filter: output strictly
  *     smaller than the input they subset ([[strictSubsetOf]]).
  *
  * sf0.001 keeps the sweep cheap; the driver's oracle still runs at
  * sf0.01, so this spec only needs to prove non-degeneracy, not
  * correctness.
  */
class DegeneracySpec extends AnyFunSuite {

  private val dir = "/root/testdata/sf0.001"

  /** Queries allowed to return zero rows at sf0.001 — each with the
    * reason the emptiness is semantic rather than degenerate. Keep this
    * list SHORT: every entry here is a query the oracle gate cannot
    * distinguish from a broken one.
    */
  private val emptyOk: Map[String, String] = Map(
    // (filled per observed sf0.001 behavior; target: empty)
  )

  /** (query, column) pairs whose boolean column is legitimately constant
    * in a multi-row sf0.001 result.
    */
  private val constantFlagOk: Map[(String, String), String] = Map(
    ("dq_report", "passed") ->
      ("the registered feed is clean by construction, so every check " +
       "passes; the failing side of the contract is exercised by its own " +
       "registered queries (dq_quarantine, dq_rules, pipeline_run_failed) " +
       "and by QualityPipelineSpec's failing-contract case"),
    ("mad_outliers_approx", "med_in_bound") ->
      ("the column IS the verification contract — approx median within " +
       "the rank-error window of the exact one; all-true is the asserted " +
       "invariant, and its spec drives the epsilon bound directly"),
    ("mad_outliers_approx", "mad_in_bound") ->
      ("same contract column as med_in_bound: all-true is the invariant"),
    ("bloom_semi_join", "is_match") ->
      ("false rows are bloom FALSE POSITIVES; at m=16384 bits over ~25 " +
       "build keys the FP probability is ~(25*3/16384)^3 ≈ 1e-7, so none " +
       "appear at sf0.001. Wave3Spec drives a saturated 512-bit filter " +
       "where pruning occurs and asserts the flag equals ground truth")
  )

  /** Numeric-activity gates: the round-8 gopher bite was a NUMERIC
    * column that was structurally zero (the dup-gram fractions), which
    * neither the non-empty check nor the boolean-flag check can see.
    * For curated signal columns, assert the given aggregate expression
    * is strictly positive at sf0.001 — a dedup/repetition metric whose
    * corpus-wide total is zero measures nothing.
    */
  private val positiveAgg: Map[String, String] = Map(
    // the ExactSubstr family must actually find duplicated material
    "exactsubstr_dedup" -> "sum(n_removed)",
    "exactsubstr_report" -> "sum(n_dup_windows)",
    "cdc_chunk_dedup" -> "sum(n_dup_chunks)",
    "paragraph_dedup" -> "sum(n_chunks - n_kept)",
    // the round-8 bite itself: the dup/top n-gram fractions
    "gopher_repetition" ->
      "sum(top2_frac + dup5_frac + dup10_frac)",
    // near-dup verdicts must fire beyond the planted exact twins
    "curation_pipeline" ->
      "sum(CASE WHEN status = 'near_dup' THEN 1 ELSE 0 END)",
    // the events-payload front door must exercise BOTH dedup stages:
    // exact dups (repeated (type,k,bucket) renderings) and near dups
    // (same (type,k), different bucket)
    "curation_pipeline_events" ->
      ("sum(CASE WHEN status = 'near_dup' THEN 1 ELSE 0 END) * " +
       "sum(CASE WHEN status = 'exact_dup' THEN 1 ELSE 0 END)")
  )

  /** Filter-shaped ops: output must be a STRICT subset of the named
    * input rowcount — proof the filter predicate is live at sf0.001.
    * Only ops whose output-rows ⊆ input-rows semantics were verified by
    * reading the registration are listed.
    */
  private val strictSubsetOf: Map[String, (org.apache.spark.sql.SparkSession, String) => Long] = Map(
    // keep-first exact dedup over lineitem: synthetic data has duplicate
    // l_orderkey groups, so dedup must drop rows
    "dedup_exact" -> ((s, d) => Tables.lineitem(s, d).count()),
    // latest-wins window dedup over events keyed (user_id, event_type)
    "window_latest" -> ((s, d) => Tables.events(s, d).count()),
    // content-hash dedup over documents ∪ re-keyed documents (2N rows in,
    // every text duplicated once → strictly fewer out)
    "dedup_content_hash" -> ((s, d) => 2L * Tables.documents(s, d).count()),
    // C4 apply drops failing pages outright — the injected brace/lorem
    // classes guarantee drops at every SF
    "c4_apply" -> ((s, d) => Tables.documents(s, d).count()),
    // the composed web front door's corpus half: staged input is every
    // page twice (clean + mojibake mirror), so the mirror dedup alone
    // guarantees a strict subset even before the filter stages drop
    "web_pipeline_corpus" -> ((s, d) => 2L * Tables.documents(s, d).count())
  )

  private lazy val spark = TestSpark.spark

  for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
    test(s"non-degenerate at sf0.001: $name") {
      val df0 = fn(spark, dir)
      // raw JSON/CSV corrupt-record scans refuse a plan that references
      // ONLY _corrupt_record (Spark's QUERY_ONLY_CORRUPT_RECORD_COLUMN
      // guard trips on the pruned count-aggregate) — materialize those
      // first; everything else stays one lazy aggregate
      val df = if (name.startsWith("source_corrupt_"))
        spark.createDataFrame(
          spark.sparkContext.parallelize(df0.collect().toSeq), df0.schema)
      else df0
      val boolCols = df.schema.fields.filter(_.dataType == BooleanType)
        .map(_.name).toSeq
      // one pass: total count + per-flag true/false counts
      val aggs = count(lit(1)).as("__n") +: boolCols.flatMap { c =>
        Seq(sum(when(col(c) === true, 1L).otherwise(0L)).as(s"__t_$c"),
            sum(when(col(c) === false, 1L).otherwise(0L)).as(s"__f_$c"))
      }
      val row = df.agg(aggs.head, aggs.tail: _*).collect()(0)
      val n = row.getLong(0)

      if (emptyOk.contains(name)) {
        // allowlisted: emptiness is semantic; nothing further to assert
        // (but if it ever turns non-empty the justification is stale)
      } else {
        assert(n > 0, s"'$name' returned 0 rows at sf0.001 — the " +
          "correctly-empty blind spot. Either the predicate degenerated " +
          "or this belongs on emptyOk with a justification.")
      }

      if (n >= 2) {
        boolCols.zipWithIndex.foreach { case (c, i) =>
          val t = Option(row.get(1 + 2 * i)).fold(0L)(_.toString.toLong)
          val f = Option(row.get(2 + 2 * i)).fold(0L)(_.toString.toLong)
          if (!constantFlagOk.contains((name, c))) {
            assert(t > 0 && f > 0,
              s"'$name'.$c is constant (${t}x true / ${f}x false over " +
              s"$n rows) — a flag that never varies verifies nothing. " +
              "Fix the predicate or allowlist with a justification.")
          }
        }
      }

      strictSubsetOf.get(name).foreach { inCount =>
        val in = inCount(spark, dir)
        assert(n < in,
          s"'$name' kept all $in input rows — the filter is dead.")
      }

      positiveAgg.get(name).foreach { aggExpr =>
        val v = df.agg(org.apache.spark.sql.functions.expr(aggExpr))
          .collect()(0).get(0)
        val pos = Option(v).exists(x => BigDecimal(x.toString) > 0)
        assert(pos, s"'$name': $aggExpr = $v at sf0.001 — the metric is " +
          "structurally zero (the gopher-column class) and verifies nothing.")
      }
    }
  }

  test("the empty allowlist stays current: allowlisted queries are " +
       "actually empty (a stale entry hides a regression in reverse)") {
    emptyOk.keys.foreach { name =>
      val n = SparkEntry.queries(name)(spark, dir).count()
      assert(n == 0, s"'$name' is allowlisted as empty but returned $n " +
        "rows — remove it from emptyOk")
    }
  }
}
