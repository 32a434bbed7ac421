package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Data-profiling operators: the diagnostics a pipeline owner runs
  * before trusting a new feed — per-column stats and key-skew reports.
  * Both are single-scan aggregations (profiling 100 TB must not cost
  * more than one read).
  */
object Profile {

  /** Key-distribution skew report: the top-N heaviest keys with their
    * absolute counts and share of all rows. THE first diagnostic when a
    * shuffle stage straggles — a key with share ≫ 1/partitions is the
    * salting candidate. Two-level hash aggregation (partial map-side
    * combine), then a top-N sort of the (already tiny) per-key counts.
    * The total is summed from the per-key counts, not re-counted from
    * `df`: both branches share the per-key aggregation's exchange, so
    * ReuseExchange plans exactly ONE scan of the input (asserted by
    * ProfileSpec) — profiling 100 TB must not cost two reads.
    */
  def heavyHitters(df: DataFrame, key: Column, topN: Int = 10): DataFrame = {
    val counts = df.groupBy(key.as("key")).agg(count(lit(1)).as("n"))
    val total = counts.agg(sum(col("n")).as("total"))
    counts.crossJoin(total)
      .withColumn("share", col("n").cast("double") / col("total"))
      .orderBy(col("n").desc, col("key").asc)
      .limit(topN)
      .select(col("key"), col("n"), col("share"))
  }

  /** Per-group z-score outliers in EXACT integer arithmetic: a row is
    * flagged when |x − μ| > k·σ over its group, evaluated as
    * (n·x − Σx)² · den² > num² · (n·Σx² − (Σx)²) with k = num/den — all
    * cents-scaled integers (money survives exactly in DECIMAL(38,0)), so
    * the flag decision is bit-reproducible across engines and runs: no
    * float summation-order noise can flip a borderline row, which is
    * what lets an anomaly feed be oracle-verified at all. One scan for
    * the 5-row group stats (broadcast back), one for the flags.
    */
  def anomalyOutliers(df: DataFrame, group: Column, value: Column,
                      idCols: Seq[String], num: Int = 3, den: Int = 2): DataFrame =
    flagAnomalies(df, anomalyStats(df, group, value), group, value,
      idCols, num, den)

  /** The per-group moment sums the flag decision needs: n, Σx, Σx² in
    * exact cents (one scan, map-side combined). Kept separate so a
    * STREAMING monitor can broadcast baseline stats trained on the batch
    * corpus and flag a live feed with [[flagAnomalies]].
    */
  def anomalyStats(df: DataFrame, group: Column, value: Column): DataFrame = {
    val big = DecimalType(38, 0)
    // cast to decimal BEFORE any multiply/sum: cents*cents in LongType
    // wraps silently past ~2^63 (values >= ~$30M), and long sums wrap on
    // very large groups — either would break the bit-reproducible
    // contract (the DuckDB oracle is HUGEINT throughout)
    val cents = round(value * lit(100)).cast("long").cast(big)
    df.groupBy(group.as("g")).agg(
      count(lit(1)).as("n"),
      sum(cents).as("s"),
      sum(cents * cents).as("ss"))
  }

  /** Flag rows whose value deviates > (num/den)·σ from their group's
    * [[anomalyStats]] baseline — a broadcast join + exact-decimal filter,
    * so it applies unchanged to a streaming Dataset (no aggregation on
    * the feed side).
    */
  def flagAnomalies(rows: DataFrame, stats: DataFrame, group: Column,
                    value: Column, idCols: Seq[String],
                    num: Int, den: Int): DataFrame = {
    val big = DecimalType(38, 0)
    // decimal throughout (see anomalyStats): n*xc in LongType would wrap
    // on large groups x large cents before the cast could save it
    val cents = round(value * lit(100)).cast("long").cast(big)
    rows.select(idCols.map(col) :+ group.as("g") :+ value.as("value") :+
        cents.as("xc"): _*)
      .join(broadcast(stats), "g")
      .withColumn("dev",
        col("n").cast(big) * col("xc") - col("s").cast(big))
      .filter(col("dev") * col("dev") * lit(den.toLong * den) >
        (col("n").cast(big) * col("ss").cast(big) -
          col("s").cast(big) * col("s").cast(big))
          * lit(num.toLong * num))
      .select(idCols.map(col) :+ col("g") :+ col("value"): _*)
  }

  /** Robust outlier detection: flag rows deviating more than `k` MADs
    * (median absolute deviation) from their group median — the
    * estimator monitoring pipelines reach for when the z-score's mean/σ
    * are themselves dragged by the outliers being hunted (50% breakdown
    * point vs 0%). Complements [[anomalyStats]]'s moment-based flags.
    *
    * Determinism: medians are computed over exact cents (longs), so
    * every interpolated median is a dyadic rational (x.0/x.5, then
    * quarters for the MAD) — exactly representable doubles that both
    * engines land bit-identically; no rounding needed anywhere.
    *
    * Scale: two grouped exact percentiles + one broadcast join back.
    * Exact percentile holds per-group value multisets (hash of distinct
    * cents values), fine while per-group distinct cardinality is
    * bounded (prices, latencies); for unbounded long-tail metrics the
    * 100 TB swap-in is `approx_percentile`, same plan shape.
    */
  def madOutliers(df: DataFrame, group: Column, value: Column,
                  idCols: Seq[String], k: Int = 3): DataFrame = {
    val cents = round(value * lit(100)).cast("long")
    val rows = df.select(idCols.map(col) :+ group.as("g") :+
      value.as("value") :+ cents.as("xc"): _*)
    val med = rows.groupBy(col("g"))
      .agg(percentile(col("xc"), lit(0.5)).as("med"))
    val dev = rows.join(broadcast(med), "g")
      .withColumn("absdev", abs(col("xc").cast("double") - col("med")))
    val mad = dev.groupBy(col("g"))
      .agg(percentile(col("absdev"), lit(0.5)).as("mad"))
    dev.join(broadcast(mad), "g")
      .filter(col("absdev") > lit(k.toDouble) * col("mad"))
      .select(idCols.map(col) :+ col("g") :+ col("value") :+
        col("med") :+ col("mad"): _*)
  }

  /** [[madOutliers]] with `approx_percentile` — the documented swap for
    * UNBOUNDED-cardinality metrics, where exact `percentile`'s per-group
    * distinct-value multiset would grow without bound. The sketch (GK /
    * QuantileSummaries) holds O(1/ε · log(εn)) entries per group and
    * merges map-side, so the plan keeps [[madOutliers]]'s exact shape
    * (two grouped aggregations + broadcast joins back) with bounded
    * aggregation state — the 100 TB form.
    *
    * Output contract: a cross-engine oracle cannot replay another
    * engine's sketch, so the REGISTERED result is the per-group GK rank
    * guarantee, checked inside the query: approx_percentile(p, acc)
    * must return an element whose rank r in the group's multiset
    * satisfies floor((p−1/acc)·n) ≤ r ≤ ceil((p+1/acc)·n). The booleans
    * are provably true for ANY conforming sketch output (they do not
    * depend on which in-bound element the sketch picked), making the row
    * deterministic even though the sketch value itself need not be.
    * Numeric closeness of the approx median/MAD to the exact op is
    * separately property-tested against the ε-rank window of the exact
    * order statistics (Round8OpsSpec).
    */
  def madOutliersApproxContract(df: DataFrame, group: Column, value: Column,
                                accuracy: Int = 1000): DataFrame = {
    val eps = 1.0 / accuracy
    val cents = round(value * lit(100)).cast("long")
    val rows = df.select(group.as("g"), cents.as("xc"))
    val med = rows.groupBy(col("g"))
      .agg(percentile_approx(col("xc"), lit(0.5), lit(accuracy)).as("med"),
        count(lit(1)).as("n"))
    val dev = rows.join(broadcast(med), "g")
      .withColumn("absdev", abs(col("xc").cast("double") - col("med")))
    val mad = dev.groupBy(col("g"))
      .agg(percentile_approx(col("absdev"), lit(0.5), lit(accuracy)).as("mad"))
    // rank window of the returned element: [lo+1, le] (ties included)
    val ranks = dev.join(broadcast(mad), "g")
      .groupBy(col("g"), col("n"), col("med"), col("mad"))
      .agg(
        sum(when(col("xc") < col("med"), 1L).otherwise(0L)).as("med_lo"),
        sum(when(col("xc") <= col("med"), 1L).otherwise(0L)).as("med_le"),
        sum(when(col("absdev") < col("mad"), 1L).otherwise(0L)).as("mad_lo"),
        sum(when(col("absdev") <= col("mad"), 1L).otherwise(0L)).as("mad_le"))
    def inBound(lo: Column, le: Column, n: Column) =
      (lo + lit(1L) <= ceil((lit(0.5) + lit(eps)) * n)) &&
        (le >= floor((lit(0.5) - lit(eps)) * n))
    ranks.select(col("g"), col("n"),
      inBound(col("med_lo"), col("med_le"), col("n")).as("med_in_bound"),
      inBound(col("mad_lo"), col("mad_le"), col("n")).as("mad_in_bound"))
  }

  /** Distribution-drift report between two row populations (side 0 vs
    * side 1) over a bucketed metric: per-bucket counts, shares, and the
    * absolute share gap — the per-bin body of a PSI/TVD drift monitor,
    * kept log-free so every output value is a single deterministic
    * division of exact longs. Totals ride the bucket counts' exchange
    * (AQE ReusedExchange), so the feed is scanned once.
    */
  def driftReport(df: DataFrame, side: Column, bucket: Column): DataFrame = {
    val g = df.groupBy(bucket.as("bucket")).agg(
      sum(when(side === 0, 1L).otherwise(0L)).as("n_a"),
      sum(when(side === 1, 1L).otherwise(0L)).as("n_b"))
    val totals = g.agg(sum(col("n_a")).as("ta"), sum(col("n_b")).as("tb"))
    g.crossJoin(totals)
      .select(col("bucket"), col("n_a"), col("n_b"),
        (col("n_a").cast("double") / col("ta")).as("p_a"),
        (col("n_b").cast("double") / col("tb")).as("p_b"))
      .withColumn("drift", abs(col("p_a") - col("p_b")))
  }

  /** Two-sample Kolmogorov–Smirnov test between the side-0 and side-1
    * populations of a numeric metric — the distribution-level drift
    * DECISION beside [[driftReport]]'s per-bin body (the labeled-sample
    * sibling of [[ksTest]], which compares two named event types and
    * reports the critical value via sqrt; this variant keeps the
    * α=0.05 decision sqrt-free). The statistic
    * D = max_x |F_a(x) − F_b(x)| is computed EXACTLY: values in cents,
    * per-value conditional counts, one ordered window for both
    * cumulative CDFs, and the gap cross-multiplied to the common
    * denominator n_a·n_b so the max is an integer max. The α=0.05
    * decision avoids the transcendental sqrt in D > c·√((n_a+n_b)/
    * (n_a·n_b)) by SQUARING it into DECIMAL(38,0) integer arithmetic
    * (c² = 1.358² = 1844164/10⁶ exactly). One row out: the statistic,
    * its location (smallest value attaining it), and the decision.
    *
    * Scale: one conditional aggregation over the feed keyed by the
    * (bounded-cardinality) cents value; the window and max run on the
    * distinct-value table. ks_d is the single documented double — a
    * division of exact longs.
    *
    * NULL metric rows are EXCLUDED (the test is over observed values) —
    * done in [[ksSideCounts]] rather than left to the window, because
    * Spark's `ORDER BY x` puts NULLs first while DuckDB's puts them
    * last: an unfiltered NULL row would shift every cumulative count on
    * one engine only and silently desynchronize the oracle.
    */
  def ksDrift(df: DataFrame, side: Column, value: Column): DataFrame =
    ksFromCounts(ksSideCounts(df, side, value))

  /** The per-value pair-count table (x cents, side-0 count, side-1
    * count) [[ksDrift]] aggregates — exposed so a live maintainer
    * ([[graft.streaming.Streaming.streamingKsDrift]]) can sum-merge it
    * per micro-batch: the state is bounded by the metric's DISCRETE
    * DOMAIN, never by the feed. NULL metrics are dropped here (see
    * [[ksDrift]]'s NULL-ordering note).
    */
  private[graft] def ksSideCounts(df: DataFrame, side: Column,
                                  value: Column): DataFrame =
    df.select(side.as("s"), round(value * 100).cast("long").as("x"))
      .filter(col("x").isNotNull)
      .groupBy(col("x"))
      .agg(sum(when(col("s") === 0, 1L).otherwise(0L)).as("ca"),
        sum(when(col("s") === 1, 1L).otherwise(0L)).as("cb"))

  /** [[ksDrift]]'s statistic stage over an (x, ca, cb) count table —
    * one definition shared by the batch op and the streaming maintainer
    * so closed-feed equivalence is by construction.
    *
    * Range contract: the squared decision needs d_num² · 10⁶ ≤ 10³⁸,
    * i.e. n_a·n_b ≤ 10¹⁶ (samples up to ~10⁸ each). Beyond it Spark's
    * decimal multiply would return NULL (non-ANSI) while DuckDB's
    * HUGEINT errors — so the op FAILS LOUDLY via raise_error instead of
    * letting the two engines disagree exactly when drift is largest.
    */
  private[graft] def ksFromCounts(byV: DataFrame): DataFrame = {
    val big = DecimalType(38, 0)
    val w = Window.orderBy(col("x"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = byV.agg(sum(col("ca")).as("na"), sum(col("cb")).as("nb"))
    val gaps = byV.select(col("x"),
        sum(col("ca")).over(w).as("fa"), sum(col("cb")).over(w).as("fb"))
      .crossJoin(broadcast(tot))
      .select(col("x"), col("na"), col("nb"),
        abs(col("fa") * col("nb") - col("fb") * col("na")).as("g"))
    gaps.groupBy(col("na"), col("nb"))
      .agg(max(struct(col("g").as("g"), (-col("x")).as("nx"))).as("top"))
      .select(col("na").as("n_a"), col("nb").as("n_b"),
        // division form: na*nb itself would overflow LONG before 1e16
        // could be compared if written as a product
        when(col("nb") > 0 &&
            col("na") > lit(10000000000000000L) / col("nb"),
          raise_error(lit("ksDrift: n_a*n_b > 1e16 overflows the " +
            "squared decision; subsample or widen the arithmetic")))
          .otherwise(col("top.g")).as("d_num"),
        (col("top.g").cast("double")
          / (col("na") * col("nb")).cast("double")).as("ks_d"),
        (-col("top.nx")).as("d_at_cents"),
        (col("top.g").cast(big) * col("top.g").cast(big)
          * lit(1000000L).cast(big) >
          lit(1844164L).cast(big) * (col("na") + col("nb")).cast(big)
            * col("na").cast(big) * col("nb").cast(big)).as("reject"))
  }

  /** Mann-Whitney U rank-sum test over the same two populations (and
    * the same bounded per-value count table) as [[ksDrift]] — the KS
    * statistic is sensitive to ANY CDF gap; U asks the narrower
    * location question "does one side stochastically dominate", which
    * is the drift alarm an owner actually pages on when medians shift.
    *
    * Exactness: U is computed from the (value, side-count) table, not
    * per-row ranks — for each distinct value, side-A rows beat every
    * side-B row below it and half-tie with co-located B rows, so
    * 2·U_A = Σ_v ca(v)·(2·cbBelow(v) + cb(v)) is an exact long (one
    * ordered window over the DISCRETE value domain, never the feed).
    * The normal-approximation decision at α=0.05 is the tie-corrected
    * z² > 1.96² cross-multiplied into DECIMAL(38,0):
    * 1875·D²·n·(n−1) > 2401·na·nb·(n³−n−Σ(t³−t)), D = 2U−na·nb —
    * no sqrt, no doubles, bit-identical across engines. The
    * rank-biserial effect size r = D/(na·nb) is the one final derived
    * double.
    *
    * Range contract (mirrors [[ksFromCounts]]'s loud-failure
    * doctrine): the decision fits DECIMAL(38,0) while |D|·n ≤ 2.3·10¹⁷
    * and n ≤ 1.1·10⁷; beyond either bound the op raise_errors
    * ("subsample or widen") instead of letting Spark's NULL-on-
    * overflow and DuckDB's HUGEINT error disagree.
    */
  def mannWhitney(df: DataFrame, side: Column, value: Column): DataFrame =
    mwFromCounts(ksSideCounts(df, side, value))

  /** [[mannWhitney]]'s statistic stage over an (x, ca, cb) count
    * table — split out so a live maintainer can sum-merge the same
    * state that feeds [[ksFromCounts]].
    */
  private[graft] def mwFromCounts(byV: DataFrame): DataFrame = {
    val big = DecimalType(38, 0)
    val wPrev = Window.orderBy(col("x"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val t = col("ca") + col("cb")
    val agg = byV
      .select(col("ca"), col("cb"),
        coalesce(sum(col("cb")).over(wPrev), lit(0L)).as("cbb"))
      .agg(sum(col("ca")).as("na"), sum(col("cb")).as("nb"),
        coalesce(sum(col("ca") * (lit(2L) * col("cbb") + col("cb"))),
          lit(0L)).as("u2"),
        coalesce(sum(t.cast(big) * t * t - t), lit(0).cast(big))
          .as("ties"))
    val n = (col("na") + col("nb")).cast(big)
    val d = col("u2").cast(big) - col("na").cast(big) * col("nb")
    val varTerm = col("na").cast(big) * col("nb") *
      (n * n * n - n - col("ties"))
    agg.select(col("na"), col("nb"), col("u2"),
        d.as("d"), varTerm.as("vt"), n.as("n"))
      .select(col("na").as("n_a"), col("nb").as("n_b"),
        col("u2").as("u2_a"),
        when(col("na") > 0 && col("nb") > 0,
          col("d").cast("double") /
            (col("na").cast("double") * col("nb")))
          .otherwise(lit(0.0)).as("r_rb"),
        when(col("n") > lit(11000000L).cast(big) ||
            (col("d") =!= lit(0).cast(big) &&
              abs(col("d")) > lit(BigDecimal("230000000000000000")).cast(big)
                / col("n")),
          raise_error(lit("mannWhitney: decision exceeds DECIMAL(38,0) " +
            "(n > 1.1e7 or |2U-na*nb|*n > 2.3e17); subsample or widen " +
            "the arithmetic")))
          .otherwise(
            lit(1875).cast(big) * col("d") * col("d") * col("n") *
              (col("n") - 1) >
              lit(2401).cast(big) * col("vt")).as("reject"))
  }

  /** The even/odd-ingest-day population split shared by `drift_report`,
    * `ks_drift`, and the live [[graft.streaming.Streaming
    * .streamingKsDrift]] — ONE definition so the batch op, the
    * streaming maintainer, and their shared oracle can never drift
    * apart on what the two populations are.
    */
  def evenOddDaySide(ts: Column): Column =
    pmod(datediff(ts.cast("date"), to_date(lit("1970-01-01"))), lit(2))

  /** Count-min sketch frequency estimation, demonstrated against exact
    * truth: build a depth-4 × width-`w` CMS over the key column (one
    * explode to 4 (row, depth) pairs, one aggregation — the sketch is
    * 4·w counters regardless of key cardinality), then estimate the
    * top-N keys' frequencies as the min over their 4 counters. The CMS
    * guarantee (estimate >= exact, overshoot bounded by collisions)
    * is spec-asserted and visible in the output. All arithmetic is
    * integer hashing + integer counts — deterministic across engines.
    * At 100 TB the sketch is the fixed-size alternative to a full
    * per-key aggregation when only heavy keys matter.
    */
  def cmsEstimate(df: DataFrame, key: Column, topN: Int = 10,
                  w: Int = 1024): DataFrame = {
    val p = 2038074743L
    val aC = Seq(1000003L, 999983L, 824633L, 7368787L)
    val bC = Seq(12345L, 54321L, 98765L, 13579L)
    def bucket(i: Int, k: Column): Column =
      pmod(pmod(k * lit(aC(i)) + lit(bC(i)), lit(p)), lit(w.toLong))

    val sketch = df.select(explode(array((0 until 4).map(i =>
        struct(lit(i).as("d"), bucket(i, key).as("b"))): _*)).as("e"))
      .groupBy(col("e.d").as("d"), col("e.b").as("b"))
      .agg(count(lit(1)).as("c"))

    val top = heavyHitters(df, key, topN)
    top.select(col("key"), col("n"),
        explode(array((0 until 4).map(i =>
          struct(lit(i).as("d"), bucket(i, col("key")).as("b"))): _*)).as("e"))
      .select(col("key"), col("n"), col("e.d"), col("e.b"))
      .join(broadcast(sketch), Seq("d", "b"))
      .groupBy(col("key"), col("n"))
      .agg(min(col("c")).as("cms_estimate"))
      .select(col("key"), col("n").as("exact_n"), col("cms_estimate"))
  }

  /** HyperLogLog distinct-count estimation per group, demonstrated
    * against exact truth — the fixed-size (m=64 registers/group)
    * alternative to `count_distinct` when the key set itself is too
    * large to shuffle. One scan builds the registers (groupBy (g,
    * bucket) max-rho — map-side combined, at most m rows per group
    * survive the exchange); the estimate folds 64 registers per group.
    *
    * Every arithmetic step is chosen to be bit-reproducible across
    * engines so the sketch itself can be oracle-verified, not just
    * bounded: a murmur-style multiply–xor–shift finalizer in exact
    * BIGINT (a plain multiplicative hash left its low bits too
    * structured — a spec-measured 40% miss; the 31-bit width keeps every
    * product below 2^63), register index/remainder by integer div/mod,
    * rho via binary-string length (Spark `bin` and DuckDB `bin` agree,
    * no padding), 2^-M terms are exact powers of two whose per-group sum
    * stays inside 53 bits (so float summation order cannot matter), and
    * the one transcendental (ln in the small-range linear-counting
    * correction) is rounded at 1e-6 — ten orders above cross-libm ulp
    * noise. Spark's built-in `approx_count_distinct` is the production
    * default; this is the same algorithm with the accuracy auditable.
    */
  private val hllM = 64L      // 6-bit bucket index
  private val hllWBits = 25   // remaining bits of the 31-bit hash
  private val hllAlpha = 0.709 // standard HLL alpha for m = 64

  /** The bit-reproducible HLL row projection (see [[hllDistinct]] for
    * the derivation of every arithmetic choice): key → (bucket, rho) as
    * pure expressions shared by the per-group and sliding-window
    * variants — same hash, so their register tables are merge-compatible.
    */
  private def hllBucketRho(key: Column): (Column, Column) = {
    val two31 = 2147483648L
    val h1 = pmod(key * lit(2654435761L), lit(two31))
    val h2 = pmod((h1.bitwiseXOR(shiftright(h1, 15))) * lit(2246822519L),
      lit(two31))
    val h = h2.bitwiseXOR(shiftright(h2, 13))
    // h is non-negative and < 2^31, so div 2^wBits == logical shift
    val bucket = shiftright(h, hllWBits)
    val w = pmod(h, lit(1L << hllWBits))
    val rho = when(w === 0, lit(hllWBits + 1))
      .otherwise(lit(hllWBits + 1) - length(bin(w)))
    (bucket, rho)
  }

  /** Registers (groupCols..., M) → (groupCols..., hll_estimate): the
    * fold + small-range linear-counting correction, rounded 1e-6.
    */
  private[graft] def hllEstimate(regs: DataFrame, groupCols: Seq[String]): DataFrame =
    regs.groupBy(groupCols.map(col): _*).agg(
      count(lit(1)).as("n_regs"),
      sum(pow(lit(2.0), -col("M"))).as("z_used"))
      // empty registers contribute 2^0 = 1 each
      .withColumn("z",
        col("z_used") + (lit(hllM) - col("n_regs")).cast("double"))
      .withColumn("raw",
        lit(hllAlpha) * lit(hllM.toDouble) * lit(hllM.toDouble) / col("z"))
      .withColumn("v", lit(hllM) - col("n_regs"))
      .withColumn("hll_estimate", round(
        when(col("raw") <= lit(2.5 * hllM) && col("v") > 0,
          lit(hllM.toDouble) * log(lit(hllM.toDouble) / col("v").cast("double")))
          .otherwise(col("raw")), 6))
      .select(groupCols.map(col) :+ col("hll_estimate"): _*)

  def hllDistinct(df: DataFrame, group: Column, key: Column): DataFrame = {
    val (bucket, rho) = hllBucketRho(key)
    val regs = df.select(group.as("g"), bucket.as("__b"), rho.as("__rho"))
      .groupBy(col("g"), col("__b")).agg(max(col("__rho")).as("M"))
    val exact = df.groupBy(group.as("g")).agg(count_distinct(key).as("n_exact"))
    exact.join(hllEstimate(regs, Seq("g")), "g")
  }

  /** Trailing-`windowDays` distinct keys per day via HLL register
    * MERGES — the query exact `count_distinct` cannot do without
    * rescanning every overlapping window. The raw feed is scanned ONCE
    * into a per-(day, bucket) register table (≤ 64 rows/day); each
    * day's trailing window is then a max-merge over that SKETCH table
    * (days × windowDays × 64 rows — data-independent), which is the
    * mergeability HLL exists for: per-day partials roll up into any
    * window, rolling or calendar, with no second pass over the data.
    * Exact truth per window is emitted next to the estimate (that side
    * DOES pay the windowDays× replication — it is the verification
    * crutch, not the production path). Same hash family as
    * [[hllDistinct]], so maintained daily registers serve both.
    */
  /** The per-(day, bucket) HLL register table — the maintained daily
    * partial that [[hllSlidingDistinct]] windows over and
    * [[graft.streaming.Streaming]] merges into live.
    */
  private[graft] def hllDailyRegs(df: DataFrame, ts: Column,
                                  key: Column): DataFrame = {
    val (bucket, rho) = hllBucketRho(key)
    df.select(ts.cast("date").as("day"), bucket.as("__b"), rho.as("__rho"))
      .groupBy(col("day"), col("__b")).agg(max(col("__rho")).as("M"))
  }

  /** Max-merge a register delta into a maintained register view — union
    * + re-max, associative and idempotent, so any batching of the feed
    * yields the identical table (the property the streaming maintenance
    * invariant rests on).
    */
  private[graft] def hllMergeRegs(view: DataFrame, delta: DataFrame): DataFrame =
    view.select(col("day"), col("__b"), col("M"))
      .unionByName(delta.select(col("day"), col("__b"), col("M")))
      .groupBy(col("day"), col("__b")).agg(max(col("M")).as("M"))

  def hllSlidingDistinct(df: DataFrame, ts: Column, key: Column,
                         windowDays: Int = 7): DataFrame = {
    val day = ts.cast("date")
    val regs = hllDailyRegs(df, ts, key).persist()
    val days = regs.select(col("day")).distinct()
    val merged = days.as("d").join(regs.as("r"),
        datediff(col("d.day"), col("r.day")).between(0, windowDays - 1))
      .select(col("d.day").as("day"), col("__b"), col("M"))
      .groupBy(col("day"), col("__b")).agg(max(col("M")).as("M"))
    val exact = days.as("d").join(
        df.select(day.as("day2"), key.as("k")).as("x"),
        datediff(col("d.day"), col("x.day2")).between(0, windowDays - 1))
      .groupBy(col("d.day").as("day")).agg(count_distinct(col("k")).as("n_exact"))
    exact.join(hllEstimate(merged, Seq("day")), "day")
  }

  /** CUSUM changepoint detection over a per-group daily count series:
    * find the day where the cumulative deviation from the series mean
    * peaks — the classic "when did this feed's volume shift" diagnostic
    * (a level change before day t* pushes every prefix sum the same
    * direction, so |S_t| is maximized at the shift). The statistic is
    * kept in SCALED INTEGERS: with t = day index, S_t·n = n·cumsum_t −
    * t·total is exact BIGINT (the rational mean never materializes), so
    * the argmax is bit-reproducible across engines — no float
    * accumulation can flip which day wins. Ties break to the earliest
    * day. Cost: one (group, day) count aggregation, then three window
    * phases that all share ONE hash exchange on the group; everything
    * after the first aggregate is days×groups-sized, never data-sized.
    */
  def changepointCusum(df: DataFrame, group: Column, ts: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = df.groupBy(group.as("g"), ts.cast("date").as("day"))
      .agg(count(lit(1)).as("c"))
    val wOrd = Window.partitionBy(col("g")).orderBy(col("day"))
    val wAll = Window.partitionBy(col("g"))
    val cum = daily
      .withColumn("t", row_number().over(wOrd).cast("long"))
      .withColumn("cs", sum(col("c")).over(wOrd))
      .withColumn("n_days", count(lit(1)).over(wAll))
      .withColumn("total", sum(col("c")).over(wAll))
      .withColumn("s_scaled",
        col("n_days") * col("cs") - col("t") * col("total"))
    cum.withColumn("peak", max(abs(col("s_scaled"))).over(wAll))
      .filter(abs(col("s_scaled")) === col("peak"))
      .withColumn("rn", row_number().over(wOrd))
      .filter(col("rn") === 1)
      .select(col("g"), col("day").as("change_day"), col("s_scaled"),
        col("n_days"), col("total").as("n_events"))
  }

  /** Rolling 7-day median of each group's daily count series — the
    * robust smoothing companion to [[changepointCusum]] (a single spike
    * day moves a rolling MEAN by spike/7 but leaves the rolling median
    * untouched — exactly the property a volume monitor wants under
    * bursty feeds). The median over a ≤`window`-element frame of LONG
    * counts is sort-then-middle: odd frames pick an element (exact),
    * even frames average two longs — a dyadic rational (x.0/x.5),
    * exactly representable, so both engines land the double
    * bit-identically ([[madOutliers]]' argument). No rounding anywhere.
    *
    * Scale: the window runs over the DAILY table (calendar-sized), one
    * hash exchange on the group; the frame buffer is `window` longs. The
    * sort-per-frame is O(w log w) on ≤7 elements — noise.
    */
  def rollingMedian(df: DataFrame, group: Column, ts: Column,
                    window: Int = 7): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = df.groupBy(group.as("g"), ts.cast("date").as("day"))
      .agg(count(lit(1)).as("c"))
    val w = Window.partitionBy(col("g")).orderBy(col("day"))
      .rowsBetween(-(window - 1), Window.currentRow)
    val frame = array_sort(collect_list(col("c")).over(w))
    val n = size(frame)
    // element_at wants INT positions; the halvings are exact (each
    // branch only fires when its numerator is even), so the casts are
    // pure type adjustments, never value changes
    val mid = ((n + 1) / 2).cast("int")
    val lo = (n / 2).cast("int")
    val med = when(n % 2 === 1, element_at(frame, mid).cast("double"))
      .otherwise((element_at(frame, lo) + element_at(frame, lo + 1))
        .cast("double") / lit(2.0))
    daily.select(col("g"), col("day"), col("c"), med.as("med"))
  }

  /** Per-column profile of numeric columns: min / max / null count /
    * distinct count, one output row per column — the schema-contract
    * companion (Quality.dqReport validates expectations; this MEASURES
    * the feed). ONE scan: a single aggregate row fans out into per-column
    * rows via an inline explode, not one job per column. Stats are cast
    * to DOUBLE for a uniform row schema (min/max of stored values are
    * exact — no arithmetic happens on them).
    */
  def profileNumeric(df: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs = cols.flatMap { c =>
      Seq(min(col(c)).cast("double").as(s"${c}__min"),
        max(col(c)).cast("double").as(s"${c}__max"),
        // sum over zero rows is NULL — an empty feed has zero nulls, not
        // unknown nulls
        coalesce(sum(when(col(c).isNull, 1L).otherwise(0L)), lit(0L))
          .as(s"${c}__nulls"),
        count_distinct(col(c)).as(s"${c}__distinct"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val rows = cols.map { c =>
      struct(lit(c).as("column"),
        col(s"${c}__min").as("min_value"),
        col(s"${c}__max").as("max_value"),
        col(s"${c}__nulls").as("n_nulls"),
        col(s"${c}__distinct").as("n_distinct"))
    }
    one.select(explode(array(rows: _*)).as("p")).select(col("p.*"))
  }

  /** Two-arm A/B experiment readout with hash-bucketed assignment and a
    * Welch z statistic. Units are assigned to arms by
    * [[Shard.portableHash]] parity (membership is a pure function of the
    * unit id — the same growth-stable property as train/test splits), the
    * metric is aggregated PER UNIT first (events within a unit are
    * correlated; unit totals are the i.i.d. observations a z-test needs),
    * then per arm.
    *
    * Determinism: unit totals and per-arm moment sums (n, Σs, Σs²) are
    * exact-decimal cents (the [[anomalyStats]] discipline — no
    * order-dependent float accumulation in any shuffle). Only the final
    * 1-row mean/variance/z arithmetic is IEEE double, in a fixed
    * expression shape shared with the oracle, rounded at 1e-6. Moment
    * sums stay exactly double-representable below 2^53 cents² — ~$10M
    * per-unit totals; past that, widen to cents→dollars before squaring.
    *
    * Scale: one shuffle on unit, one map-side-combined aggregate on arm
    * (2 groups), one 2-row final reduce. Nothing downstream of the first
    * aggregate sees data-sized rows.
    */
  def abTestReport(df: DataFrame, unit: Column, metric: Column): DataFrame = {
    val big = DecimalType(38, 0)
    val cents = round(metric * lit(100)).cast("long").cast(big)
    val perUnit = df.select(unit.as("u"), cents.as("c"))
      .groupBy(col("u")).agg(sum(col("c")).as("s"))
      .withColumn("arm", pmod(Shard.portableHash(col("u")), lit(2)))
    val byArm = perUnit.groupBy(col("arm")).agg(
      count(lit(1)).as("n"),
      sum(col("s")).as("ts"),
      sum(col("s") * col("s")).as("tss"))
    def pick(a: Int, c: String) = first(when(col("arm") === a, col(c)), ignoreNulls = true)
    val one = byArm.agg(
      pick(0, "n").as("n0"), pick(1, "n").as("n1"),
      pick(0, "ts").cast("double").as("s0"), pick(1, "ts").cast("double").as("s1"),
      pick(0, "tss").cast("double").as("q0"), pick(1, "tss").cast("double").as("q1"))
    val r6 = (c: Column) => round(c, 6)
    // fixed shape: mean = s/n/100; var = (q - s*s/n) / (n-1) / 10000
    val m0 = col("s0") / col("n0") / lit(100.0)
    val m1 = col("s1") / col("n1") / lit(100.0)
    val v0 = (col("q0") - col("s0") * col("s0") / col("n0")) /
      (col("n0") - lit(1)) / lit(10000.0)
    val v1 = (col("q1") - col("s1") * col("s1") / col("n1")) /
      (col("n1") - lit(1)) / lit(10000.0)
    one.select(
      col("n0").as("n_control"), col("n1").as("n_treatment"),
      r6(m0).as("mean_control"), r6(m1).as("mean_treatment"),
      r6(m1 - m0).as("diff"),
      r6((m1 - m0) / sqrt(v1 / col("n1") + v0 / col("n0"))).as("welch_z"))
  }

  /** Per-group ordinary-least-squares trend of daily totals vs day
    * index — the "is this metric drifting" primitive behind capacity
    * planning and data-volume monitoring (extends the reference's plain
    * audit counts, `/root/reference/pipeline/data_pipeline.py:219-242`,
    * to a fitted direction).
    *
    * Determinism: the closed-form normal equations are evaluated over
    * EXACT integer sums — x is the day offset from the group's first
    * day (centering keeps every product far below 2^63), y is exact
    * daily cents, and n/Σx/Σy/Σxy/Σx² accumulate in DECIMAL(38,0). Each
    * of slope and intercept is then ONE decimal→double conversion pair
    * and ONE IEEE division, rounded at 1e-6 — the [[abTestReport]]
    * convention. `intercept` is the fitted value (in cents) AT the
    * group's first day (x = 0). Groups with a single day (denominator
    * n·Σx² − (Σx)² = 0) emit NULL slope/intercept rather than NaN.
    *
    * Scale: one shuffle to the (group, day) daily table, a window min
    * over the group-sized daily table, one map-side-combined final
    * aggregate. Nothing after the first aggregate is data-sized.
    */
  def olsTrend(df: DataFrame, group: Column, ts: Column,
               value: Column): DataFrame = {
    val big = DecimalType(38, 0)
    val cents = round(value * lit(100)).cast("long").cast(big)
    val daily = df.select(group.as("g"), ts.cast("date").as("day"),
        cents.as("c"))
      .groupBy(col("g"), col("day")).agg(sum(col("c")).as("y"))
    val wg = Window.partitionBy(col("g"))
    val centered = daily
      .withColumn("first_day", min(col("day")).over(wg))
      .withColumn("x", datediff(col("day"), col("first_day"))
        .cast("long").cast(big))
    val sums = centered.groupBy(col("g"), col("first_day")).agg(
      count(lit(1)).as("n"),
      sum(col("x")).as("sx"),
      sum(col("y")).as("sy"),
      sum(col("x") * col("y")).as("sxy"),
      sum(col("x") * col("x")).as("sxx"))
    val nB = col("n").cast(big)
    val den = nB * col("sxx") - col("sx") * col("sx")
    def fit(num: Column): Column =
      when(den === 0, lit(null).cast("double"))
        .otherwise(round(num.cast("double") / den.cast("double"), 6))
    sums.select(col("g"), col("first_day"), col("n").as("n_days"),
      fit(nB * col("sxy") - col("sx") * col("sy")).as("slope"),
      fit(col("sy") * col("sxx") - col("sx") * col("sxy")).as("intercept"))
  }

  /** Per-group Theil-Sen robust trend — the median-of-pairwise-slopes
    * estimator (Sen 1968) beside [[olsTrend]]'s least squares: OLS
    * hands a single corrupted day unbounded leverage over the fitted
    * slope, Theil-Sen tolerates ~29% arbitrary outliers (its breakdown
    * point), which is the estimator an owner wants when the feed
    * itself is what's being monitored for corruption.
    *
    * Determinism: each pairwise slope is held as the exact floor of
    * num·10⁶/den (num = Δdaily-cents, den = Δdays > 0; floor computed
    * as (a − pmod(a, den)) div den, which both engines evaluate
    * identically since a − pmod is exactly divisible — no native
    * negative-division semantics involved). The median is the lower
    * mid-rank element under a total (slope_key, den, num) order, so
    * tie-breaking is reproducible; the only double is the final
    * key/10⁶ rescale. NULL metric rows are excluded (the [[ksDrift]]
    * NULL-ordering rule). Precondition: |Δy|·10⁶ must fit a long
    * (daily deltas below ~9·10¹² cents) — beyond that, widen to
    * DECIMAL.
    *
    * Scale: pairs expand over the per-group DAILY table — bounded by
    * the day domain (d days → d(d−1)/2 rows per group), never the
    * feed; the feed is touched by exactly one map-side-combined
    * aggregate. Single-day groups emit NULL slope (no pairs), matching
    * [[olsTrend]]'s degenerate-group contract.
    */
  def theilSen(df: DataFrame, group: Column, ts: Column,
               value: Column): DataFrame = {
    val cents = round(value * lit(100)).cast("long")
    val daily = df.select(group.as("g"), ts.cast("date").as("day"),
        cents.as("c"))
      .filter(col("c").isNotNull)
      .groupBy(col("g"), col("day")).agg(sum(col("c")).as("y"))
    val wg = Window.partitionBy(col("g"))
    val d = daily
      .withColumn("x",
        datediff(col("day"), min(col("day")).over(wg)).cast("long"))
    val pairs = d.select(col("g"), col("x").as("xa"), col("y").as("ya"))
      .join(d.select(col("g").as("g2"), col("x").as("xb"),
        col("y").as("yb")), col("g") === col("g2") && col("xa") < col("xb"))
      .select(col("g"),
        ((col("yb") - col("ya")) * lit(1000000L)).as("num"),
        (col("xb") - col("xa")).as("den"))
      .withColumn("slope_key",
        expr("(num - pmod(num, den)) div den"))
    val wp = Window.partitionBy(col("g"))
      .orderBy(col("slope_key"), col("den"), col("num"))
    val med = pairs
      .withColumn("rn", row_number().over(wp))
      .withColumn("cnt", count(lit(1)).over(wg))
      .filter(col("rn") === expr("(cnt + 1) div 2"))
      .select(col("g"), col("slope_key"), col("cnt"))
    daily.groupBy(col("g")).agg(count(lit(1)).as("n_days"))
      .join(med, Seq("g"), "left")
      .select(col("g"), col("n_days"),
        coalesce(col("cnt"), lit(0L)).as("n_pairs"),
        round(col("slope_key").cast("double") / lit(1000000.0), 6)
          .as("slope"))
  }

  /** Split-conformal prediction interval per group (Vovk et al. 2005;
    * Lei et al., JASA 2018) — the distribution-free guarantee an eval
    * pipeline wants before trusting a point predictor: calibrate a
    * nonconformity threshold q̂ on one half of the data and the
    * interval center ± q̂ covers a fresh row with probability ≥ 1 − α,
    * no matter the distribution. Here the predictor is the calibration
    * median (the simplest deterministic center), nonconformity is
    * |value − median|, the split is the even/odd-id halves, and the
    * output reports the EMPIRICAL holdout coverage next to the nominal
    * 1 − α so the guarantee is itself measured.
    *
    * Determinism: q̂ is the k-th smallest calibration score with
    * k = ⌈(n_cal+1)(1−α)⌉ in pure integer arithmetic (α = num/den),
    * capped at n_cal (tiny groups where the conformal set is the whole
    * line; the cap can only lower coverage, never fake it). Median and
    * q̂ are rank selections over CUMULATIVE counts, so tie order cannot
    * exist, and coverage is one exact-long division.
    *
    * Scale: ONE feed scan into a (group, cents) count table — every
    * later stage (median, score distribution, q̂, coverage) is bounded
    * by the metric's discrete DOMAIN, never the feed (the [[ksDrift]]
    * count-table discipline) — so the op costs one map-side-combined
    * aggregate at any corpus size.
    */
  def conformalThreshold(df: DataFrame, group: Column, id: Column,
                         value: Column, alphaNum: Int = 1,
                         alphaDen: Int = 10): DataFrame =
    conformalFromCounts(conformalSideCounts(df, group, id, value),
      alphaNum, alphaDen)

  /** [[conformalThreshold]]'s feed stage: the (g, c, ca, ct) count
    * table — calibration (even id) and holdout (odd id) counts per
    * (group, cents) — bounded by the metric's discrete DOMAIN, never
    * the feed; sum-mergeable across batches, which is what the live
    * maintainer exploits.
    */
  private[graft] def conformalSideCounts(df: DataFrame, group: Column,
                                         id: Column,
                                         value: Column): DataFrame =
    df.select(group.as("g"), pmod(id, lit(2)).as("side"),
        round(value * 100).cast("long").as("c"))
      .filter(col("c").isNotNull)
      .groupBy(col("g"), col("c"))
      .agg(sum(when(col("side") === 0, 1L).otherwise(0L)).as("ca"),
        sum(when(col("side") === 1, 1L).otherwise(0L)).as("ct"))

  /** [[conformalThreshold]]'s statistic stage over the count table —
    * one definition shared by the batch op and the streaming
    * maintainer so closed-feed equivalence is by construction.
    */
  private[graft] def conformalFromCounts(counts: DataFrame, alphaNum: Int,
                                         alphaDen: Int): DataFrame = {
    require(alphaNum > 0 && alphaNum < alphaDen,
      s"conformalThreshold: need 0 < alpha < 1, got $alphaNum/$alphaDen")
    val wg = Window.partitionBy(col("g"))
    val wc = wg.orderBy(col("c"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val base = counts
      .withColumn("n_cal", sum(col("ca")).over(wg))
      .withColumn("n_test", sum(col("ct")).over(wg))
      .filter(col("n_cal") > 0 && col("n_test") > 0)
      .withColumn("cum_ca", sum(col("ca")).over(wc))
    val med = base
      // lower mid-rank: the smallest c whose cumulative calibration
      // count reaches rank (n_cal + 1) div 2 (the theilSen discipline)
      .filter(col("cum_ca") >= expr("(n_cal + 1) div 2"))
      .groupBy(col("g")).agg(min(col("c")).as("med_cents"))
    val scores = base.join(med, "g")
      .groupBy(col("g"), col("n_cal"), col("n_test"), col("med_cents"),
        abs(col("c") - col("med_cents")).as("s"))
      .agg(sum(col("ca")).as("sa"), sum(col("ct")).as("st"))
    val ws = Window.partitionBy(col("g")).orderBy(col("s"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withQ = scores
      .withColumn("cum_sa", sum(col("sa")).over(ws))
      .withColumn("k", expr(s"least(((n_cal + 1) * " +
        s"${alphaDen - alphaNum} + ${alphaDen - 1}) div $alphaDen, n_cal)"))
      .withColumn("qhat_cents",
        min(when(col("cum_sa") >= col("k"), col("s")))
          .over(Window.partitionBy(col("g"))))
    withQ.groupBy(col("g"), col("n_cal"), col("n_test"),
        col("med_cents"), col("qhat_cents"))
      .agg(sum(when(col("s") <= col("qhat_cents"), col("st"))
        .otherwise(0L)).as("n_covered"))
      .select(col("g"), col("n_cal"), col("n_test"), col("med_cents"),
        col("qhat_cents"), col("n_covered"),
        (col("n_covered").cast("double") / col("n_test").cast("double"))
          .as("coverage"),
        lit((alphaDen - alphaNum).toDouble / alphaDen).as("nominal"))
  }

  /** Benford first-digit audit over a money column — the classic
    * fabricated-data / feed-corruption screen: organically-grown
    * magnitudes follow P(d) = log10(1 + 1/d); a synthetic or truncated
    * feed does not. Output: one row per leading digit with the observed
    * count/share, the Benford expectation, and that digit's χ²
    * contribution.
    *
    * Determinism: counts are exact longs; `expected_share` is rounded
    * at 1e-6 FIRST (the nine log10 constants are nowhere near a
    * rounding boundary, so libm ulp differences cannot flip them) and
    * the χ² component is then computed from the rounded constant in a
    * fixed expression shape — multiply, subtract, square via `x*x`,
    * one division — rounded at 1e-6.
    *
    * Scale: a 9-group map-side-combined aggregate over a projection;
    * the window total runs over 9 rows.
    */
  def benfordDigits(df: DataFrame, value: Column): DataFrame = {
    val cents = round(value * lit(100)).cast("long")
    val digit = substring(cents.cast("string"), 1, 1).cast("int")
    val counts = df.select(digit.as("digit"))
      .filter(col("digit").between(1, 9)) // zero/negative rows carry no leading digit
      .groupBy(col("digit")).agg(count(lit(1)).as("n_obs"))
    val wAll = Window.partitionBy(lit(1))
    val expected = round(log10(lit(1.0) + lit(1.0) / col("digit")), 6)
    val expN = col("expected_share") * col("n_total").cast("double")
    val diff = col("n_obs").cast("double") - expN
    counts
      .withColumn("n_total", sum(col("n_obs")).over(wAll))
      .withColumn("expected_share", expected)
      .select(col("digit"), col("n_obs"),
        (col("n_obs").cast("double") / col("n_total").cast("double"))
          .as("share"),
        col("expected_share"),
        round(diff * diff / expN, 6).as("chi2_component"))
  }

  /** Per-group winsorized mean: clamp values to the group's discrete
    * [p05, p95] before averaging — the outlier-robust location metric
    * monitoring dashboards quote next to the raw mean. One row per
    * group: n, both percentile cut values, raw and winsorized means.
    *
    * Determinism: percentiles are DISCRETE rank selections over exact
    * cents — the k-th smallest with k = ceil(p·n) in integer
    * arithmetic — so no interpolation, no float percentile; equal cents
    * make the selected VALUE independent of tie order. Means are exact
    * decimal sums, then the fixed sum/n/100 division chain rounded 1e-6
    * (the [[abTestReport]] shape).
    *
    * Scale: one shuffle for the per-group sort (WindowExec ranks and
    * counts in a single pass), one map-side-combined final aggregate.
    * For unbounded groups the 100 TB swap-in is `approx_percentile`
    * cuts broadcast against an unsorted scan, same output contract.
    */
  def winsorizedStats(df: DataFrame, group: Column,
                      value: Column): DataFrame = {
    val big = DecimalType(38, 0)
    val cents = round(value * lit(100)).cast("long")
    val w = Window.partitionBy(col("g")).orderBy(col("c"))
    val wg = Window.partitionBy(col("g"))
    val ranked = df.select(group.as("g"), cents.as("c"))
      .withColumn("rn", row_number().over(w))
      .withColumn("n_part", count(lit(1)).over(wg))
      .withColumn("k05", expr("(n_part * 5 + 99) div 100"))
      .withColumn("k95", expr("(n_part * 95 + 99) div 100"))
      // cut values as whole-partition window maxima: the ranking, the
      // counts and both cuts all ride ONE sort — no second scan/join
      .withColumn("p05_cents",
        max(when(col("rn") === col("k05"), col("c"))).over(wg))
      .withColumn("p95_cents",
        max(when(col("rn") === col("k95"), col("c"))).over(wg))
    ranked.groupBy(col("g")).agg(
        count(lit(1)).as("n"),
        sum(col("c").cast(big)).as("s_raw"),
        max(col("p05_cents")).as("p05_cents"),
        max(col("p95_cents")).as("p95_cents"),
        sum(greatest(col("p05_cents"), least(col("p95_cents"), col("c")))
          .cast(big)).as("s_win"))
      .select(col("g"), col("n"), col("p05_cents"), col("p95_cents"),
        round(col("s_raw").cast("double") / col("n") / lit(100.0), 6)
          .as("mean_raw"),
        round(col("s_win").cast("double") / col("n") / lit(100.0), 6)
          .as("mean_winsorized"))
  }

  /** Pairwise Pearson correlation between a set of money/ratio metrics,
    * in ONE scan — the feature-redundancy screen run before training
    * (two metrics at |r| ≈ 1 carry one signal) and the drift check
    * between supposedly-coupled feed columns.
    *
    * Determinism: every metric is scaled to exact integer units (×100)
    * and all 2nd-order moment sums accumulate in DECIMAL(38,0); each
    * pair's r is then evaluated in ONE fixed expression shape —
    * num/sqrt(d1·d2) with num/d1/d2 each a single exact→double
    * conversion (the d1·d2 product is formed in DOUBLE: exact decimals
    * would overflow 38 digits) — rounded at 1e-6, ten orders above the
    * conversion's ulp.
    *
    * Scale: one map-side-combined aggregate to a single row of 2+3k
    * sums, exploded to k(k−1)/2 output rows on the driver-sized result;
    * the input is scanned exactly once.
    */
  def corrMatrix(df: DataFrame, metrics: Seq[(String, Column)]): DataFrame = {
    val big = DecimalType(38, 0)
    val scaled = df.select(metrics.map { case (n, c) =>
      round(c * lit(100)).cast("long").cast(big).as(n) }: _*)
    val pairs = for {
      i <- metrics.indices; j <- metrics.indices if i < j
    } yield (metrics(i)._1, metrics(j)._1)
    val sums =
      Seq(count(lit(1)).as("n")) ++
      metrics.map { case (n, _) => sum(col(n)).as(s"s_$n") } ++
      metrics.map { case (n, _) => sum(col(n) * col(n)).as(s"q_$n") } ++
      pairs.map { case (a, b) => sum(col(a) * col(b)).as(s"p_${a}_$b") }
    val one = scaled.agg(sums.head, sums.tail: _*)
    val nB = col("n").cast(big)
    def den(m: String): Column =
      (nB * col(s"q_$m") - col(s"s_$m") * col(s"s_$m")).cast("double")
    val rows = pairs.map { case (a, b) =>
      struct(lit(s"${a}_$b").as("pair"),
        round((nB * col(s"p_${a}_$b") - col(s"s_$a") * col(s"s_$b"))
            .cast("double") / sqrt(den(a) * den(b)), 6).as("corr"))
    }
    one.select(col("n"), explode(array(rows: _*)).as("pc"))
      .select(col("pc.pair").as("pair"), col("pc.corr").as("corr"), col("n"))
  }

  /** Mergeable histogram quantile sketch, with the exact answer beside
    * it — the distributed-percentile pattern at 100 TB: an equi-width
    * bucket count table is ONE map-side-combined aggregate (and merges
    * associatively across feeds/days, the [[hllDistinct]] discipline),
    * so p50/p95 estimates need NO global sort; the estimate's error is
    * bounded by the bucket width. The exact rank-selected truth
    * ([[winsorizedStats]] discipline) is computed next to it so the
    * sketch's error is itself oracle-verified.
    *
    * Determinism: everything is integer — cents, `div`-bucketing,
    * cumulative counts, ceil(p·n) ranks, bucket upper edges. The
    * estimate for quantile p is the upper edge of the first bucket
    * whose cumulative count reaches ceil(p·n).
    */
  def histogramQuantiles(df: DataFrame, group: Column, value: Column,
                         bucketCents: Long = 1000000L): DataFrame = {
    val cents = round(value * lit(100)).cast("long")
    val w = Window.partitionBy(col("g")).orderBy(col("c"))
    val wg = Window.partitionBy(col("g"))
    val ranked = df.select(group.as("g"), cents.as("c"))
      .withColumn("rn", row_number().over(w))
      .withColumn("n_part", count(lit(1)).over(wg))
      .withColumn("k50", expr("(n_part * 50 + 99) div 100"))
      .withColumn("k95", expr("(n_part * 95 + 99) div 100"))
    val truth = ranked.groupBy(col("g")).agg(
      count(lit(1)).as("n"),
      max(when(col("rn") === col("k50"), col("c"))).as("true_p50_cents"),
      max(when(col("rn") === col("k95"), col("c"))).as("true_p95_cents"))
    // the sketch path: bucket counts (no sort), cumulative over the
    // |buckets|-sized table, first bucket reaching each rank
    val wb = Window.partitionBy(col("g")).orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val hist = df.select(group.as("g"),
        (cents / lit(bucketCents)).cast("long").as("bucket"))
      .groupBy(col("g"), col("bucket")).agg(count(lit(1)).as("n_b"))
      .withColumn("cum", sum(col("n_b")).over(wb))
    val est = hist.join(broadcast(truth.select(col("g"), col("n"))), "g")
      .groupBy(col("g")).agg(
        min(when(col("cum") * 100 >= col("n") * 50, col("bucket")))
          .as("b50"),
        min(when(col("cum") * 100 >= col("n") * 95, col("bucket")))
          .as("b95"))
      .select(col("g"),
        ((col("b50") + 1) * bucketCents).as("est_p50_cents"),
        ((col("b95") + 1) * bucketCents).as("est_p95_cents"))
    truth.join(est, "g")
      .select(col("g"), col("n"), col("true_p50_cents"),
        col("est_p50_cents"), col("true_p95_cents"), col("est_p95_cents"))
  }

  /** EXACT global median without a global sort — the two-pass order-
    * statistic pattern (SCALE.md principle 8's missing sibling:
    * [[histogramQuantiles]] is per-group, this is the corpus-wide
    * statistic a 100 TB table can't sort for). Pass 1 aggregates bucket
    * counts (shuffle is |buckets| rows) and locates the single bucket
    * containing rank k = (n+1) div 2 plus the in-bucket offset — a
    * 1-row frame, broadcast, never collected. Pass 2 filters the scan
    * to THAT bucket (predicate pushdown) and ranks only its rows; the
    * one single-task sort is bounded by bucket width, which
    * `bucketCents` controls (narrow buckets at scale). The value at a
    * fixed rank is tie-order-independent, so the result is exact and
    * deterministic.
    */
  def exactMedian2Pass(df: DataFrame, value: Column,
                       bucketCents: Long = 1000000L): DataFrame = {
    val cents = round(value * lit(100)).cast("long")
    val v = df.select(cents.as("c"))
    val wb = Window.orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val hist = v.select((col("c") / lit(bucketCents)).cast("long").as("bucket"))
      .groupBy(col("bucket")).agg(count(lit(1)).as("n_b"))
      .withColumn("cum", sum(col("n_b")).over(wb))
    val n1 = hist.agg(max(col("cum")).as("n"))
    val target = hist.crossJoin(broadcast(n1))
      .filter(col("cum") >= expr("(n + 1) div 2"))
      .orderBy(col("bucket")).limit(1)
      .select(col("bucket"), col("n"),
        (expr("(n + 1) div 2") - (col("cum") - col("n_b"))).as("offset"))
    val wr = Window.orderBy(col("c"))
    v.join(broadcast(target),
        (col("c") / lit(bucketCents)).cast("long") === col("bucket"))
      .withColumn("rn", row_number().over(wr))
      .filter(col("rn") === col("offset"))
      .select(col("n"), col("c").as("median_cents"))
  }

  /** ROC AUC of a numeric score against a binary label via the
    * Mann-Whitney rank sum — the standard eval primitive for "does this
    * feature separate the classes" (quality filters, dedup thresholds,
    * model scores) without materializing a curve.
    *
    * Ties get average ranks. With cum = #rows strictly below a distinct
    * cents value and t = #rows at it, every member's DOUBLED average
    * rank is the integer 2*cum + t + 1, so the whole statistic stays in
    * exact integer arithmetic: AUC = (2*R_pos - n_pos*(n_pos+1)) /
    * (2*n_pos*n_neg), ONE decimal->double division, rounded 1e-6 (the
    * [[abTestReport]] convention).
    *
    * Scale shape: the shuffle reduces to the DISTINCT score domain
    * (cents values — bounded, corpus-size-independent), and the global
    * cumulative sum runs over that domain-sized table, not the corpus.
    * NULL AUC when either class is empty.
    */
  def aucRank(df: DataFrame, label: Column, metric: Column): DataFrame = {
    val big = DecimalType(38, 0)
    val cents = round(metric * lit(100)).cast("long")
    val byC = df.select(cents.as("c"), label.cast("int").cast("long").as("y"))
      .groupBy(col("c"))
      .agg(count(lit(1)).as("t"), sum(col("y")).as("p"))
    val w = Window.orderBy(col("c"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val agg = byC
      .withColumn("cum", coalesce(sum(col("t")).over(w), lit(0L)))
      .agg(
        sum(col("p")).cast(big).as("npos"),
        sum(col("t") - col("p")).cast(big).as("nneg"),
        sum(col("p").cast(big) *
          (lit(2).cast(big) * col("cum").cast(big)
            + col("t").cast(big) + lit(1).cast(big))).as("r2"))
    agg.select(
      col("npos").cast("long").as("n_pos"),
      col("nneg").cast("long").as("n_neg"),
      when(col("npos") === 0 || col("nneg") === 0, lit(null).cast("double"))
        .otherwise(round(
          (col("r2") - col("npos") * (col("npos") + lit(1).cast(big)))
            .cast("double")
            / (lit(2).cast(big) * col("npos") * col("nneg")).cast("double"),
          6)).as("auc"))
  }

  /** Two-sample Kolmogorov-Smirnov test — [[aucRank]]'s companion
    * distribution check: D = max over the value domain of
    * |ECDF_a - ECDF_b|, the standard gate for "did this feed's value
    * distribution shift between two segments/periods". With integer
    * cents, D = max |cumA*nB - cumB*nA| / (nA*nB): the max runs over an
    * EXACT DECIMAL(38,0) numerator, so the argmax value, the statistic
    * (one rounded division), and the alpha=0.05 rejection (the fixed
    * IEEE sequence 1.3581*sqrt((nA+nB)/(nA*nB)) compared before any
    * rounding) are all bit-reproducible.
    *
    * Scale: like [[aucRank]], the shuffle reduces to the DISTINCT cents
    * domain after a map-side-combined count; the cumulative and max
    * windows run over that domain, not the rows. Ties across the two
    * samples land on one domain row by construction.
    */
  def ksTest(df: DataFrame, metric: Column, sample: Column,
             a: String, b: String): DataFrame = {
    val big = DecimalType(38, 0)
    val cents = round(metric * lit(100)).cast("long")
    val byC = df.filter(sample.isin(a, b))
      .select(cents.as("c"),
        when(sample === a, lit(1L)).otherwise(lit(0L)).as("ia"))
      .groupBy(col("c"))
      .agg(sum(col("ia")).as("ta"), sum(lit(1L) - col("ia")).as("tb"))
    val wCum = Window.orderBy(col("c"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy()
    val cum = byC
      .withColumn("cum_a", sum(col("ta")).over(wCum).cast(big))
      .withColumn("cum_b", sum(col("tb")).over(wCum).cast(big))
      .withColumn("n_a", sum(col("ta")).over(wAll).cast(big))
      .withColumn("n_b", sum(col("tb")).over(wAll).cast(big))
      .withColumn("dnum", abs(col("cum_a") * col("n_b")
        - col("cum_b") * col("n_a")))
      .withColumn("mx", max(col("dnum")).over(wAll))
    val d = col("mx").cast("double") /
      (col("n_a") * col("n_b")).cast("double")
    val crit = lit(1.3581) * sqrt((col("n_a") + col("n_b")).cast("double")
      / (col("n_a") * col("n_b")).cast("double"))
    cum.filter(col("dnum") === col("mx"))
      .groupBy(col("n_a"), col("n_b"), col("mx"))
      .agg(min(col("c")).as("at_cents"))
      .select(
        col("n_a").cast("long").as("n_a"),
        col("n_b").cast("long").as("n_b"),
        col("at_cents"),
        round(d, 6).as("d_stat"),
        round(crit, 6).as("crit_05"),
        (d > crit).as("reject_05"))
  }

  /** CUPED variance-reduced A/B readout (Deng et al. 2013): adjust each
    * unit's post-period metric by its own PRE-period covariate,
    * y_adj = y - theta*(x - x_bar), theta = cov(x,y)/var(x) pooled over
    * all units. The arm split is the same hash-parity assignment as
    * [[abTestReport]]; the pre/post boundary is a caller-supplied cutoff
    * timestamp.
    *
    * Determinism: n/Σx/Σy/Σxy/Σx² and the per-arm sums accumulate as
    * exact integer cents in DECIMAL(38,0); theta, the means, and the
    * adjusted means are then a FIXED sequence of IEEE double ops
    * (identical in any engine) rounded at 1e-6. One shuffle to the unit,
    * one to the arm; the moment join is a broadcast of one row.
    */
  def cupedAdjust(df: DataFrame, unit: Column, ts: Column, metric: Column,
                  cutoff: String): DataFrame = {
    val big = DecimalType(38, 0)
    val cents = round(metric * lit(100)).cast("long")
    val perUnit = df
      .select(unit.as("u"), ts.as("ts"), cents.as("c"))
      .groupBy(col("u"))
      .agg(
        sum(when(col("ts") < lit(cutoff).cast("timestamp"), col("c"))
          .otherwise(lit(0L))).cast(big).as("x"),
        sum(when(col("ts") >= lit(cutoff).cast("timestamp"), col("c"))
          .otherwise(lit(0L))).cast(big).as("y"))
      .withColumn("arm", pmod(Shard.portableHash(col("u")), lit(2)))
    val moments = perUnit.agg(
      count(lit(1)).cast(big).as("n"),
      sum(col("x")).as("sx"), sum(col("y")).as("sy"),
      sum(col("x") * col("y")).as("sxy"),
      sum(col("x") * col("x")).as("sxx"))
    val byArm = perUnit.groupBy(col("arm")).agg(
      count(lit(1)).as("na"),
      sum(col("x")).as("sxa"), sum(col("y")).as("sya"))
    def pick(a: Int, c: String) = first(when(col("arm") === a, col(c)), ignoreNulls = true)
    val one = byArm.agg(
      pick(0, "na").as("n0"), pick(1, "na").as("n1"),
      pick(0, "sxa").cast("double").as("x0"), pick(1, "sxa").cast("double").as("x1"),
      pick(0, "sya").cast("double").as("y0"), pick(1, "sya").cast("double").as("y1"))
      .crossJoin(broadcast(moments))
    // fixed shape: theta from pooled moments, xbar global, means per arm
    val theta = (col("n").cast("double") * col("sxy").cast("double")
      - col("sx").cast("double") * col("sy").cast("double")) /
      (col("n").cast("double") * col("sxx").cast("double")
        - col("sx").cast("double") * col("sx").cast("double"))
    val xbar = col("sx").cast("double") / col("n").cast("double")
    val r6 = (c: Column) => round(c, 6)
    def adj(y: Column, x: Column, na: Column) =
      (y / na - theta * (x / na - xbar)) / lit(100.0)
    val m0 = col("y0") / col("n0") / lit(100.0)
    val m1 = col("y1") / col("n1") / lit(100.0)
    val a0 = adj(col("y0"), col("x0"), col("n0"))
    val a1 = adj(col("y1"), col("x1"), col("n1"))
    one.select(
      col("n0").as("n_control"), col("n1").as("n_treatment"),
      r6(theta).as("theta"),
      r6(m0).as("mean_control"), r6(m1).as("mean_treatment"),
      r6(a0).as("adj_control"), r6(a1).as("adj_treatment"),
      r6(a1 - a0).as("diff_adjusted"))
  }

  /** Delta-method confidence interval for a RATIO metric (revenue per
    * event, CTR, items per order) — the classic A/B trap: units are
    * users but the metric's denominator is event count, so the naive
    * per-event variance is wrong. Var(ΣY/ΣX) is taken over per-unit
    * (x_i, y_i) pairs: se² = (v_y - 2r·c_xy + r²·v_x) / (n·x̄²).
    *
    * n/Σx/Σy/Σxy/Σxx/Σyy accumulate as exact integer cents in
    * DECIMAL(38,0); r, the variances, and the ±1.96·se bounds are a
    * fixed IEEE sequence (sqrt is correctly rounded, portable) rounded
    * 1e-6. One shuffle to the unit, then a one-row reduce.
    */
  def ratioMetricCi(df: DataFrame, unit: Column, num: Column,
                    den: Column): DataFrame = {
    val big = DecimalType(38, 0)
    val perUnit = df
      .select(unit.as("u"), round(num * lit(100)).cast("long").as("yc"),
        den.cast("long").as("xc"))
      .groupBy(col("u"))
      .agg(sum(col("yc")).cast(big).as("y"),
        sum(col("xc")).cast(big).as("x"))
    val m = perUnit.agg(
      count(lit(1)).cast(big).as("n"),
      sum(col("x")).as("sx"), sum(col("y")).as("sy"),
      sum(col("x") * col("y")).as("sxy"),
      sum(col("x") * col("x")).as("sxx"),
      sum(col("y") * col("y")).as("syy"))
    val nD = col("n").cast("double")
    val sxD = col("sx").cast("double"); val syD = col("sy").cast("double")
    val r = syD / sxD / lit(100.0) // dollars per denominator unit
    val xbar = sxD / nD
    val vx = (col("sxx").cast("double") - sxD * sxD / nD) / (nD - lit(1.0))
    val vy = (col("syy").cast("double") - syD * syD / nD) / (nD - lit(1.0))
    val cxy = (col("sxy").cast("double") - sxD * syD / nD) / (nD - lit(1.0))
    val rCents = syD / sxD
    val seExpr = sqrt((vy - lit(2.0) * rCents * cxy + rCents * rCents * vx)
      / nD) / xbar / lit(100.0)
    val r6 = (c: Column) => round(c, 6)
    m.select(
      col("n").cast("long").as("n_units"),
      r6(r).as("ratio"),
      r6(seExpr).as("se"),
      r6(r - lit(1.96) * seExpr).as("ci_lo"),
      r6(r + lit(1.96) * seExpr).as("ci_hi"))
  }

  /** Deterministic Poisson bootstrap CI (the resampling scheme that
    * actually runs at fleet scale — Chamandy et al., "Estimating
    * Uncertainty for Massive Data Streams"): every unit gets, per
    * replicate b, a weight drawn from a truncated Poisson(1) via the
    * portable hash of (unit, b) against FIXED integer thresholds
    * (exp(-1)-derived literals — no runtime transcendentals), so the
    * whole resample is a pure projection: no sampling state, no
    * coordination, identical on every engine and partitioning.
    *
    * Replicate means are exact-integer ratios (Σw·y / Σw in
    * DECIMAL(38,0)), and the CI is an exact RANK over the B replicate
    * means — lo = 2nd of B=40 ascending, hi = 39th (the 2.5th/97.5th
    * percentile convention for B=40). Scale shape: the B× explosion
    * happens AFTER the per-unit reduce, so it multiplies the unit
    * table, never the corpus.
    */
  def poissonBootstrap(df: DataFrame, unit: Column, metric: Column,
                       reps: Int = 40): DataFrame = {
    val big = DecimalType(38, 0)
    val perUnit = df
      .select(unit.as("u"), round(metric * lit(100)).cast("long").as("c"))
      .groupBy(col("u")).agg(sum(col("c")).as("s"))
    val exploded = perUnit
      .withColumn("b", explode(lit((0 until reps).toArray)))
      .withColumn("h",
        pmod((col("u") * lit(131L) + col("b")) * lit(1000003L),
          lit(1000000007L)))
      .withColumn("w",
        when(col("h") < 367879444L, 0L)
          .when(col("h") < 735758887L, 1L)
          .when(col("h") < 919698609L, 2L)
          .otherwise(3L))
    val repMeans = exploded.groupBy(col("b")).agg(
      sum(col("w")).cast(big).as("nw"),
      sum(col("w") * col("s")).cast(big).as("sw"))
      // an all-zero-weight replicate (prob (1/e)^units) has no mean —
      // dropped identically on both engines; n_replicates reports it
      .filter(col("nw") > 0)
      .select(col("b"),
        (col("sw").cast("double") / col("nw").cast("double") / lit(100.0))
          .as("mean_b"))
    val w = Window.orderBy(col("mean_b"), col("b"))
    val ranked = repMeans.withColumn("rn", row_number().over(w))
    val loRank = math.max(1, (reps * 25 + 999) / 1000) + 1 // 2 for B=40
    val hiRank = reps - loRank + 1                         // 39 for B=40
    val point = perUnit.agg(count(lit(1)).cast(big).as("n"),
      sum(col("s")).cast(big).as("tot"))
    val r6 = (c: Column) => round(c, 6)
    ranked.agg(
      count(lit(1)).as("n_replicates"),
      max(when(col("rn") === loRank, col("mean_b"))).as("lo"),
      max(when(col("rn") === hiRank, col("mean_b"))).as("hi"))
      .crossJoin(broadcast(point))
      .select(col("n_replicates"),
        r6(col("tot").cast("double") / col("n").cast("double") / lit(100.0))
          .as("mean"),
        r6(col("lo")).as("ci_lo"), r6(col("hi")).as("ci_hi"))
  }

  /** Minimum detectable effect for a two-arm test at the CURRENT arm
    * sizes — the "is this experiment even worth running" readout:
    * mde = (z_{0.975} + z_{0.8}) * sqrt(var/n1 + var/n0) with the z
    * constants as literals (1.959964, 0.841621) and the pooled variance
    * from exact DECIMAL(38,0) cents moments. Arms are the same
    * hash-parity assignment as [[abTestReport]]. One sqrt, rounded 1e-6.
    */
  def powerMde(df: DataFrame, unit: Column, metric: Column): DataFrame = {
    val big = DecimalType(38, 0)
    val cents = round(metric * lit(100)).cast("long")
    val perUnit = df.select(unit.as("u"), cents.as("c"))
      .groupBy(col("u")).agg(sum(col("c")).cast(big).as("s"))
      .withColumn("arm", pmod(Shard.portableHash(col("u")), lit(2)))
    val m = perUnit.agg(
      count(lit(1)).cast(big).as("n"),
      sum(col("s")).as("sy"), sum(col("s") * col("s")).as("syy"),
      sum(when(col("arm") === 0, 1L).otherwise(0L)).as("n0"),
      sum(when(col("arm") === 1, 1L).otherwise(0L)).as("n1"))
    val nD = col("n").cast("double")
    val varPooled = (col("syy").cast("double")
      - col("sy").cast("double") * col("sy").cast("double") / nD) /
      (nD - lit(1.0)) / lit(10000.0)
    val mde = lit(2.801585) * // z_{0.975} + z_{0.8}, one literal so both
      // engines parse the identical double (no constant-fold ambiguity)
      sqrt(varPooled / col("n1") + varPooled / col("n0"))
    val r6 = (c: Column) => round(c, 6)
    m.select(col("n0"), col("n1"),
      r6(sqrt(varPooled)).as("pooled_sd"),
      r6(mde).as("mde_abs"),
      r6(mde / (col("sy").cast("double") / nD / lit(100.0)))
        .as("mde_rel"))
  }

  /** K-minimum-values (theta-style) distinct sketch with pairwise set
    * intersection — the third sketch in the family next to HLL
    * (distinct counts) and CMS (frequencies): KMV is the one that
    * supports SET OPERATIONS, estimating |A∪B| and |A∩B| from two
    * k-row summaries without ever joining the underlying sets.
    *
    * Per group, the sketch is the k smallest DISTINCT portable hashes;
    * the rank-(le-literal-k) filter compiles to WindowGroupLimit, so
    * every partition pre-prunes to its own k-mins before the exchange —
    * the mergeable-sketch behavior, enforced by the optimizer. Distinct
    * estimate: (k-1)*M/h_k (exact count when a group has fewer than k
    * distinct values). For a pair, the k smallest of the two sketches'
    * union give the union estimate, and the fraction of that k-set
    * present in both sketches scales it to the intersection. Hashes are
    * exact integers; each estimate is one division, rounded 1e-6.
    */
  def kmvSketch(df: DataFrame, group: Column, id: Column,
                k: Int = 64): DataFrame = {
    val modulus = 1000000007L
    val w = Window.partitionBy(col("g")).orderBy(col("h"))
    val sk = df.select(group.as("g"), Shard.portableHash(id).as("h"))
      .distinct()
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
    val est = sk.groupBy(col("g")).agg(
      count(lit(1)).as("kk"), max(col("h")).as("hk"))
      .select(col("g"), col("kk"),
        when(col("kk") < k, col("kk").cast("double"))
          .otherwise((col("kk") - 1).cast("double") * lit(modulus.toDouble)
            / col("hk").cast("double")).as("est"))
    // pairwise: union the two k-sets, re-take the k smallest. The pair
    // list is |groups|² rows and each union at most 2k hashes — tiny.
    val a = sk.select(col("g").as("ga"), col("h"))
    val b = sk.select(col("g").as("gb"), col("h"))
    val gs = sk.select(col("g")).distinct()
    val gPairs = gs.select(col("g").as("ga"))
      .crossJoin(gs.select(col("g").as("gb")))
      .filter(col("ga") < col("gb"))
    val pairs = gPairs.join(a, "ga").select(col("ga"), col("gb"), col("h"))
      .union(gPairs.join(b, "gb").select(col("ga"), col("gb"), col("h")))
      .distinct()
    val wp = Window.partitionBy(col("ga"), col("gb")).orderBy(col("h"))
    val unionK = pairs.withColumn("rk", row_number().over(wp))
      .filter(col("rk") <= k)
    val inA = a.withColumn("in_a", lit(1))
    val inB = b.withColumn("in_b", lit(1))
    val marked = unionK
      .join(inA, Seq("ga", "h"), "left")
      .join(inB, Seq("gb", "h"), "left")
    val byPair = marked.groupBy(col("ga"), col("gb")).agg(
      count(lit(1)).as("ku"), max(col("h")).as("hku"),
      sum(when(col("in_a") === 1 && col("in_b") === 1, 1L)
        .otherwise(0L)).as("n_both"))
    val estU = when(col("ku") < k, col("ku").cast("double"))
      .otherwise((col("ku") - 1).cast("double") * lit(modulus.toDouble)
        / col("hku").cast("double"))
    val r6 = (c: Column) => round(c, 6)
    byPair
      .join(est.select(col("g").as("ga"), col("est").as("est_a")), "ga")
      .join(est.select(col("g").as("gb"), col("est").as("est_b")), "gb")
      .select(col("ga"), col("gb"), col("n_both"),
        r6(col("est_a")).as("est_a"), r6(col("est_b")).as("est_b"),
        r6(estU).as("est_union"),
        r6(col("n_both").cast("double") / col("ku").cast("double")
          * estU).as("est_inter"))
  }

  /** Exact WEIGHTED percentiles per group — "the median order value
    * weighted by quantity" class of question, where every row counts
    * w times. Sorting happens on the DISTINCT (group, value) table
    * (weights pre-summed per value — bounded by the value domain, not
    * the row count); a running weight cumsum then picks the smallest
    * value whose cumulative weight covers p·W, entirely in integer
    * arithmetic (4·cum >= p·4·W comparisons — no division anywhere).
    */
  def weightedQuantiles(df: DataFrame, group: Column, value: Column,
                        weight: Column): DataFrame = {
    val cents = round(value * lit(100)).cast("long")
    val byVal = df.select(group.as("g"), cents.as("c"),
        weight.cast("long").as("w"))
      .groupBy(col("g"), col("c")).agg(sum(col("w")).as("wv"))
    val wc = Window.partitionBy(col("g")).orderBy(col("c"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wg = Window.partitionBy(col("g"))
    byVal
      .withColumn("cum", sum(col("wv")).over(wc))
      .withColumn("tot", sum(col("wv")).over(wg))
      .groupBy(col("g")).agg(
        max(col("tot")).as("total_weight"),
        min(when(col("cum") * 4 >= col("tot"), col("c"))).as("p25c"),
        min(when(col("cum") * 2 >= col("tot"), col("c"))).as("p50c"),
        min(when(col("cum") * 4 >= col("tot") * 3, col("c"))).as("p75c"))
      .select(col("g"), col("total_weight"),
        (col("p25c").cast("double") / lit(100.0)).as("p25"),
        (col("p50c").cast("double") / lit(100.0)).as("p50"),
        (col("p75c").cast("double") / lit(100.0)).as("p75"))
  }

  /** Stratified treatment-effect table: units are bucketed into
    * quintiles of a PRE-period covariate (deterministic rank with id
    * tiebreak), and each stratum reports its own arm means and lift —
    * the confounder-adjusted readout when randomization is suspect.
    * One row per stratum on purpose: a cross-stratum weighted ATE would
    * sum doubles in nondeterministic order; the 5-row table carries the
    * exact per-stratum pieces instead.
    */
  def propensityStrata(df: DataFrame, unit: Column, ts: Column,
                       metric: Column, cutoff: String,
                       strata: Int = 5): DataFrame = {
    val cents = round(metric * lit(100)).cast("long")
    val perUnit = df
      .select(unit.as("u"), ts.as("ts"), cents.as("c"))
      .groupBy(col("u"))
      .agg(
        sum(when(col("ts") < lit(cutoff).cast("timestamp"), col("c"))
          .otherwise(0L)).as("x"),
        sum(when(col("ts") >= lit(cutoff).cast("timestamp"), col("c"))
          .otherwise(0L)).as("y"))
      .withColumn("arm", pmod(Shard.portableHash(col("u")), lit(2)))
    val w = Window.orderBy(col("x"), col("u"))
    val wn = Window.partitionBy()
    val bucketed = perUnit
      .withColumn("rn", row_number().over(w))
      .withColumn("n_all", count(lit(1)).over(wn))
      // stratum s gets ranks (s*n)/k+1 .. ((s+1)*n)/k — integer DIV
      .withColumn("stratum",
        expr(s"(rn - 1) * ${strata}L div n_all"))
    val r6 = (c: Column) => round(c, 6)
    bucketed.groupBy(col("stratum")).agg(
      count(lit(1)).as("n"),
      sum(when(col("arm") === 0, 1L).otherwise(0L)).as("n0"),
      sum(when(col("arm") === 1, 1L).otherwise(0L)).as("n1"),
      sum(when(col("arm") === 0, col("y")).otherwise(0L)).as("sy0"),
      sum(when(col("arm") === 1, col("y")).otherwise(0L)).as("sy1"))
      .select(col("stratum"), col("n"), col("n0"), col("n1"),
        // a small stratum can hold only one arm — NULL, not a crash
        when(col("n0") === 0, lit(null).cast("double")).otherwise(
          r6(col("sy0").cast("double") / col("n0") / lit(100.0)))
          .as("mean_control"),
        when(col("n1") === 0, lit(null).cast("double")).otherwise(
          r6(col("sy1").cast("double") / col("n1") / lit(100.0)))
          .as("mean_treatment"),
        when(col("n0") === 0 || col("n1") === 0,
          lit(null).cast("double")).otherwise(
          r6(col("sy1").cast("double") / col("n1") / lit(100.0)
            - col("sy0").cast("double") / col("n0") / lit(100.0)))
          .as("diff"))
  }

  /** Whole-table column profile — the every-column complement of
    * [[profileNumeric]]: per column its row count, null count, EXACT
    * distinct count, and min/max — the first report a pipeline owner
    * pulls on an unfamiliar feed (Deequ's profiler, BigQuery's
    * `INFORMATION_SCHEMA` column stats). Callers pass each column
    * pre-normalized to an integer/date/string representation (money as
    * cents, never raw doubles) so the stringified min/max render
    * identically across engines.
    *
    * Scale: ONE scan. The multiple exact `count(DISTINCT)`s compile to
    * Catalyst's Expand — the scan is read once and each row fans out
    * k ways into the distinct aggregation, which is the irreducible
    * cost of exact per-column cardinality (swap in approx_count_distinct
    * at 100 TB if ±2% is acceptable; the report shape is unchanged).
    * Min/max/null partials combine map-side; output is k rows.
    */
  def columnProfile(df: DataFrame, cols: Seq[(String, Column)]): DataFrame = {
    require(cols.nonEmpty, "columnProfile: no columns given")
    val aggs = cols.zipWithIndex.flatMap { case ((_, c), i) =>
      Seq(sum(when(c.isNull, lit(1L)).otherwise(lit(0L))).as(s"nn_$i"),
        count_distinct(c).as(s"nd_$i"),
        min(c).cast("string").as(s"mn_$i"),
        max(c).cast("string").as(s"mx_$i"))
    } :+ count(lit(1)).as("n_rows")
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val entries = cols.zipWithIndex.map { case ((n, _), i) =>
      struct(lit(n).as("col_name"), col("n_rows"),
        col(s"nn_$i").as("n_null"), col(s"nd_$i").as("n_distinct"),
        col(s"mn_$i").as("min_s"), col(s"mx_$i").as("max_s"))
    }
    wide.select(explode(array(entries: _*)).as("p")).select("p.*")
  }

  /** Per-group bottom-k ROW sample: the k rows whose portable id hash is
    * smallest — [[kmvSketch]]'s KMV trick pointed at row identity
    * instead of distinct values, giving a uniform, partition-independent,
    * fully DETERMINISTIC sample of each group. Unlike reservoir sampling
    * (order-dependent) or `rand()` (irreproducible), the same corpus
    * always yields the same sample on any cluster layout, so a SQL
    * oracle replays it bit-for-bit. It is also MERGEABLE:
    * bottomK(A ∪ B) = bottomK(bottomK(A) ∪ bottomK(B)) — the property
    * that lets per-shard sketches combine into the global sketch without
    * rescanning ([[sketchQuantilesMerged]] executes that identity; a
    * property spec proves it).
    *
    * Scale: `k` is a literal, so the row_number filter compiles to a
    * WindowGroupLimit — each map task forwards at most k rows per group
    * to the shuffle, making per-group cost O(k) regardless of corpus
    * size (the same prune [[Shard.mixtureSample]] relies on).
    */
  private[graft] def bottomKSample(df: DataFrame, group: Column, id: Column,
                                   value: Column, k: Int): DataFrame =
    bottomKMerge(
      df.select(group.as("g"), id.as("id"), Shard.portableHash(id).as("h"),
        round(value * lit(100)).cast("long").as("c")), k)

  /** Approximate per-group quantiles from the [[bottomKSample]] sketch:
    * exact integer-rank order statistics OF THE SAMPLE (the
    * [[weightedQuantiles]] `4·i >= n` comparisons — no interpolation, no
    * division), reported beside the sample size. Rank error is the
    * binomial sampling error ~ sqrt(q(1−q)/k); k=256 puts 3σ under ±0.1
    * of rank — the "is p95 latency roughly 40 or roughly 400" class of
    * answer a 100 TB scan can produce from k rows per group. Groups
    * smaller than k are retained whole, so their quantiles are EXACT.
    */
  def sketchQuantiles(df: DataFrame, group: Column, id: Column,
                      value: Column, k: Int = 256): DataFrame =
    quantilesOfSample(bottomKSample(df, group, id, value, k))

  /** Re-take the k smallest (h, id) per group from a union of bottom-k
    * samples — the KMV merge step, shared by the sharded batch variant
    * and the streaming maintenance loop. */
  private[graft] def bottomKMerge(sample: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy(col("g")).orderBy(col("h").asc, col("id").asc)
    sample.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .drop("rk")
  }

  private[graft] def quantilesOfSample(sample: DataFrame): DataFrame = {
    val ws = Window.partitionBy(col("g")).orderBy(col("c").asc, col("id").asc)
    val wg = Window.partitionBy(col("g"))
    sample
      .withColumn("i", row_number().over(ws).cast("long"))
      .withColumn("n", count(lit(1)).over(wg))
      .groupBy(col("g")).agg(
        max(col("n")).as("sample_n"),
        min(when(col("i") * 4 >= col("n"), col("c"))).as("p25c"),
        min(when(col("i") * 2 >= col("n"), col("c"))).as("p50c"),
        min(when(col("i") * 4 >= col("n") * 3, col("c"))).as("p75c"),
        min(when(col("i") * 20 >= col("n") * 19, col("c"))).as("p95c"))
      .select(col("g"), col("sample_n"),
        (col("p25c").cast("double") / lit(100.0)).as("p25"),
        (col("p50c").cast("double") / lit(100.0)).as("p50"),
        (col("p75c").cast("double") / lit(100.0)).as("p75"),
        (col("p95c").cast("double") / lit(100.0)).as("p95"))
  }

  /** The merge path: build an independent bottom-k sketch per
    * (group, shard) — as per-source or per-day ingest would — then
    * combine shard sketches by re-taking the k smallest hashes of their
    * union. By the KMV merge identity the result EQUALS the global
    * sketch, so this op registers against the SAME oracle SQL as
    * [[sketchQuantiles]]: the green hash-match is the mergeability
    * proof, executed. At 100 TB this is the incremental shape — each
    * ingest batch contributes a k-row sketch; history is never
    * rescanned, and the merge input is |shards|·k rows per group.
    */
  def sketchQuantilesMerged(df: DataFrame, group: Column, id: Column,
                            value: Column, k: Int = 256,
                            shards: Int = 4): DataFrame = {
    val wShard = Window.partitionBy(col("g"), col("shard"))
      .orderBy(col("h").asc, col("id").asc)
    val perShard = df
      .select(group.as("g"), id.as("id"), Shard.portableHash(id).as("h"),
        round(value * lit(100)).cast("long").as("c"))
      .withColumn("shard", pmod(col("id"), lit(shards)))
      .withColumn("rk", row_number().over(wShard))
      .filter(col("rk") <= k)
      .drop("rk", "shard")
    quantilesOfSample(bottomKMerge(perShard, k))
  }
}
