package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus sharding and split assignment — the operators that decide
  * WHERE each training example lives: train/val/test membership, shard
  * files, and a deterministic global shuffle of the training order. All
  * pure integer arithmetic (the same portable multiplicative hash as the
  * sampling ops) — reproducible across runs, partitionings, and engines;
  * never `rand()`.
  */
object Shard {

  /** The engine's portable row hash: exact 64-bit integer arithmetic,
    * identical in Spark and any ANSI SQL oracle. A production id domain
    * would use a 64-bit mixer (splitmix64) — same shape, wider constants.
    */
  def portableHash(id: Column): Column = pmod(id * lit(1000003L), lit(1000000007L))

  /** Deterministic train/val/test assignment by hash percentile:
    * pct < trainPct → train, < trainPct+valPct → val, else test. A
    * document's split NEVER changes as the corpus grows (membership
    * depends only on its own id), which is the property that keeps eval
    * sets stable across dataset versions. Pure projection — no shuffle.
    */
  def splitAssign(df: DataFrame, id: Column,
                  trainPct: Int = 80, valPct: Int = 10): DataFrame =
    df.withColumn("split", splitCol(id, trainPct, valPct))

  /** The split label as a pure Column (no join needed to recover a
    * document's split — membership is a function of its id alone).
    */
  def splitCol(id: Column, trainPct: Int = 80, valPct: Int = 10): Column = {
    val pct = pmod(portableHash(id), lit(100))
    when(pct < trainPct, "train")
      .when(pct < trainPct + valPct, "val")
      .otherwise("test")
  }

  /** Mixture sampling: take the first `quota` rows per stratum in
    * deterministic hash order — how a training mix hits per-source
    * weights ("50% web, 30% code, 20% books") reproducibly. `quota` is a
    * per-row Column so callers derive it from the stratum itself (weight
    * tables join in upstream). One shuffle on the stratum.
    *
    * Spark's WindowGroupLimit prune only fires on a LITERAL rank bound —
    * a Column quota alone would fully materialize every stratum's
    * window. `maxQuota` (an upper bound across all strata) is planted as
    * a literal conjunct so the prune applies: each stratum's window
    * carries at most `maxQuota` rows through sort/spill, and the exact
    * per-row quota filter then trims within that bound. ShardSpec
    * asserts WindowGroupLimit is in the plan.
    */
  def mixtureSample(df: DataFrame, stratum: Column, id: Column,
                    quota: Column, maxQuota: Option[Int] = None): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(stratum).orderBy(portableHash(id).asc, id.asc)
    val ranked = df.withColumn("rn", row_number().over(w))
    maxQuota.fold(ranked.filter(col("rn") <= quota)) { mq =>
      ranked.filter(col("rn") <= lit(mq) && col("rn") <= quota)
    }.drop("rn")
  }

  /** Temperature-based stratum rebalancing — the standard multilingual
    * corpus sampler: stratum quotas proportional to n^alpha (alpha < 1
    * upsamples the tail relative to the head; alpha = 0.5 is the classic
    * sqrt-temperature mix), filled in deterministic hash order.
    * `budget` rows total; quota_s = floor(budget * n_s^alpha / sum).
    *
    * Arithmetic contract: alpha is fixed at 0.5 because IEEE `sqrt` is
    * exactly specified (a general `pow` is libm-dependent and would
    * break cross-engine verification), and the normalizing sum folds the
    * per-stratum terms in STRATUM ORDER over a collected array — never a
    * partition-order float sum. Stratum counts are one aggregation
    * (stratum-cardinality rows, broadcast back); selection reuses the
    * literal-bounded window prune when `budget` caps any one stratum.
    */
  def temperatureSample(df: DataFrame, stratum: Column, id: Column,
                        budget: Int): DataFrame = {
    val counts = df.groupBy(stratum.as("s")).agg(count(lit(1)).as("n_s"))
    val quotas = counts
      .agg(array_sort(collect_list(struct(col("s"), col("n_s")))).as("arr"))
      .select(col("arr"),
        aggregate(col("arr"), lit(0.0),
          (acc, x) => acc + sqrt(x("n_s").cast("double"))).as("z"))
      .select(explode(col("arr")).as("e"), col("z"))
      .select(col("e.s").as("s"), col("e.n_s").as("n_s"),
        floor(lit(budget.toDouble) * sqrt(col("n_s").cast("double")) / col("z"))
          .cast("long").as("quota"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("s")).orderBy(portableHash(col("id")).asc, col("id").asc)
    df.select(stratum.as("s"), id.as("id"))
      .withColumn("rn", row_number().over(w))
      // literal budget bound lets WindowGroupLimit prune; the exact
      // per-stratum quota then trims within it
      .filter(col("rn") <= lit(budget))
      .join(broadcast(quotas), "s")
      .filter(col("rn") <= col("quota"))
      .select(col("s"), col("id"), col("quota"))
  }

  /** Sequence packing for training: assign documents to fixed
    * token-budget bins by PREFIX-SUM partitioning, per shard. Docs order
    * by the portable hash within their shard (a reproducible
    * pseudo-random permutation), the running token total is a per-shard
    * window cumsum, and bin = floor(cumsum_before / budget) with
    * bin_offset = cumsum_before − bin·budget. A doc may straddle a bin
    * boundary — training loaders handle the tail by truncation/padding;
    * what matters at 100 TB is that packing is ONE parallel window pass
    * (shards pack independently), not the greedy sequential fill a
    * single-machine packer would do. Output:
    * (doc_id, shard, n_tokens, bin, bin_offset).
    */
  def packSequences(df: DataFrame, id: Column, tokens: Column,
                    nShards: Int, budget: Long): DataFrame = {
    val h = portableHash(id)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard")).orderBy(col("h"), col("doc_id"))
      .rowsBetween(Long.MinValue, -1)
    df.select(id.as("doc_id"), tokens.cast("long").as("n_tokens"),
        h.as("h"))
      .withColumn("shard", pmod(col("h"), lit(nShards)))
      .withColumn("cum_before", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      // integer DIV, not `/` (which is double division on longs)
      .select(col("doc_id"), col("shard"), col("n_tokens"),
        expr(s"cum_before DIV ${budget}L").as("bin"),
        pmod(col("cum_before"), lit(budget)).as("bin_offset"))
  }

  /** Quality-weighted corpus sampling: keep each row with probability
    * proportional to a per-row score in [0, 1] — the standard curation
    * move that UPSAMPLES high-quality documents into a training mix —
    * decided DETERMINISTICALLY: keep iff
    * `portableHash(id) mod granularity < floor(score · granularity)`.
    * Membership is a pure function of (id, own score): reproducible
    * across runs and partitionings, stable as the corpus grows (the
    * [[splitCol]] property), zero shuffles — a filter at scan speed.
    * Score doubles are fixed-shape arithmetic (see
    * [[graft.ops.Text.qualityScore]]), so `floor` lands identically in
    * any engine and the sample itself is oracle-verifiable.
    */
  def qualityWeightedSample(scored: DataFrame, id: Column, score: Column,
                            granularity: Int = 1000): DataFrame =
    scored.filter(
      pmod(portableHash(id), lit(granularity.toLong)) <
        floor(score * granularity).cast("long"))

  /** Per-stratum quality cut: keep the top `keepPct`% of rows within
    * each stratum by score — the per-domain curation rule ("retain each
    * domain's best quarter") that a GLOBAL score threshold cannot
    * express, because score distributions differ wildly across sources
    * and a global cut would empty the weakest domain entirely. The keep
    * decision is exact integer arithmetic on window ranks
    * (`rn · 100 ≤ n · keepPct`, i.e. floor(n·pct/100) rows survive), so
    * it is engine-portable with no float percentile anywhere; the score
    * ordering is made total with an id tiebreak. Cost: ONE hash
    * exchange on the stratum — both window frames (rank and partition
    * count) ride the same partitioning. At 100 TB a skewed stratum is
    * the usual hazard; here the window holds rank counters, not row
    * buffers, and a giant domain just means a long sorted run.
    */
  def qualityTopCut(df: DataFrame, stratum: Column, score: Column,
                    id: Column, keepPct: Int = 25): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(stratum).orderBy(score.desc, id.asc)
    val wAll = org.apache.spark.sql.expressions.Window.partitionBy(stratum)
    df.withColumn("__rn", row_number().over(w))
      .withColumn("__n", count(lit(1)).over(wAll))
      .filter(col("__rn") * lit(100L) <= col("__n") * lit(keepPct.toLong))
      .drop("__rn", "__n")
  }

  /** Deterministic global shuffle + sharding for training order: shard =
    * hash mod nShards, position = rank of (hash, id) within the shard.
    * One hash-partition exchange + per-shard sort — never a global sort.
    * At 100 TB each shard writes one file sequence and readers stream
    * shards independently; the (hash, id) order is a reproducible
    * pseudo-random permutation of the corpus.
    */
  def corpusShuffle(df: DataFrame, id: Column, nShards: Int): DataFrame = {
    val h = portableHash(id)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard")).orderBy(col("h"), id)
    df.withColumn("h", h)
      .withColumn("shard", pmod(col("h"), lit(nShards)))
      .withColumn("pos", row_number().over(w).cast("long"))
      .drop("h")
  }

  /** Release manifest for the shards [[corpusShuffle]] writes — the
    * metadata file a corpus release ships next to the data so a reader
    * can verify every shard before training: per shard, doc/token/char
    * counts, the doc_id range, and an order-independent content
    * checksum (the SUM of [[graft.ops.Text.fingerprintCol]] per doc —
    * each fingerprint < 1e9+7, so the exact BIGINT sum holds to ~9e9
    * docs per shard). Same `shard = portableHash mod nShards` rule as
    * corpusShuffle, so the manifest describes exactly those shards.
    *
    * Scale: one corpus scan into an |nShards|-row aggregate, fully
    * map-side combinable; nothing but the final tiny table shuffles.
    * A corrupted/truncated/reordered shard shows up as a count or
    * checksum mismatch; order-independence means the checksum can be
    * recomputed from any partitioning of the shard's files.
    */
  def shardManifest(docs: DataFrame, nShards: Int = 16): DataFrame =
    docs.select(
        pmod(portableHash(col("doc_id")), lit(nShards.toLong)).as("shard"),
        col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("toks"),
        length(col("text")).cast("long").as("chars"),
        graft.ops.Text.fingerprintCol(col("text")).as("fp"))
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("toks")).as("n_tokens"),
        sum(col("chars")).as("n_chars"),
        min(col("doc_id")).as("min_doc_id"),
        max(col("doc_id")).as("max_doc_id"),
        sum(col("fp")).as("checksum"))

  /** Deterministic weight-proportional sampling without replacement
    * (priority sampling, Duffield et al.): each row's priority is
    * w / u for a hash-derived uniform u, and the k highest-priority
    * rows are the sample — heavier rows proportionally more likely,
    * identical selection on every run and engine.
    *
    * The classic Efraimidis-Spirakis key u^(1/w) needs a transcendental
    * (pow/ln) whose last-ulp behavior is libm-specific, so ORDERING by
    * it is not portable. Priority sampling needs only
    * w * 1e6 / (hash+1): two IEEE-exact double ops with bit-identical
    * results in any engine, so the induced order (and the sample) is
    * exactly reproducible; ties broken by id. The global top-k is a
    * per-partition top-k + k-row merge (TakeOrderedAndProject), never a
    * full sort — the 100-TB shape.
    *
    * The output carries the exact integer hash, NOT the priority: a
    * priority near w*1e6 can need >15 significant digits, where decimal
    * ROUNDING of a double is engine-specific even though the double
    * itself (and thus the order — verified by the emitted ranks) is
    * bit-identical. Everything emitted is integer-exact.
    */
  /** Rendezvous (highest-random-weight) sharding with a resharding
    * impact report: each key goes to the shard maximizing a portable
    * hash of (key, shard), so growing the fleet from `nOld` to `nNew`
    * shards moves ONLY the keys whose new shard wins their old argmax —
    * ~1/nNew of them — instead of the (nNew−1)/nNew a mod-N scheme
    * reshuffles. Returns the (old_shard, new_shard) movement matrix
    * with exact counts.
    *
    * Both assignments are computed per row with array higher-order
    * functions (argmax = array_max over (weight, shard) structs — no
    * explode, no per-key shuffle); the only exchange is the final
    * matrix-sized aggregation. Ties break to the higher shard via the
    * struct's second field, identically on any engine.
    *
    * The weight must be NONLINEAR in the shard index: a first cut used
    * (k·31 + s)·1000003 mod M, which is linear in s, so the newest
    * shard's weight was almost always the running maximum and ~99% of
    * keys "moved" — the opposite of the rendezvous property. Squaring
    * mod M breaks the linearity (measured movement ≈ 1/nNew).
    */
  def rendezvousHash(df: DataFrame, id: Column, nOld: Int = 8,
                     nNew: Int = 9): DataFrame = {
    def weightOf(s: Column): Column = {
      val x = pmod(id * lit(1000003L) + s * lit(7919L) + lit(13L),
        lit(1000000007L))
      pmod(x * x, lit(1000000007L))
    }
    def argmax(n: Int): Column =
      array_max(transform(sequence(lit(0L), lit(n.toLong - 1)),
        s => struct(weightOf(s).as("w"), s.as("s")))).getField("s")
    df.select(argmax(nOld).as("old_shard"), argmax(nNew).as("new_shard"))
      .groupBy(col("old_shard"), col("new_shard"))
      .agg(count(lit(1)).as("n"))
      .withColumn("moved", col("old_shard") =!= col("new_shard"))
  }

  /** Purged k-fold temporal cross-validation report (López de Prado,
    * Advances in Financial ML §7) — the CV scheme for serially-
    * correlated data, where [[splitCol]]'s id-hash split LEAKS: a row
    * one tick after a test-fold boundary carries the fold's
    * information into train. Rows land in K contiguous day folds;
    * train for fold f excludes the fold AND an `embargoDays` halo on
    * both sides. Output, one row per fold: the fold's day span,
    * n_test, n_purged (halo rows barred from train — the price of the
    * guarantee, reported so it is auditable), n_train, and the
    * partition identity n_test + n_purged + n_train = n_total the
    * spec asserts.
    *
    * Determinism: day indexes and fold ids are pure integer floor
    * arithmetic from the global [min, max] day span (no quantile
    * cuts); every count is exact.
    *
    * Scale: one map-side-combined aggregate to the (fold, day)-bounded
    * count table, a 1-row bounds broadcast, and a K-row broadcast
    * range join over that table — nothing after the first aggregate is
    * feed-sized.
    */
  def purgedKfold(df: DataFrame, ts: Column, k: Int = 5,
                  embargoDays: Int = 3): DataFrame = {
    require(k >= 2, s"purgedKfold: need k >= 2, got $k")
    val days = df.select(ts.cast("date").as("day"))
      .filter(col("day").isNotNull)
      .groupBy(col("day")).agg(count(lit(1)).as("n"))
    val bounds = days.agg(min(col("day")).as("d0"), max(col("day")).as("d1"),
      sum(col("n")).as("n_total"))
    val byDay = days.crossJoin(broadcast(bounds))
      .select(datediff(col("day"), col("d0")).as("d"),
        (datediff(col("d1"), col("d0")) + 1).as("span"),
        col("n"), col("n_total"))
      .withColumn("fold", expr(s"least(d * $k div span, ${k - 1})"))
    val folds = byDay.groupBy(col("fold"))
      .agg(min(col("d")).as("d_lo"), max(col("d")).as("d_hi"),
        sum(col("n")).as("n_test"))
    byDay.join(broadcast(folds.select(col("fold").as("f"),
        col("d_lo"), col("d_hi"), col("n_test"))),
        col("d") >= col("d_lo") - embargoDays &&
        col("d") <= col("d_hi") + embargoDays)
      .groupBy(col("f").as("fold"), col("d_lo"), col("d_hi"),
        col("n_test"), col("n_total"))
      .agg(sum(col("n")).as("n_excluded"))
      .select(col("fold"), col("d_lo"), col("d_hi"), col("n_test"),
        (col("n_excluded") - col("n_test")).as("n_purged"),
        (col("n_total") - col("n_excluded")).as("n_train"))
  }

  def weightedSample(df: DataFrame, id: Column, weight: Column,
                     k: Int = 200): DataFrame = {
    val cents = round(weight * lit(100)).cast("long")
    val pr = cents.cast("double") * lit(1000000.0) /
      (portableHash(id) + lit(1L)).cast("double")
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("priority").desc, col("id").asc)
    df.select(id.as("id"), cents.as("w_cents"), pr.as("priority"),
        (portableHash(id) + lit(1L)).as("u_hash"))
      .orderBy(col("priority").desc, col("id").asc)
      .limit(k)
      .withColumn("rk", row_number().over(w).cast("long"))
      .select(col("rk"), col("id"), col("w_cents"), col("u_hash"))
  }
}
