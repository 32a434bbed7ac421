package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Model-evaluation operators: the metrics a training-data pipeline
  * computes over its own retrieval / classification / scoring stages
  * before shipping a corpus or a model. The reference pipeline stops
  * at loading cleaned rows (`/root/reference/pipeline/data_pipeline
  * .py:242`); a production pipeline then grades what it built —
  * ranking quality (NDCG), lift/gains, confusion cells, independence
  * tests, calibration — and those gates are this surface.
  *
  * Exactness discipline (see OPERATORS.md): every metric is integer /
  * rational until one final division, so the driver's stringify-hash
  * compare against DuckDB is bit-stable. Transcendental-derived
  * constants (the 1/log2(i+1) DCG gains) are pre-scaled to integer
  * literals by ONE Scala computation that also generates the oracle
  * SQL — both engines consume identical literals, never their own
  * log2.
  */
object Eval {

  /** Scaled DCG gain table: gain(i) = round(1e6 / log2(i+1)) for
    * 1-based rank i. Computed once here; the oracle generator embeds
    * the same literals, so cross-engine log2 ulps cannot matter.
    */
  def gainScaled(k: Int): Seq[Long] =
    (1 to k).map(i => math.round(1e6 / (math.log(i + 1.0) / math.log(2.0))))

  /** cumGain(k)(m) = ideal DCG of m relevant items at ranks 1..m. */
  def cumGainScaled(k: Int): Seq[Long] =
    gainScaled(k).scanLeft(0L)(_ + _)

  /** NDCG@k of the exact-cosine retrieval stage, relevance = label
    * match — the standard grade for the [[Similarity.knnClassify]] /
    * [[Similarity.ivfTopK]] family. For each probe (a deterministic
    * `vec_id % sampleMod` slice), rank the corpus by exact cosine
    * (ties by neighbor id), mark the top-k relevant where the
    * neighbor's label equals the probe's, and score
    * DCG = Σ rel_i · gain(i) against the ideal
    * IDCG = Σ_{i≤min(k,R)} gain(i) with R = |corpus with the probe's
    * label| − 1 (the probe itself is excluded from candidates).
    *
    * Determinism: gains are integer literals from [[gainScaled]];
    * DCG/IDCG are integer sums; NDCG is ONE division of exact
    * integers rounded at 1e-6. The cosine ordering reuses the
    * left-fold dot product that is bit-identical across engines
    * (the [[Similarity.knnClassify]] precedent).
    *
    * Scale: probes are broadcast (raise `sampleMod` to keep them so);
    * the corpus is streamed once through the crossJoin — no
    * corpus×corpus pair space. For an all-probes run swap the
    * candidate generator to the IVF centroid equi-join; the scoring
    * stages are unchanged.
    */
  def ndcgEval(embeddings: DataFrame, sampleMod: Int = 25,
               k: Int = 5): DataFrame = {
    val gains = gainScaled(k)
    val cums = cumGainScaled(k)
    val q = Par.widen(embeddings.filter(col("vec_id") % sampleMod === 0))
      .select(col("vec_id").as("q_id"), col("label").as("true_label"),
        col("embedding").cast("array<double>").as("qv"))
      .withColumn("qn", Similarity.norm(col("qv")))
    val c = Par.widen(embeddings)
      .select(col("vec_id").as("n_id"), col("label").as("n_label"),
        col("embedding").cast("array<double>").as("cv"))
      .withColumn("cn", Similarity.norm(col("cv")))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("sim").desc, col("n_id").asc)
    val topk = broadcast(q).crossJoin(c)
      .filter(col("q_id") =!= col("n_id"))
      .withColumn("sim",
        Similarity.cosine(col("qv"), col("cv"), col("qn"), col("cn")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
    val rel = when(col("n_label") === col("true_label"), lit(1L))
      .otherwise(lit(0L))
    val gainArr = array(gains.map(lit): _*)
    val perQ = topk
      .withColumn("rel", rel)
      .withColumn("gain",
        col("rel") * element_at(gainArr, col("rank").cast("int")))
      .groupBy(col("q_id"), col("true_label"))
      .agg(sum(col("rel")).as("hits"), sum(col("gain")).as("dcg_scaled"))
    val labelCnt = embeddings.groupBy(col("label"))
      .agg(count(lit(1)).as("cnt"))
    val cumArr = array(cums.map(lit): _*)
    perQ.join(broadcast(labelCnt), col("true_label") === col("label"))
      .withColumn("m", least(lit(k.toLong), col("cnt") - 1))
      .withColumn("idcg_scaled",
        element_at(cumArr, (col("m") + 1).cast("int")))
      .select(col("q_id"), col("true_label"), col("hits"),
        col("dcg_scaled"), col("idcg_scaled"),
        when(col("idcg_scaled") > 0,
          round(col("dcg_scaled").cast("double") /
            col("idcg_scaled").cast("double"), 6))
          .otherwise(lit(null).cast("double")).as("ndcg"))
  }

  /** Oracle SQL for [[ndcgEval]], generated from the SAME gain
    * literals (the generated-oracle convention: one definition feeds
    * both engines).
    */
  def ndcgOracleSql(sampleMod: Int = 25, k: Int = 5): String = {
    val gains = gainScaled(k)
    val cums = cumGainScaled(k)
    val gainCase = gains.zipWithIndex
      .map { case (g, i) => s"WHEN ${i + 1} THEN $g" }.mkString(" ")
    val cumCase = cums.zipWithIndex
      .map { case (cg, m) => s"WHEN $m THEN $cg" }.mkString(" ")
    s"""WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v
               FROM embeddings),
        topk AS (
          SELECT q.vec_id AS q_id, q.label AS true_label,
                 c.label AS n_label,
                 row_number() OVER (PARTITION BY q.vec_id
                   ORDER BY list_cosine_similarity(q.v, c.v) DESC,
                            c.vec_id ASC) AS rank
          FROM e q JOIN e c ON q.vec_id <> c.vec_id
          WHERE q.vec_id % $sampleMod = 0
          QUALIFY rank <= $k),
        g AS (SELECT q_id, true_label,
                CAST(sum(CASE WHEN n_label = true_label THEN 1 ELSE 0 END)
                  AS BIGINT) AS hits,
                CAST(sum(CASE WHEN n_label = true_label
                  THEN CASE rank $gainCase ELSE 0 END ELSE 0 END)
                  AS BIGINT) AS dcg_scaled
              FROM topk GROUP BY 1, 2),
        lc AS (SELECT label, count(*) AS cnt FROM embeddings GROUP BY 1),
        j AS (SELECT q_id, true_label, hits, dcg_scaled,
                CAST(CASE least($k, cnt - 1) $cumCase END AS BIGINT)
                  AS idcg_scaled
              FROM g JOIN lc ON g.true_label = lc.label)
      SELECT q_id, true_label, hits, dcg_scaled, idcg_scaled,
        CASE WHEN idcg_scaled > 0
          THEN round(CAST(dcg_scaled AS DOUBLE)
                   / CAST(idcg_scaled AS DOUBLE), 6) END AS ndcg
      FROM j"""
  }

  /** Decile lift / gains table: rank scoring units by a model score
    * (here: per-user activity), cut into `nBuckets` equal-population
    * buckets, and report each bucket's positive rate, cumulative
    * capture, and lift over the base rate — the standard "is the
    * score worth acting on" readout for targeting / curation models.
    *
    * Determinism: the ranking is a TOTAL order (score desc, unit
    * asc); bucket ids are integer arithmetic ((rn−1)·B div N); every
    * rate is exact integers divided once and rounded 1e-6.
    *
    * Scale: one shuffle to the unit grain, then a single global sort
    * for ranks. At corpus scale replace the exact global sort with
    * range partitioning on the score histogram (the [[Shard]]
    * discipline) — bucket populations stay within one part of equal;
    * the per-bucket stage is unchanged.
    */
  def decileLift(events: DataFrame, unit: Column, positive: Column,
                 nBuckets: Int = 10): DataFrame = {
    val perUser = events
      .select(unit.as("u"), when(positive, lit(1L)).otherwise(lit(0L))
        .as("pos1"))
      .groupBy(col("u"))
      .agg(count(lit(1)).as("score"), max(col("pos1")).as("pos"))
    val wRank = Window.orderBy(col("score").desc, col("u").asc)
    val wAll = Window.partitionBy()
    val ranked = perUser
      .withColumn("rn", row_number().over(wRank))
      .withColumn("n_units", count(lit(1)).over(wAll))
    val byBucket = ranked
      .withColumn("decile",
        expr(s"((rn - 1) * $nBuckets) div n_units"))
      .groupBy(col("decile"))
      .agg(count(lit(1)).as("n_units"), sum(col("pos")).as("positives"))
    val wCum = Window.orderBy(col("decile"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    byBucket
      .withColumn("tot_pos", sum(col("positives")).over(wAll))
      .withColumn("tot_units", sum(col("n_units")).over(wAll))
      .withColumn("cum_pos", sum(col("positives")).over(wCum))
      .select(col("decile"), col("n_units"), col("positives"),
        round(col("positives").cast("double") /
          col("n_units").cast("double"), 6).as("pos_rate"),
        round(col("cum_pos").cast("double") /
          col("tot_pos").cast("double"), 6).as("cum_capture"),
        round((col("positives") * col("tot_units")).cast("double") /
          (col("n_units") * col("tot_pos")).cast("double"), 6).as("lift"))
  }

  /** Confusion cells of the kNN label vote ([[Similarity.knnClassify]]
    * is the prediction stage): per (true, predicted) pair the cell
    * count plus the class row/column totals, and the per-cell
    * precision (n / pred_total) and recall (n / true_total) — the
    * diagonal rows carry the per-class P/R.
    *
    * Determinism: counts are exact; P/R are one integer division
    * rounded 1e-6. Scale: the classification stage dominates (see
    * knnClassify's note); this stage shuffles only (true, pred)
    * pairs — at most |labels|² rows.
    */
  def confusionMatrix(embeddings: DataFrame, sampleMod: Int = 25,
                      k: Int = 5): DataFrame = {
    val preds = Similarity.knnClassify(embeddings, sampleMod, k)
    val cells = preds.groupBy(col("true_label"), col("pred_label"))
      .agg(count(lit(1)).as("n"))
    val wt = Window.partitionBy(col("true_label"))
    val wp = Window.partitionBy(col("pred_label"))
    cells
      .withColumn("true_total", sum(col("n")).over(wt))
      .withColumn("pred_total", sum(col("n")).over(wp))
      .select(col("true_label"), col("pred_label"), col("n"),
        col("true_total"), col("pred_total"),
        round(col("n").cast("double") / col("pred_total").cast("double"), 6)
          .as("precision"),
        round(col("n").cast("double") / col("true_total").cast("double"), 6)
          .as("recall"))
  }

  /** Pearson chi-squared independence cells between a bucketed
    * numeric feature and a label — the hypothesis-test companion to
    * [[Features.featureMi]] (same $50 bucketing so the two screens
    * read off the same contingency table). Emits one row per cell
    * with the observed count, the margins, the expected count, and
    * the cell's chi² term ((o·n − r·c)² / (r·c·n)); per-cell rows
    * because a cross-row fold of the term doubles would be
    * order-dependent (the featureMi lesson).
    *
    * Determinism: margins are exact integer window sums; the term's
    * numerator is squared in DECIMAL(38,0) — (o·n − r·c) reaches
    * ~1e11 at sf0.1 and its square overflows a long — and the single
    * division is rounded 1e-6. Scale: one shuffle to cell grain
    * (≤ labels × buckets rows), margins by window over that tiny
    * frame.
    */
  def chi2Independence(df: DataFrame, feature: Column, label: Column,
                       bucketCents: Long = 5000L,
                       maxBucket: Int = 5): DataFrame = {
    val cents = round(feature * lit(100)).cast("long")
    val cells = df
      .select(least((cents / lit(bucketCents)).cast("long"),
          lit(maxBucket.toLong)).as("bucket"),
        label.as("label"))
      .groupBy(col("bucket"), col("label"))
      .agg(count(lit(1)).as("observed"))
    val wb = Window.partitionBy(col("bucket"))
    val wl = Window.partitionBy(col("label"))
    val wAll = Window.partitionBy()
    val big = DecimalType(38, 0)
    val d = (col("observed") * col("n_all") -
      col("row_total") * col("col_total")).cast(big)
    cells
      .withColumn("row_total", sum(col("observed")).over(wl))
      .withColumn("col_total", sum(col("observed")).over(wb))
      .withColumn("n_all", sum(col("observed")).over(wAll))
      .select(col("label"), col("bucket"), col("observed"),
        col("row_total"), col("col_total"), col("n_all"),
        round((col("row_total") * col("col_total")).cast("double") /
          col("n_all").cast("double"), 6).as("expected"),
        round((d * d).cast("double") /
          (col("row_total").cast(big) * col("col_total").cast(big) *
            col("n_all").cast(big)).cast("double"), 6).as("chi2_term"))
  }

  /** Calibration (reliability) bins of a rational score against a
    * binary outcome: score = clicks/events per user, outcome = did
    * the user purchase. Bins are exact integer arithmetic
    * (min(10·clicks div events, B−1)), so no float boundary can land
    * a user in different bins across engines; the bin's mean
    * predicted score is recovered from Σ(clicks·1e6 div events) —
    * an integer per user, summed exactly — so the fold order of the
    * per-user rationals cannot matter either.
    *
    * Scale: one shuffle to the user grain, one to the B-row bin
    * grain. The well-calibrated readout is pos_rate ≈ mean_pred per
    * bin.
    */
  def calibrationBins(events: DataFrame, unit: Column, scoreEvent: Column,
                      positive: Column, nBins: Int = 10): DataFrame = {
    val perUser = events
      .select(unit.as("u"),
        when(scoreEvent, lit(1L)).otherwise(lit(0L)).as("s1"),
        when(positive, lit(1L)).otherwise(lit(0L)).as("pos1"))
      .groupBy(col("u"))
      .agg(sum(col("s1")).as("clicks"), count(lit(1)).as("total"),
        max(col("pos1")).as("pos"))
      .withColumn("bin",
        least(expr(s"(clicks * $nBins) div total"), lit(nBins - 1L)))
      .withColumn("pred_scaled", expr("(clicks * 1000000) div total"))
    perUser.groupBy(col("bin"))
      .agg(count(lit(1)).as("n_units"), sum(col("pos")).as("positives"),
        sum(col("pred_scaled")).as("sum_pred_scaled"))
      .select(col("bin"), col("n_units"), col("positives"),
        round(col("sum_pred_scaled").cast("double") /
          col("n_units").cast("double") / lit(1e6), 6).as("mean_pred"),
        round(col("positives").cast("double") /
          col("n_units").cast("double"), 6).as("pos_rate"))
  }

  /** Kendall's τ between two rankings of the same items — the exact
    * rank-correlation a fusion pipeline inspects BEFORE trusting RRF
    * (near-identical rankers make fusion pointless; anti-correlated
    * ones make it noise). Inputs are (id, rank) tables; only items in
    * BOTH rankings participate (the RBO-style conjoint restriction).
    * Concordant/discordant pair counts are exact integers over the
    * C(n,2) pairs of the (small, top-k) common set; with distinct ranks
    * there are no ties, so τ = (C − D) / (n(n−1)/2) is ONE division of
    * exact longs. Output: one row (n_common, concordant, discordant,
    * tau).
    *
    * Scale: the pair self-join is over the top-k COMMON set (≤ k²/2
    * pairs) — rank lists, not the corpus; the corpus cost is whatever
    * produced the rankings.
    */
  def kendallTau(a: DataFrame, b: DataFrame): DataFrame = {
    val common = a.select(col("id"), col("rank").as("ra"))
      .join(b.select(col("id"), col("rank").as("rb")), "id")
    val l = common.select(col("id").as("id_l"), col("ra").as("ra_l"),
      col("rb").as("rb_l"))
    val r = common.select(col("id").as("id_r"), col("ra").as("ra_r"),
      col("rb").as("rb_r"))
    val pairs = l.join(r, col("id_l") < col("id_r"))
      .select(((col("ra_l") < col("ra_r")) === (col("rb_l") < col("rb_r")))
        .as("conc"))
    val n = common.agg(count(lit(1)).as("n_common"))
    pairs.agg(
        // coalesce: an empty pair set (n_common < 2) sums to NULL
        coalesce(sum(when(col("conc"), 1L).otherwise(0L)), lit(0L))
          .as("concordant"),
        coalesce(sum(when(!col("conc"), 1L).otherwise(0L)), lit(0L))
          .as("discordant"))
      .crossJoin(broadcast(n))
      .select(col("n_common"), col("concordant"), col("discordant"),
        when(col("n_common") >= 2,
          (col("concordant") - col("discordant")).cast("double") /
            (col("n_common") * (col("n_common") - 1) / 2).cast("double"))
          .otherwise(lit(0.0)).as("tau"))
  }

  /** Spearman's ρ between two rankings of the same items — the
    * d²-formula companion to [[kendallTau]] (τ counts pairwise
    * inversions; ρ weights them by displacement, so a single item
    * moved far drops ρ much faster than τ). Only items in BOTH
    * rankings participate, and their ranks are RE-RANKED densely
    * within the common subset first: top-k lists with different
    * membership leave gaps (item ranked 3rd in one list, 17th in the
    * other), and the textbook ρ = 1 − 6Σd²/(n(n²−1)) is only exact
    * over a permutation of 1..n. After re-ranking there are no ties
    * (row_number with id tiebreak), so Σd² is an exact long and ρ is
    * ONE division. Output: one row (n_common, sum_d2, rho).
    *
    * Scale: both re-rank windows run over the COMMON set (≤ top-k
    * rows) — rank lists, not the corpus; an unpartitioned window over
    * a corpus-sized ranking would be the wrong tool (use the pair
    * count tables of [[graft.ops.Profile.mannWhitney]] instead).
    */
  def spearmanRho(a: DataFrame, b: DataFrame): DataFrame = {
    val common = a.select(col("id"), col("rank").as("ra"))
      .join(b.select(col("id"), col("rank").as("rb")), "id")
    val rr = common
      .withColumn("pa",
        row_number().over(Window.orderBy(col("ra"), col("id"))).cast("long"))
      .withColumn("pb",
        row_number().over(Window.orderBy(col("rb"), col("id"))).cast("long"))
    rr.agg(count(lit(1)).as("n_common"),
        coalesce(sum((col("pa") - col("pb")) * (col("pa") - col("pb"))),
          lit(0L)).as("sum_d2"))
      .select(col("n_common"), col("sum_d2"),
        when(col("n_common") >= 2,
          lit(1.0) - (lit(6.0) * col("sum_d2").cast("double")) /
            (col("n_common") * (col("n_common") * col("n_common") - 1))
              .cast("double"))
          .otherwise(lit(0.0)).as("rho"))
  }

  /** ROUGE-N between paired documents: clipped n-gram overlap with
    * multiplicity (Lin 2004 §3) — the summarization/distillation gate
    * a pipeline runs over (candidate, reference) pairs. Pairing is
    * positional here (doc_id div 2 buckets adjacent ids; even side =
    * candidate, odd = reference) — a caller with a real pairing keys
    * the same computation by its own pair id. Counts are exact longs:
    * overlap = Σ_g min(count_cand(g), count_ref(g)); precision =
    * overlap/n_cand and recall = overlap/n_ref collapse to
    * F1 = 2·overlap/(n_cand+n_ref), ONE division per pair. Pairs
    * missing either side (or with < n words on a side) are dropped.
    *
    * Scale: n-gram counting is ONE conditional aggregation keyed
    * (pair, gram) — map-side combined, no self-join of the gram
    * tables — then a pair-keyed rollup. Shuffle rows are (pair, gram,
    * 2 counts), never document text.
    */
  def rougeN(docs: DataFrame, n: Int = 2): DataFrame = {
    val w = split(col("text"), " ")
    Par.widen(docs)
      .filter(size(w) >= n)
      .select(expr("doc_id div 2").as("pair_id"),
        pmod(col("doc_id"), lit(2)).as("side"),
        explode(transform(sequence(lit(0), size(w) - lit(n)),
          i => array_join(slice(w, i + 1, lit(n)), " "))).as("gram"))
      .groupBy(col("pair_id"), col("gram"))
      .agg(sum(when(col("side") === 0, 1L).otherwise(0L)).as("cc"),
        sum(when(col("side") === 1, 1L).otherwise(0L)).as("cr"))
      .groupBy(col("pair_id"))
      .agg(sum(col("cc")).as("n_cand"), sum(col("cr")).as("n_ref"),
        sum(least(col("cc"), col("cr"))).as("overlap"))
      .filter(col("n_cand") > 0 && col("n_ref") > 0)
      .select(col("pair_id"), col("n_cand"), col("n_ref"), col("overlap"),
        ((lit(2.0) * col("overlap").cast("double")) /
          (col("n_cand") + col("n_ref")).cast("double")).as("rouge_f1"))
  }
}
