package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Embedding similarity search (SURVEY §2.8 [EXT] E2).
  *
  * Cosine arithmetic is done entirely in built-in higher-order functions
  * over `array<double>` (float inputs are widened first, so products and
  * the left-fold accumulation are bit-deterministic and engine-portable —
  * DuckDB's list_dot_product/list_cosine_similarity reproduce the exact
  * same doubles).
  *
  * Scale design: the probe set is broadcast (never shuffled); the
  * candidate side streams through a single scan. Brute force is the exact
  * baseline; [[ivfTopK]] is the sub-linear path — cluster-prune with an
  * inverted-file index so each probe only scans `nprobe/nlist` of the
  * corpus.
  */
object Similarity {

  /** Sequential left-fold dot product — codegen'd Catalyst expression
    * ([[graft.functions.DotProduct]]); bit-identical to the interpreted
    * `aggregate(zip_with(...))` formulation.
    */
  def dot(a: Column, b: Column): Column = graft.functions.VectorOps.dot(a, b)

  def norm(a: Column): Column = graft.functions.VectorOps.l2norm(a)

  /** cosine = dot / (|a| * |b|) — association mirrors DuckDB's
    * list_cosine_similarity exactly.
    */
  def cosine(a: Column, b: Column, normA: Column, normB: Column): Column =
    dot(a, b) / (normA * normB)

  private def withVec(df: DataFrame, idAs: String, vecAs: String): DataFrame =
    Par.widen(df).select(col("vec_id").as(idAs),
        col("embedding").cast("array<double>").as(vecAs))
      .withColumn(s"${vecAs}_norm", norm(col(vecAs)))

  /** Exact top-k cosine neighbors for each probe vector (excluding self).
    * Probes are broadcast; rank ties break on neighbor id.
    */
  def bruteForceTopK(embeddings: DataFrame, probes: DataFrame, k: Int): DataFrame = {
    val q = withVec(probes, "q_id", "q")
    val c = withVec(embeddings, "neighbor_id", "c")
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("sim").desc, col("neighbor_id").asc)
    broadcast(q).crossJoin(c)
      .filter(col("q_id") =!= col("neighbor_id"))
      .withColumn("sim", cosine(col("q"), col("c"), col("q_norm"), col("c_norm")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("neighbor_id"), col("sim"), col("rank"))
  }

  /** Embedding-cosine near-duplicate pairs: all (a < b) pairs with
    * cosine >= `threshold`, found by random-hyperplane (SimHash-style) LSH
    * banding + exact-cosine verification — the same candidate/verify split
    * as [[TextDedup.minhashLshPairs]], so the full corpus is never
    * cross-joined against itself:
    *
    *  1. signature: `bitsPerBand · bands` sign bits of dot(v, rᵢ) against
    *     seeded Gaussian hyperplanes (a few KB broadcast as literals);
    *  2. banding: per band, the packed bit-group is the bucket key;
    *     vectors sharing any bucket become candidate pairs (posting-list
    *     expansion — only ids shuffle, never vectors);
    *  3. verify: candidates join back their vectors once and the exact
    *     codegen'd cosine decides (precision 1.0 regardless of the hashes).
    *
    * A pair at angle θ collides in one band with prob (1-θ/π)^bitsPerBand;
    * the defaults (4 bits × 32 bands, fixed seed) push the miss rate for
    * cos ≥ 0.5 below 1e-3 per pair — recall at the registered threshold is
    * verified against the exact oracle. Wide banding is the honest price
    * of a 0.5 threshold (60° is weak similarity); production near-dup
    * sweeps at cos ≥ 0.8-0.9 would raise bitsPerBand (smaller buckets,
    * fewer candidates) and keep the identical plan shape.
    */
  /** Threshold→banding rule for [[cosineNearDup]] (documented with the
    * derivation table in SCALE.md): collision prob per hyperplane for a
    * pair at the threshold angle is p = 1 − acos(t)/π; `bitsPerBand`
    * follows the CORPUS (≈ log2(n/32), so a band's bucket population
    * stays ~32 and the bucket self-join stays near-linear, min 4);
    * `bands` then follows the threshold: enough bands that the per-pair
    * miss rate (1 − p^bits)^bands drops below `targetMiss`. Production
    * sweeps at a different threshold or corpus size get parameters from
    * the same rule instead of inheriting test tuning.
    */
  def bandingFor(threshold: Double, corpusSize: Long,
                 targetMiss: Double = 1e-3): (Int, Int) = {
    require(threshold > 0.0 && threshold < 1.0,
      s"threshold must be in (0,1), got $threshold")
    val p = 1.0 - math.acos(threshold) / math.Pi
    val bits = math.max(4,
      math.ceil(math.log(math.max(1.0, corpusSize / 32.0)) / math.log(2.0)).toInt)
    val c = math.pow(p, bits)
    val bands = math.max(8,
      math.ceil(math.log(targetMiss) / math.log1p(-c)).toInt)
    (bits, bands)
  }

  def cosineNearDup(embeddings: DataFrame, threshold: Double,
                    bitsPerBand: Int = 4, bands: Int = 32,
                    seed: Long = 7L, dim: Int = -1): DataFrame = {
    val e = withVec(embeddings, "vec_id", "v")
    // dim < 0 → probe the frame (one-row action). Callers whose input
    // rides an expensive lineage (the web front door's sem stage) pass
    // the dimension explicitly so CONSTRUCTION stays lazy — the probe
    // would otherwise execute the upstream pipeline once per plan
    // dump / sweep construction (the ADVICE-r13 eager-probe class).
    val d =
      if (dim > 0) dim
      else embeddings.select(size(col("embedding")).as("d")).head.getInt(0)

    val rng = new java.util.Random(seed)
    val planes = Array.fill(bitsPerBand * bands, d)(rng.nextGaussian())

    val bandCols = (0 until bands).map { b =>
      val key = (0 until bitsPerBand).map { i =>
        when(dot(col("v"), typedLit(planes(b * bitsPerBand + i).toSeq)) >= 0,
          lit(1 << i)).otherwise(lit(0))
      }.reduce(_ + _)
      struct(lit(b).as("band"), key.cast("int").as("key")).as(s"b$b")
    }
    val buckets = e.select(col("vec_id"), explode(array(bandCols: _*)).as("bk"))
      .select(col("vec_id"), col("bk.band"), col("bk.key"))

    // bucket SELF-JOIN on (band, key): the only shuffle moves (id, band,
    // key) rows — candidate pairs are produced inside the join tasks and
    // stream straight into the broadcast verify without ever being
    // shuffled or pre-deduplicated (dedup after the cosine filter costs
    // rows-that-survive, not rows-generated). AQE splits hot buckets.
    val cand = buckets.select(col("band"), col("key"), col("vec_id").as("vec_a"))
      .join(buckets.select(col("band"), col("key"), col("vec_id").as("vec_b")),
        Seq("band", "key"))
      .where(col("vec_a") < col("vec_b"))
      .select(col("vec_a"), col("vec_b"))

    // no broadcast hint: Catalyst broadcasts the vector side while it fits
    // (it does at test SF) and falls back to shuffle joins at corpus scale
    cand
      .join(e.select(col("vec_id").as("vec_a"), col("v").as("va"),
        col("v_norm").as("va_norm")), "vec_a")
      .join(e.select(col("vec_id").as("vec_b"), col("v").as("vb"),
        col("v_norm").as("vb_norm")), "vec_b")
      // clamp to the mathematical range: identical-direction vectors
      // round to 1+2ulp under dot/(|a||b|), while DuckDB's
      // list_cosine_similarity caps at 1 — both engines must agree
      .withColumn("cos", least(
        cosine(col("va"), col("vb"), col("va_norm"), col("vb_norm")),
        lit(1.0)))
      .filter(col("cos") >= threshold)
      .select(col("vec_a"), col("vec_b"), col("cos"))
      .distinct()
  }

  /** Exact all-pairs reference for [[cosineNearDup]] (O(n²) — test/oracle
    * use only; the registered op is the LSH-bucketed path).
    */
  def cosineNearDupExact(embeddings: DataFrame, threshold: Double): DataFrame = {
    val a = withVec(embeddings, "vec_a", "va")
    val b = withVec(embeddings, "vec_b", "vb")
    a.crossJoin(b)
      .filter(col("vec_a") < col("vec_b"))
      // clamp to the mathematical range: identical-direction vectors
      // round to 1+2ulp under dot/(|a||b|), while DuckDB's
      // list_cosine_similarity caps at 1 — both engines must agree
      .withColumn("cos", least(
        cosine(col("va"), col("vb"), col("va_norm"), col("vb_norm")),
        lit(1.0)))
      .filter(col("cos") >= threshold)
      .select(col("vec_a"), col("vec_b"), col("cos"))
  }

  /** Top-`n` centroids per row by cosine, tie-broken on cent_id — the
    * broadcast-argmax join shared by IVF assignment, probing, and k-means.
    */
  private def nearestCentroids(df: DataFrame, cent: DataFrame, idCol: String,
                               vecCol: String, n: Int): DataFrame = {
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("csim").desc, col("cent_id").asc)
    df.crossJoin(broadcast(cent))
      .withColumn("csim",
        cosine(col(vecCol), col("g"), col(s"${vecCol}_norm"), col("g_norm")))
      .withColumn("crank", row_number().over(w))
      .filter(col("crank") <= n)
      .drop("g", "g_norm", "csim", "crank")
  }

  /** Spherical Lloyd iterations as DataFrame ops: seed centroids are the
    * first `nlist` vectors, each iteration re-assigns every vector to its
    * max-cosine centroid (broadcast argmax join — one scan, no shuffle of
    * vectors beyond the per-(centroid,dim) partial aggregation) and
    * replaces the centroid with the elementwise SUM of its members.
    * Cosine is scale-invariant, so the sum IS the spherical mean direction
    * — skipping the /count keeps the arithmetic engine-portable (the sum
    * is accumulated as DECIMAL(38,18), exact and order-independent, then
    * cast to double once; a double mean would vary with partial-agg order).
    * Empty clusters simply vanish (their id is never assigned).
    */
  def kmeansCentroids(embeddings: DataFrame, nlist: Int, iters: Int): DataFrame = {
    // the corpus is scanned once per iteration plus the seed pass —
    // persist the projected (id, vector, norm) view instead of re-reading
    // and re-normalizing from parquet each time
    val e = withVec(embeddings, "vec_id", "v").persist()
    var cent = e.filter(col("vec_id") < nlist)
      .select(col("vec_id").as("cent_id"), col("v").as("g"),
        col("v_norm").as("g_norm"))
    for (_ <- 0 until iters) {
      val assigned = nearestCentroids(
        e.select(col("vec_id"), col("v"), col("v_norm")), cent, "vec_id", "v", 1)
      cent = assigned
        .select(col("cent_id"), posexplode(col("v")).as(Seq("pos", "val")))
        .groupBy(col("cent_id"), col("pos"))
        .agg(sum(col("val").cast(org.apache.spark.sql.types.DecimalType(38, 18)))
          .cast("double").as("sval"))
        .groupBy(col("cent_id"))
        .agg(transform(
          array_sort(collect_list(struct(col("pos"), col("sval")))),
          s => s.getField("sval")).as("g"))
        .withColumn("g_norm", norm(col("g")))
    }
    cent
  }

  /** IVF (inverted-file) approximate top-k: corpus vectors are assigned to
    * their nearest of `nlist` centroid vectors; each probe searches only
    * its `nprobe` nearest centroids' lists. With `kmeansIters` = 0 the
    * centroids are the deterministic seeds (first `nlist` vectors);
    * `kmeansIters` > 0 refines them with [[kmeansCentroids]]. The operator
    * shape (assign = broadcast argmax join, search = equi-join on centroid
    * id) is the 100 TB path: the crossJoin shrinks by nlist/nprobe.
    */
  def ivfTopK(embeddings: DataFrame, probes: DataFrame, k: Int,
              nlist: Int = 16, nprobe: Int = 4, kmeansIters: Int = 0): DataFrame = {
    val cent =
      if (kmeansIters > 0) kmeansCentroids(embeddings, nlist, kmeansIters)
      else withVec(embeddings.filter(col("vec_id") < nlist), "cent_id", "g")

    val assigned = nearestCentroids(withVec(embeddings, "neighbor_id", "c"),
      cent, "neighbor_id", "c", 1)
    val probed = nearestCentroids(withVec(probes, "q_id", "q"), cent, "q_id", "q", nprobe)

    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("sim").desc, col("neighbor_id").asc)
    probed.join(assigned, "cent_id")
      .filter(col("q_id") =!= col("neighbor_id"))
      .withColumn("sim", cosine(col("q"), col("c"), col("q_norm"), col("c_norm")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("neighbor_id"), col("sim"), col("rank"))
  }

  /** Hard-negative mining for contrastive training: each probe's top-k
    * most-similar vectors with a DIFFERENT label — the examples that sit
    * closest to the decision boundary, which is what a contrastive or
    * reranker training loop asks its data pipeline for. Same plan shape
    * as [[bruteForceTopK]] (probes broadcast, corpus streamed once, the
    * label inequality rides the codegen'd filter); at corpus scale the
    * IVF candidate generator slots in front unchanged.
    */
  def hardNegatives(embeddings: DataFrame, probes: DataFrame,
                    k: Int): DataFrame = {
    val q = withVec(probes, "q_id", "q")
      .join(probes.select(col("vec_id").as("q_id"),
        col("label").as("q_label")), "q_id")
    val c = withVec(embeddings, "neg_id", "c")
      .join(embeddings.select(col("vec_id").as("neg_id"),
        col("label").as("neg_label")), "neg_id")
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("sim").desc, col("neg_id").asc)
    broadcast(q).crossJoin(c)
      .filter(col("q_label") =!= col("neg_label"))
      .withColumn("sim", cosine(col("q"), col("c"), col("q_norm"), col("c_norm")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("q_label"), col("neg_id"), col("neg_label"),
        col("sim"), col("rank"))
  }

  /** ANN index-quality evaluation: recall@k of [[ivfTopK]] against the
    * [[bruteForceTopK]] ground truth, per probe — the measurement every
    * production ANN deployment runs before trusting an index (tune
    * nlist/nprobe until the recall column clears the SLO). Both sides
    * break similarity ties by neighbor id, so the "true top-k set" is
    * well-defined and the recall is an exact int/int division.
    *
    * Scale: the probe set is the small side everywhere (same as the two
    * underlying operators); the comparison join keys on
    * (q_id, neighbor_id) — k rows per probe, nothing corpus-sized.
    */
  def annRecall(embeddings: DataFrame, probes: DataFrame, k: Int,
                nlist: Int = 16, nprobe: Int = 4): DataFrame = {
    val exact = bruteForceTopK(embeddings, probes, k)
      .select(col("q_id"), col("neighbor_id"))
    val approx = ivfTopK(embeddings, probes, k, nlist, nprobe)
      .select(col("q_id"), col("neighbor_id"))
      .withColumn("hit", lit(1L))
    exact.join(approx, Seq("q_id", "neighbor_id"), "left")
      .groupBy(col("q_id"))
      .agg(count(lit(1)).as("n_true"),
        sum(coalesce(col("hit"), lit(0L))).as("n_hit"))
      .select(col("q_id"), col("n_true"), col("n_hit"),
        (col("n_hit").cast("double") / col("n_true").cast("double"))
          .as("recall"))
  }

  /** SemDeDup-style semantic deduplication (Abbas et al. 2023,
    * arXiv:2303.09540): cluster the corpus, then compare each vector only
    * against its OWN cluster's members — the pairwise work is quadratic in
    * the cluster size, never the corpus size. A vector is dropped when its
    * cosine to any lower-id cluster-mate reaches `threshold` (keep-lowest-id
    * is this engine's deterministic stand-in for the paper's
    * farthest-from-centroid keeper; the dedup set is the same, the chosen
    * representative differs).
    *
    * Plan shape: one broadcast-argmax assignment scan (shared
    * [[nearestCentroids]]), then a single shuffle that co-locates each
    * cluster (equi-join on `cent_id`), pairs produced inside the join tasks.
    * At 100 TB the knob is `nlist` ∝ corpus size so the expected cluster
    * population stays bounded (the paper runs 50k clusters for LAION-440M);
    * the per-cluster self-join then stays near-linear and AQE splits any
    * skewed cluster. The assignment subtree appears twice in the plan (once
    * for the output rows, once under the pair join) — recomputing one
    * projection-plus-broadcast-argmax scan is the right 100 TB trade
    * against persisting the whole vector corpus. Returns every vector with
    * its cluster, the max cosine to any earlier cluster-mate (NULL for the
    * cluster's first member), and the keep decision.
    */
  def semDedup(embeddings: DataFrame, threshold: Double, nlist: Int = 16,
               kmeansIters: Int = 0): DataFrame = {
    val cent =
      if (kmeansIters > 0) kmeansCentroids(embeddings, nlist, kmeansIters)
      else withVec(embeddings.filter(col("vec_id") < nlist), "cent_id", "g")
    val assigned = nearestCentroids(withVec(embeddings, "vec_id", "v"),
      cent, "vec_id", "v", 1)

    val mates = assigned.select(col("cent_id"), col("vec_id"),
      col("v"), col("v_norm"))
    val maxPrior = mates.toDF("cent_id", "vec_id", "v", "v_norm")
      .join(mates.toDF("cent_id", "vec_b", "vb", "vb_norm"), Seq("cent_id"))
      .where(col("vec_b") < col("vec_id"))
      .withColumn("cos", cosine(col("v"), col("vb"), col("v_norm"), col("vb_norm")))
      .groupBy(col("vec_id"))
      .agg(max(col("cos")).as("max_prior_sim"))

    assigned.select(col("vec_id"), col("cent_id"))
      .join(maxPrior, Seq("vec_id"), "left")
      .select(col("vec_id"), col("cent_id"), col("max_prior_sim"),
        coalesce(col("max_prior_sim") < threshold, lit(true)).as("keep"))
  }

  /** Int8 scalar quantization of the embedding column: per-dimension
    * min/max over the corpus, then code = floor((v - mn) * 255 / (mx -
    * mn)) in [0, 255] — the 4x memory shrink that makes a 100 TB vector
    * corpus ANN-searchable in RAM. Calibration is one scan (posexplode +
    * 64-group aggregate, map-side combined); the bounds come back as two
    * broadcast arrays, so quantization itself is a pure projection.
    * min/max are exact SELECTIONS (no float summation), and the code
    * expression is the same IEEE double arithmetic in Spark and the
    * oracle — bit-deterministic.
    */
  def quantizeInt8(embeddings: DataFrame): DataFrame = {
    val dims = embeddings
      .select(posexplode(col("embedding")).as(Seq("pos", "v")))
      .groupBy(col("pos"))
      .agg(min(col("v")).cast("double").as("mn"), max(col("v")).cast("double").as("mx"))
    val bounds = dims.agg(
      array_sort(collect_list(struct(col("pos"), col("mn"), col("mx")))).as("b"))
      .select(transform(col("b"), x => x("mn")).as("mins"),
        transform(col("b"), x => x("mx")).as("maxs"))
    embeddings.crossJoin(broadcast(bounds))
      .select(col("vec_id"),
        transform(col("embedding"), (v, i) => {
          val mn = element_at(col("mins"), i + 1)
          val mx = element_at(col("maxs"), i + 1)
          when(mx === mn, lit(0))
            .otherwise(floor((v.cast("double") - mn) * lit(255.0) / (mx - mn)))
            .cast("int")
        }).as("codes"))
  }

  /** Per-dimension embedding distribution stats — the mean-centering /
    * feature-scaling prep table (n, mean, min, max per dimension) a
    * pipeline computes before whitening, PCA, or quantizer training.
    * Means are DECIMAL(38,18)-exact sums divided once at the end
    * (rounded 1e-6 — the repo's one-division convention), so the table
    * is engine-portable; min/max are stored values, no arithmetic.
    * Scale: one scan, one (dim)-keyed aggregation whose exchange
    * carries dim-count×partitions partial rows — map-side combine does
    * all the work; output is dim-count rows regardless of corpus size.
    */
  def dimStats(embeddings: DataFrame): DataFrame =
    embeddings.select(posexplode(col("embedding")).as(Seq("dim", "v")))
      .groupBy(col("dim"))
      .agg(count(lit(1)).as("n"),
        sum(col("v").cast(org.apache.spark.sql.types.DecimalType(38, 18))).as("s"),
        min(col("v").cast("double")).as("min_v"),
        max(col("v").cast("double")).as("max_v"))
      .select(col("dim"), col("n"),
        round(col("s").cast("double") / col("n"), 6).as("mean_v"),
        col("min_v"), col("max_v"))

  /** Product quantization (the compression half of IVF-PQ, Jégou et al.
    * 2011): the vector is split into `nSub` contiguous subvectors, each
    * quantized independently against its own `k`-entry codebook, so a
    * `dim`-float vector compresses to `nSub` small codes (here 4 codes ×
    * 4 bits — a 64× reduction) while distances remain approximable
    * per-subspace. Codebooks are trained with the same decimal-exact
    * spherical Lloyd machinery as [[kmeansCentroids]] ("spherical PQ":
    * assignment by max cosine — scale-invariant, engine-portable);
    * `mean_sub_sim` (the mean of the per-subspace assignment cosines,
    * summed in fixed subspace order) is the observable quantization
    * fidelity.
    *
    * Scale: training scans the corpus `nSub × (iters + 1)` times over a
    * PROJECTED (id, subvector) view; each scan's shuffle is the
    * (centroid, dim, partial-sum) aggregation — k·subDim rows, never
    * vectors. Encoding is one broadcast-argmax pass per subspace over
    * the persisted projection; only (vec_id, sub, code, csim) rows —
    * constant width — reach the final per-vector shuffle. At 100 TB
    * codebooks train on a sample and the encode pass is the only
    * full-corpus scan, exactly this plan minus the training scans.
    */
  def productQuantize(embeddings: DataFrame, dim: Int = 64, nSub: Int = 4,
                      k: Int = 16, iters: Int = 1): DataFrame = {
    require(dim % nSub == 0, "productQuantize: dim must split evenly")
    val subDim = dim / nSub
    val e = Par.widen(embeddings)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .persist()
    val perSub = (0 until nSub).map { s =>
      val sub = e.select(col("vec_id"),
        slice(col("v"), s * subDim + 1, subDim).as("embedding"))
      val cent = kmeansCentroids(sub, k, iters)
      val aw = Window.partitionBy(col("vec_id"))
        .orderBy(col("csim").desc, col("cent_id").asc)
      withVec(sub, "vec_id", "sv").crossJoin(broadcast(cent))
        .withColumn("csim",
          cosine(col("sv"), col("g"), col("sv_norm"), col("g_norm")))
        .withColumn("r", row_number().over(aw)).filter(col("r") === 1)
        .select(col("vec_id"), lit(s).as("sub"),
          col("cent_id").as("code"), col("csim"))
    }
    val out = perSub.reduce(_.unionByName(_))
      .groupBy(col("vec_id"))
      .agg(array_sort(collect_list(struct(col("sub"), col("code"), col("csim"))))
        .as("cs"))
      .select(col("vec_id"),
        array_join(transform(col("cs"), x => x.getField("code").cast("string")),
          ",").as("codes"),
        // fixed fold order (by sub), then the repo's 1e-6 rounding: the
        // 4-term fold still lands a last-ulp apart from DuckDB's
        // list_reduce on ~20% of rows (codes are bit-exact; this is the
        // one float the oracle can't reproduce bit-for-bit)
        round(aggregate(transform(col("cs"), x => x.getField("csim")),
          lit(0.0), (a, b) => a + b) / lit(nSub.toDouble), 6).as("mean_sub_sim"))
    out
  }

  /** DuckDB oracle for [[productQuantize]] at `iters` = 1: per subspace,
    * the same seed → decimal-exact Lloyd step → argmax encode, generated
    * from the same parameters so operator and oracle share one
    * definition of the arithmetic.
    */
  def productQuantizeOracleSql(dim: Int = 64, nSub: Int = 4,
                               k: Int = 16): String = {
    val subDim = dim / nSub
    val subs = (0 until nSub).map { s =>
      val lo = s * subDim + 1
      val hi = (s + 1) * subDim
      s"""e$s AS (SELECT vec_id, (embedding::DOUBLE[])[$lo:$hi] AS v FROM embeddings),
         |c0$s AS (SELECT vec_id AS cent_id, v AS g FROM e$s WHERE vec_id < $k),
         |a0$s AS (SELECT e.vec_id, e.v, cent_id FROM e$s e CROSS JOIN c0$s
         |         QUALIFY row_number() OVER (PARTITION BY e.vec_id
         |           ORDER BY list_cosine_similarity(e.v, g) DESC, cent_id ASC) = 1),
         |c1$s AS (SELECT cent_id, list(sval ORDER BY pos) AS g FROM (
         |           SELECT cent_id, pos,
         |             CAST(sum(CAST(val AS DECIMAL(38,18))) AS DOUBLE) AS sval
         |           FROM (SELECT cent_id, unnest(v) AS val,
         |                   generate_subscripts(v,1) AS pos FROM a0$s)
         |           GROUP BY cent_id, pos)
         |         GROUP BY cent_id),
         |a$s AS (SELECT e.vec_id, $s AS sub, cent_id AS code,
         |          list_cosine_similarity(e.v, g) AS csim
         |        FROM e$s e CROSS JOIN c1$s
         |        QUALIFY row_number() OVER (PARTITION BY e.vec_id
         |          ORDER BY list_cosine_similarity(e.v, g) DESC, cent_id ASC) = 1)""".stripMargin
    }.mkString(",\n")
    val union = (0 until nSub).map(s => s"SELECT * FROM a$s")
      .mkString(" UNION ALL ")
    s"""WITH $subs,
       | u AS ($union)
       |SELECT vec_id,
       |  string_agg(CAST(code AS VARCHAR), ',' ORDER BY sub) AS codes,
       |  round(list_reduce(list_prepend(CAST(0 AS DOUBLE), list(csim ORDER BY sub)),
       |    (a, b) -> a + b) / $nSub, 6) AS mean_sub_sim
       |FROM u GROUP BY vec_id""".stripMargin
  }

  /** Pair-similarity histogram on a deterministic key-space sample —
    * the threshold-calibration sweep run BEFORE committing a dedup
    * threshold: bucket counts of cos(a,b) at width 1/`halfBins` over
    * [-1,1] tell you where the corpus's duplicate mass sits (a bimodal
    * histogram separates near-dup mass from background; the valley is
    * the threshold). Probes are `vec_id % sampleMod == 0` — the
    * [[graft.ops.Distribute]] key-space-sampling philosophy (growth-
    * stable, reproducible, and unbiased for a hash-assigned id space),
    * so the pair space is corpus²/sampleMod, not corpus².
    *
    * Determinism: cosines are the engine-portable left-fold doubles
    * (object doc), bucket = floor(cos·halfBins) is one multiply + floor
    * on bit-identical inputs — no boundary ambiguity POSSIBLE, because
    * the two engines never disagree on the input double. `share` is one
    * division by the total pair count.
    *
    * Scale: probes broadcast, corpus streamed once (the
    * [[bruteForceTopK]] shape); output is ≤ 2·halfBins+1 rows. At
    * 100 TB raise `sampleMod` so probes stay broadcast-sized — the
    * histogram is a STATISTIC; its variance shrinks with probe count,
    * not with pair recovery.
    */
  def similarityHistogram(embeddings: DataFrame, sampleMod: Int = 20,
                          halfBins: Int = 10): DataFrame = {
    val a = withVec(embeddings.filter(col("vec_id") % sampleMod === 0),
      "vec_a", "va")
    val b = withVec(embeddings, "vec_b", "vb")
    val pairs = broadcast(a).join(b, col("vec_a") < col("vec_b"))
      .select(cosine(col("va"), col("vb"), col("va_norm"), col("vb_norm"))
        .as("cos"))
    val wAll = Window.partitionBy(lit(1))
    pairs
      .select(floor(col("cos") * lit(halfBins.toDouble)).as("bucket"))
      .groupBy(col("bucket")).agg(count(lit(1)).as("n_pairs"))
      .withColumn("share",
        col("n_pairs").cast("double") / sum(col("n_pairs")).over(wAll))
      .select(col("bucket"),
        (col("bucket").cast("double") / lit(halfBins.toDouble)).as("lo"),
        col("n_pairs"), col("share"))
  }

  /** k-nearest-neighbor label classification over the embedding corpus:
    * each probe (the deterministic `vec_id % sampleMod` key-space
    * slice) is classified by the majority label of its k exact cosine
    * neighbors — the standard embedding-quality probe (a corpus whose
    * kNN accuracy collapses has noisy labels or collapsed vectors), and
    * the evaluation half of a weak-labeling pipeline. One row per
    * probe: true label, predicted label, vote count, correct flag.
    *
    * Determinism: cosine is the left-fold [[dot]] (bit-identical to
    * DuckDB's list_cosine_similarity); neighbor rank ties break on
    * neighbor id and vote ties on the smaller label, so every step is
    * total-ordered.
    *
    * Scale: the [[bruteForceTopK]] shape — probes broadcast, corpus
    * streamed once; the vote aggregation sees probes·k rows. Raise
    * `sampleMod` so probes stay broadcast-sized; for an all-rows
    * classification swap the candidate generator to [[ivfTopK]]'s
    * centroid equi-join (same vote stage).
    */
  def knnClassify(embeddings: DataFrame, sampleMod: Int = 25,
                  k: Int = 5): DataFrame = {
    val q = Par.widen(embeddings.filter(col("vec_id") % sampleMod === 0))
      .select(col("vec_id").as("q_id"), col("label").as("true_label"),
        col("embedding").cast("array<double>").as("qv"))
      .withColumn("qn", norm(col("qv")))
    val c = Par.widen(embeddings)
      .select(col("vec_id").as("n_id"), col("label").as("n_label"),
        col("embedding").cast("array<double>").as("cv"))
      .withColumn("cn", norm(col("cv")))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("sim").desc, col("n_id").asc)
    val topk = broadcast(q).crossJoin(c)
      .filter(col("q_id") =!= col("n_id"))
      .withColumn("sim", cosine(col("qv"), col("cv"), col("qn"), col("cn")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
    val wv = Window.partitionBy(col("q_id"))
      .orderBy(col("n_votes").desc, col("n_label").asc)
    topk.groupBy(col("q_id"), col("true_label"), col("n_label"))
      .agg(count(lit(1)).as("n_votes"))
      .withColumn("rn", row_number().over(wv))
      .filter(col("rn") === 1)
      .select(col("q_id"), col("true_label"),
        col("n_label").as("pred_label"), col("n_votes"),
        when(col("n_label") === col("true_label"), lit(1))
          .otherwise(lit(0)).as("correct"))
  }

  /** Calibration report over [[knnClassify]]'s vote confidences — the
    * reliability-diagram body plus expected calibration error (ECE,
    * Naeini et al. 2015): a k-NN vote share v/k IS a discrete
    * confidence, so the bins are the k vote counts, no quantile cuts
    * needed. Per bin: n, accuracy, and |accuracy − confidence|; ECE is
    * the n-weighted mean gap. EVERY number is one division of exact
    * integers: gap = |k·c_b − v·n_b| / (k·n_b) and
    * ECE = Σ_b |k·c_b − v·n_b| / (k·N) — the weighted sum folds into
    * an integer numerator BEFORE the division, so no double
    * accumulation order exists anywhere.
    *
    * Scale: two aggregations over the (already tiny) per-query
    * prediction table; the 1-row total rides a broadcast.
    */
  def calibrationBins(knn: DataFrame, k: Int = 5): DataFrame = {
    val bins = knn.groupBy(col("n_votes"))
      .agg(count(lit(1)).as("n"),
        sum(col("correct").cast("long")).as("n_correct"))
      // k here must be the classifier's k: a vote count above it means
      // the caller paired this with a knnClassify(k != this k) — fail
      // loudly instead of reporting confidences above 1.0
      .withColumn("n_votes",
        when(col("n_votes") > k, raise_error(concat(
          lit(s"calibrationBins: n_votes > k=$k — pass the SAME k as " +
            "the classifier (saw "), col("n_votes").cast("string"),
          lit(")"))))
          .otherwise(col("n_votes")))
    val gapNum = abs(lit(k.toLong) * col("n_correct")
      - col("n_votes") * col("n"))
    val tot = bins.agg(sum(col("n")).as("nt"),
      sum(gapNum).as("ece_num"))
    bins.crossJoin(broadcast(tot))
      .select(col("n_votes"),
        (col("n_votes").cast("double") / k).as("confidence"),
        col("n"), col("n_correct"),
        (col("n_correct").cast("double") / col("n")).as("accuracy"),
        (gapNum.cast("double")
          / (lit(k.toLong) * col("n")).cast("double")).as("gap"),
        (col("ece_num").cast("double")
          / (lit(k.toLong) * col("nt")).cast("double")).as("ece"))
  }

  /** Isotonic (PAV) calibration over [[knnClassify]]'s vote bins — the
    * monotone-regression sibling of [[calibrationBins]]: the reliability
    * diagram reports the RAW per-bin accuracy, which can dip as
    * confidence rises; the pool-adjacent-violators fit is the unique
    * monotone non-decreasing curve minimizing squared error (Barlow et
    * al. 1972), i.e. the calibrated probability a user would actually
    * map scores through. Computed via the minimax characterization
    * f(i) = max_{j≤i} min_{m≥i} mean(correct over bins j..m) — no
    * iterative pooling loop, so the whole fit is one declarative plan
    * over the interval lattice of the (≤ k)-row bin table.
    *
    * Determinism: interval means C/N are ordered by the exact floor key
    * (C·10¹⁴) div N — distinct fractions with denominators below 10⁶
    * differ by ≥ 10⁻¹², so their keys differ by ≥ 100 and the order is
    * the true fraction order; equal fractions tie-break on (N, C), so
    * both engines select the SAME interval row and emit the identical
    * double division. Precondition: fewer than 10⁶ probe rows (beyond
    * that, widen the key to DECIMAL).
    *
    * Scale: the interval lattice is k(k+1)/2 rows built from ONE
    * aggregation of the probe table — the corpus-sized work is
    * [[knnClassify]]; everything here is constant-sized regardless of
    * corpus, the always-legal broadcast shape.
    */
  def isotonicCalibration(knn: DataFrame, k: Int = 5): DataFrame = {
    val bins = knn.groupBy(col("n_votes"))
      .agg(count(lit(1)).as("n"),
        sum(col("correct").cast("long")).as("n_correct"))
    val wo = Window.orderBy(col("n_votes"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val pre = bins
      .withColumn("cum_n", sum(col("n")).over(wo))
      .withColumn("cum_c", sum(col("n_correct")).over(wo))
    // interval j..m (by n_votes order): C/N from prefix-sum differences
    val iv = pre.select(col("n_votes").as("jv"),
        (col("cum_n") - col("n")).as("n_lo"),
        (col("cum_c") - col("n_correct")).as("c_lo"))
      .join(pre.select(col("n_votes").as("mv"),
        col("cum_n").as("n_hi"), col("cum_c").as("c_hi")),
        col("jv") <= col("mv"))
      .select(col("jv"), col("mv"),
        (col("c_hi") - col("c_lo")).as("cc"),
        (col("n_hi") - col("n_lo")).as("nn"))
      .withColumn("key", expr("cc * 100000000000000 div nn"))
    // f(i): inner min over m >= i per (i, j), then outer max over j <= i
    val onBin = bins.select(col("n_votes").as("iv_votes"))
      .join(iv, col("jv") <= col("iv_votes") &&
        col("iv_votes") <= col("mv"))
    val wmin = Window.partitionBy(col("iv_votes"), col("jv"))
      .orderBy(col("key").asc, col("nn").asc, col("cc").asc)
    val wmax = Window.partitionBy(col("iv_votes"))
      .orderBy(col("key").desc, col("nn").asc, col("cc").asc)
    val fit = onBin.withColumn("rn", row_number().over(wmin))
      .filter(col("rn") === 1)
      .withColumn("rx", row_number().over(wmax))
      .filter(col("rx") === 1)
      .select(col("iv_votes").as("n_votes"),
        (col("cc").cast("double") / col("nn").cast("double")).as("iso_p"))
    bins.join(fit, Seq("n_votes"))
      .select(col("n_votes"),
        (col("n_votes").cast("double") / k).as("confidence"),
        col("n"), col("n_correct"),
        (col("n_correct").cast("double") / col("n")).as("accuracy"),
        col("iso_p"))
  }

  /** Robust per-dimension scaling of the embedding corpus:
    * (x − median) / IQR per dimension — the outlier-proof
    * normalization ([[dimStats]] gives mean/min/max; a handful of
    * corrupt vectors drag a mean/σ scaler, but not the quartiles).
    * Output: one row per (vec_id, dim) with the raw and scaled value;
    * dimensions with IQR = 0 emit NULL.
    *
    * Determinism: quartiles are DISCRETE rank selections (k = ceil(p·n),
    * the [[graft.ops.Profile.winsorizedStats]] discipline) over the
    * float-derived doubles — selected VALUES are tie-order-independent —
    * and the scale step is one subtraction + one division of
    * bit-identical doubles in both engines; no rounding anywhere.
    *
    * Scale: one posexplode projection, one per-dim window sort (64
    * partitions — at corpus scale swap the exact ranks for
    * approx_percentile cuts, same contract), one broadcast join back.
    */
  def robustScale(embeddings: DataFrame): DataFrame = {
    val exploded = Par.widen(embeddings)
      .select(col("vec_id"), posexplode(col("embedding").cast("array<double>"))
        .as(Seq("dim", "x")))
    val w = Window.partitionBy(col("dim")).orderBy(col("x"))
    val wd = Window.partitionBy(col("dim"))
    val cuts = exploded
      .withColumn("rn", row_number().over(w))
      .withColumn("n_part", count(lit(1)).over(wd))
      .withColumn("k25", expr("(n_part * 25 + 99) div 100"))
      .withColumn("k50", expr("(n_part * 50 + 99) div 100"))
      .withColumn("k75", expr("(n_part * 75 + 99) div 100"))
      .groupBy(col("dim")).agg(
        max(when(col("rn") === col("k25"), col("x"))).as("q1"),
        max(when(col("rn") === col("k50"), col("x"))).as("med"),
        max(when(col("rn") === col("k75"), col("x"))).as("q3"))
    exploded.join(broadcast(cuts), "dim")
      .select(col("vec_id"), col("dim"), col("x"),
        when(col("q3") === col("q1"), lit(null).cast("double"))
          .otherwise((col("x") - col("med")) / (col("q3") - col("q1")))
          .as("x_scaled"))
  }

  /** Top principal direction of the embedding matrix by power
    * iteration — run ENTIRELY in integer arithmetic so the result is
    * bit-reproducible on any engine, partitioning, or run: vectors are
    * quantized to 1e-6 (the [[quantizeInt8]] float→round discipline),
    * each step computes u = Xv and w = Xᵀu as exact DECIMAL(38,0)
    * sums, and renormalization is the INTEGER map
    * v' = (w + s)·1e6 div s − 1e6 with s = max|w| — a truncating
    * division on a non-negative dividend, which floor-divides
    * identically everywhere (a negative dividend would trunc in Spark
    * but floor in DuckDB — the +s shift sidesteps the mismatch).
    *
    * Scale shape: two corpus-sized aggregations per step (the matvec
    * pair), both map-side combinable; v is dim-sized and broadcast
    * into each join. A degenerate s = 0 collapses v to zero on both
    * engines instead of dividing by zero. Fixed `iterations` — this
    * reports the 6-step iterate (deterministic), not a convergence
    * claim; loadings are emitted at 1e-6 scale plus one rounded
    * division for the double view.
    */
  def pcaPower(embeddings: DataFrame, iterations: Int = 6): DataFrame = {
    val big = org.apache.spark.sql.types.DecimalType(38, 0)
    // the exploded (id, dim, q) relation is read twice per round —
    // persist it once instead of re-scanning the parquet every join
    // (iterative-algorithm caching, same as pagerank's adjacency)
    val e = embeddings
      .select(col("vec_id").as("id"),
        posexplode(col("embedding")).as(Seq("dim", "x")))
      .select(col("id"), col("dim").cast("long").as("dim"),
        round(col("x").cast("double") * lit(1000000)).cast("long").as("q"))
      .persist()
    var v = e.select(col("dim")).distinct()
      .withColumn("v", lit(1000000L).cast(big))
    for (_ <- 1 to iterations) {
      val u = e.join(broadcast(v), "dim")
        .groupBy(col("id"))
        .agg(sum(col("q").cast(big) * col("v")).as("u"))
      val w = e.join(u, "id")
        .groupBy(col("dim"))
        .agg(sum(col("u") * col("q").cast(big)).as("w"))
      val s = w.agg(max(abs(col("w"))).as("s"))
      // CUT LINEAGE each round: v's expression embeds the previous v
      // TWICE (once via u, once via w), so inlining doubles the subtree
      // per iteration — the un-cut plan held 632 parquet scans and 3 348
      // nodes at 6 rounds (the oracle's own scaladoc warned of exactly
      // this and materializes per step; now both sides do). v is
      // dim-sized, so the checkpoint is ~d rows — always cheap
      v = w.crossJoin(broadcast(s))
        .select(col("dim"),
          when(col("s") === 0, lit(0L).cast(big))
            .otherwise(expr("(w + s) * 1000000 div s - 1000000")
              .cast(big)).as("v"))
        .localCheckpoint()
    }
    val out = v.select(col("dim"), col("v").cast("long").as("loading_q"),
      round(col("v").cast("double") / lit(1000000.0), 6).as("loading"))
      .localCheckpoint()
    e.unpersist()
    out
  }

  /** The DuckDB oracle for [[pcaPower]]: the same integer recurrence
    * unrolled, MATERIALIZED per step (each step reads its predecessor
    * twice — inlining would re-expand the scan exponentially).
    * Generated beside the operator so both sides share one definition
    * of the arithmetic, shift included.
    */
  def pcaPowerOracleSql(iterations: Int = 6): String = {
    val steps = (1 to iterations).map { i =>
      s"""u$i AS MATERIALIZED (SELECT id, CAST(sum(q * v) AS HUGEINT) AS u
         |   FROM e JOIN v${i - 1} USING (dim) GROUP BY 1),
         | w$i AS MATERIALIZED (SELECT dim, CAST(sum(u * q) AS HUGEINT) AS w
         |   FROM e JOIN u$i USING (id) GROUP BY 1),
         | s$i AS (SELECT max(abs(w)) AS s FROM w$i),
         | v$i AS MATERIALIZED (SELECT dim,
         |   CASE WHEN s = 0 THEN CAST(0 AS HUGEINT)
         |        ELSE (w + s) * 1000000 // s - 1000000 END AS v
         |   FROM w$i, s$i)""".stripMargin
    }.mkString(",\n")
    s"""WITH e AS MATERIALIZED (SELECT vec_id AS id, CAST(g AS BIGINT) AS dim,
       |   CAST(round(CAST(embedding[g + 1] AS DOUBLE) * 1000000) AS BIGINT)
       |     AS q
       | FROM embeddings, UNNEST(range(len(embedding))) AS t(g)),
       | v0 AS MATERIALIZED (SELECT DISTINCT dim,
       |   CAST(1000000 AS HUGEINT) AS v FROM e),
       |$steps
       |SELECT dim, CAST(v AS BIGINT) AS loading_q,
       |  round(CAST(v AS DOUBLE) / 1000000.0, 6) AS loading
       |FROM v$iterations""".stripMargin
  }
}
