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
    * cosine >= `threshold`. Brute-force all-pairs with the codegen'd dot
    * product — exact; at corpus scale swap the crossJoin for the
    * LSH/IVF bucketing of [[ivfTopK]] (same verify step).
    */
  def cosineNearDup(embeddings: DataFrame, threshold: Double): DataFrame = {
    val a = withVec(embeddings, "vec_a", "va")
    val b = withVec(embeddings, "vec_b", "vb")
    a.crossJoin(b)
      .filter(col("vec_a") < col("vec_b"))
      .withColumn("cos", cosine(col("va"), col("vb"), col("va_norm"), col("vb_norm")))
      .filter(col("cos") >= threshold)
      .select(col("vec_a"), col("vec_b"), col("cos"))
  }

  /** IVF (inverted-file) approximate top-k: corpus vectors are assigned to
    * their nearest of `nlist` centroid vectors; each probe searches only
    * its `nprobe` nearest centroids' lists. Centroids here are seeded
    * deterministically (first `nlist` vectors) — swap in k-means
    * iterations for real data; the operator shape (assign = broadcast
    * argmax join, search = equi-join on centroid id) is the 100 TB path:
    * the crossJoin shrinks by nlist/nprobe.
    */
  def ivfTopK(embeddings: DataFrame, probes: DataFrame, k: Int,
              nlist: Int = 16, nprobe: Int = 4): DataFrame = {
    val cent = withVec(embeddings.filter(col("vec_id") < nlist), "cent_id", "g")

    def nearestCentroids(df: DataFrame, idCol: String, vecCol: String,
                         n: Int): DataFrame = {
      val w = Window.partitionBy(col(idCol))
        .orderBy(col("csim").desc, col("cent_id").asc)
      df.crossJoin(broadcast(cent))
        .withColumn("csim",
          cosine(col(vecCol), col("g"), col(s"${vecCol}_norm"), col("g_norm")))
        .withColumn("crank", row_number().over(w))
        .filter(col("crank") <= n)
        .drop("g", "g_norm", "csim", "crank")
    }

    val assigned = nearestCentroids(withVec(embeddings, "neighbor_id", "c"),
      "neighbor_id", "c", 1)
    val probed = nearestCentroids(withVec(probes, "q_id", "q"), "q_id", "q", nprobe)

    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("sim").desc, col("neighbor_id").asc)
    probed.join(assigned, "cent_id")
      .filter(col("q_id") =!= col("neighbor_id"))
      .withColumn("sim", cosine(col("q"), col("c"), col("q_norm"), col("c_norm")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("neighbor_id"), col("sim"), col("rank"))
  }
}
