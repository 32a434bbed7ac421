package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Record linkage (entity resolution): match dirty free-text records to a
  * canonical catalog with blocked candidate generation + edit-distance
  * verification — the classic two-phase shape (Fellegi–Sunter blocking)
  * that keeps fuzzy matching sub-quadratic. The reference pipeline's
  * dedup (`/root/reference/pipeline/data_pipeline.py:108-114`) only
  * handles exact duplicates; this is the extension a real ingest needs
  * when keys are typed by humans.
  *
  * Scale: the catalog side is DISTINCT names (canonical entities), which
  * is orders of magnitude smaller than the record stream — 64 names vs
  * 20k records on the test corpus, dictionary-vs-corpus in production —
  * so the blocked join broadcasts the catalog. Candidates are generated
  * by TWO equi-join blockings (3-char name prefix ∪ 3-char suffix) and
  * only candidates pay the Levenshtein; nothing is all-pairs.
  *
  * Recall guarantee (spec-asserted): for a single-character deletion at
  * 1-based position `pos ∈ [1, len-1]` of a name with `len >= 7`, either
  * `pos > 3` (prefix of 3 intact) or `pos <= len-3` (suffix of 3
  * intact) — both blockings can only miss simultaneously if the name is
  * shorter than 7 chars. Multi-pass blocking over complementary keys is
  * exactly how production linkage gets recall without pair explosion.
  */
object Linkage {

  /** Deterministic "dirty" variant of each record's name: delete one
    * character at position `1 + (id % (len-1))` — a reproducible typo
    * both engines can re-derive, so the oracle verifies the whole
    * pipeline end-to-end (no random noise, same convention as the
    * multimodal encode parameters).
    */
  def dirtyName(id: Column, name: Column): Column = {
    val pos = (id % greatest(length(name) - 1, lit(1)) + 1).cast("int")
    // names shorter than 2 chars have nothing to delete (and len-1 = 0
    // would make the modulus throw under ANSI); pass them through
    when(length(name) < 2, name)
      .otherwise(concat(name.substr(lit(1), pos - 1),
        name.substr(pos + 1, length(name))))
  }

  /** Link each dirty record to its best catalog entity. Output: one row
    * per record with the chosen canonical name/key, the edit distance,
    * and how many blocked candidates were verified (the audit trail a
    * production linkage job emits).
    */
  def resolveEntities(records: DataFrame, id: Column, name: Column,
                      maxLev: Int = 2): DataFrame = {
    val dirty = records
      .select(id.as("rec_id"), dirtyName(id, name).as("dirty_name"))
    // canonical catalog: distinct names, stable key = min record id
    val catalog = records
      .groupBy(name.as("canon_name"))
      .agg(min(id).as("canon_key"))
    def keys(c: Column): (Column, Column) =
      (substring(c, 1, 3), substring(c, -3, 3))
    val (dp, ds) = keys(col("dirty_name"))
    val (cp, cs) = keys(col("canon_name"))
    val byPrefix = dirty.withColumn("blk", dp)
      .join(broadcast(catalog.withColumn("blk", cp)), "blk")
    val bySuffix = dirty.withColumn("blk", ds)
      .join(broadcast(catalog.withColumn("blk", cs)), "blk")
    val candidates = byPrefix.unionByName(bySuffix)
      .select(col("rec_id"), col("dirty_name"), col("canon_name"),
              col("canon_key"))
      .distinct()
      .withColumn("lev", levenshtein(col("dirty_name"), col("canon_name")))
    // keep-best per record: min distance, name asc tie-break; the
    // n_candidates audit rides the same aggregation (no second scan)
    candidates
      .groupBy(col("rec_id"), col("dirty_name"))
      .agg(
        min(struct(col("lev"), col("canon_name"), col("canon_key")))
          .as("best"),
        count(lit(1)).as("n_candidates"),
        sum(when(col("lev") <= maxLev, 1L).otherwise(0L)).as("n_within"))
      .select(col("rec_id"), col("dirty_name"),
        col("best.canon_name").as("match_name"),
        col("best.canon_key").as("match_key"),
        col("best.lev").as("lev"),
        col("n_candidates"), col("n_within"))
  }

  /** ALL pairs of distinct names at edit distance EXACTLY 1, without an
    * all-pairs scan: deletion-neighborhood blocking (FastSS, Bocek et
    * al. 2007). Each name emits its |w| single-deletion variants tagged
    * with the deleted position; then
    *  - same (variant, position) from two names  ⟺  they differ by one
    *    SUBSTITUTION at that position (same length, equal elsewhere);
    *  - a full name equal to another name's variant  ⟺  one
    *    INSERTION/DELETION apart.
    * Both directions are exact — precision AND recall 1.0 by
    * construction (no Levenshtein verify pass needed; the emitted `lev`
    * column is definitionally 1), unlike [[resolveEntities]]'s
    * prefix∪suffix blocking whose recall argument needs a length bound.
    *
    * Scale: the index is Σ|w| rows of (variant, pos, name) — corpus
    * tokens, not corpus² — and the equi-join groups are bounded by
    * alphabet size per (variant, pos) key (≤ |Σ| names can substitute
    * one position), so no key is ever hot. This is the dictionary-side
    * primitive of spelling correction / query rewriting at web scale.
    */
  def typoPairs(df: DataFrame, name: Column): DataFrame = {
    val words = df.select(name.as("w")).distinct()
      .filter(length(col("w")) >= 1)
      .persist()
    val dels = words.select(col("w"), expr(
      """explode(transform(sequence(0, length(w) - 1),
         i -> struct(concat(substring(w, 1, i), substring(w, i + 2)) AS k,
                     i AS pos)))""").as("d"))
      .select(col("w"), col("d.k").as("k"), col("d.pos").as("pos"))
      .persist()
    val subs = dels.select(col("k"), col("pos"), col("w").as("name_a"))
      .join(dels.select(col("k"), col("pos"), col("w").as("name_b")),
        Seq("k", "pos"))
      .filter(col("name_a") < col("name_b"))
      .select(col("name_a"), col("name_b"))
    val indel = dels.select(col("k"), col("w"))
      .join(words.select(col("w").as("k"), col("w").as("short")), Seq("k"))
      .select(least(col("w"), col("short")).as("name_a"),
        greatest(col("w"), col("short")).as("name_b"))
    // words/dels stay hot until the result is consumed (the harness
    // clears cache per query)
    subs.unionByName(indel).distinct()
      .withColumn("lev", lit(1))
  }
}
