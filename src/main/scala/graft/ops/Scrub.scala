package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Text scrubbing for LLM training corpora (SURVEY §2.8 [EXT]): PII
  * redaction and corpus-level boilerplate removal — the two cleanup
  * passes that sit between ingestion and dedup in a production data
  * pipeline.
  */
object Scrub {

  /** Redaction patterns — kept to syntax shared by Java regex (Spark) and
    * RE2 (DuckDB oracle): character classes, bounded repeats, \b, \d.
    */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Re  = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  val PhoneRe = "\\b\\d{3}-\\d{4}\\b"

  /** PII redaction: replace emails, IPv4 addresses, and phone-shaped
    * digit runs with typed placeholders, and count each category before
    * redaction (the counts feed a privacy audit table). Pure codegen'd
    * projection — zero shuffles, zero UDFs; at 100 TB this runs at scan
    * speed fused into whichever stage reads the text.
    *
    * Order matters: emails first (an email must not be partially eaten by
    * a later pattern), then IPs, then phones — the patterns are disjoint
    * on any single span, so sequential application is safe.
    */
  def piiRedact(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    def n(re: String) = size(regexp_extract_all(t, lit(re), lit(0))).cast("long")
    docs.select(
      col("doc_id"),
      regexp_replace(
        regexp_replace(
          regexp_replace(t, EmailRe, "<EMAIL>"),
          Ipv4Re, "<IP>"),
        PhoneRe, "<PHONE>").as("clean_text"),
      n(EmailRe).as("n_emails"),
      n(Ipv4Re).as("n_ips"),
      n(PhoneRe).as("n_phones"))
  }

  /** Right-to-erasure (GDPR art. 17) propagation audit: given a
    * forget-set of user ids, report per table how many rows the delete
    * removes and how many remain. The deletes themselves are anti-joins
    * (broadcast — forget sets are small relative to any fact table);
    * this op is the compliance evidence that belongs in the audit log
    * next to the reference's load audits. One aggregate per table, no
    * table scanned twice.
    */
  def gdprDeleteAudit(tables: Seq[(String, DataFrame, Column)],
                      forgetIds: DataFrame): DataFrame = {
    val forget = broadcast(forgetIds.select(col("forget_id")).distinct())
    tables.map { case (name, df, keyCol) =>
      df.select(keyCol.as("forget_id"))
        .join(forget.withColumn("hit", lit(1)), Seq("forget_id"), "left_outer")
        .agg(sum(when(col("hit").isNotNull, 1L).otherwise(0L)).as("n_deleted"),
             sum(when(col("hit").isNull, 1L).otherwise(0L)).as("n_remaining"))
        .select(lit(name).as("table_name"), col("n_deleted"), col("n_remaining"))
    }.reduce(_ unionByName _)
  }

  /** Corpus-level boilerplate removal: drop every token whose document
    * frequency exceeds `dfFrac` of the corpus (site chrome, license
    * headers, navigation text — whatever almost every document repeats),
    * preserving the order of surviving tokens.
    *
    * Shape at scale: the document-frequency aggregation shuffles distinct
    * (doc, word) pairs once; the stop list (tiny by construction — only
    * words in > dfFrac of ALL documents) broadcasts into a left-anti
    * join; ordered reassembly groups by doc_id. Documents whose every
    * token is boilerplate survive with empty clean_text (left join).
    */
  def boilerplateStrip(docs: DataFrame, dfFrac: Double = 0.5): DataFrame = {
    val words = split(col("text"), " ")
    val nDocs = docs.agg(count(lit(1)).as("n_docs"))
    val stop = docs
      .select(col("doc_id"), explode(array_distinct(words)).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("df"))
      .crossJoin(nDocs) // 1-row build side: broadcast nested loop
      .filter(col("df") > col("n_docs") * lit(dfFrac))
      .select(col("word"))
    val toks = Par.widen(docs)
      .select(col("doc_id"), posexplode(words).as(Seq("pos", "word")))
    val kept = toks.join(broadcast(stop), Seq("word"), "left_anti")
    docs.select(col("doc_id"))
      .join(kept, Seq("doc_id"), "left_outer")
      .groupBy(col("doc_id"))
      .agg(
        // null word (doc fully boilerplate) → when()=null → skipped by collect_list
        array_join(transform(
          array_sort(collect_list(when(col("word").isNotNull,
            struct(col("pos"), col("word"))))),
          x => x.getField("word")), " ").as("clean_text"),
        count(col("word")).as("n_kept"))
  }

  /** k-anonymity audit: group rows by a quasi-identifier tuple and emit
    * every equivalence class smaller than `k` — the cells where a row's
    * quasi-identifiers suffice to re-identify an individual (Sweeney's
    * k-anonymity criterion; the release gate that belongs next to
    * [[piiRedact]] and [[gdprDeleteAudit]] in a governance pipeline).
    * Output: the quasi-identifier columns + `n` (class size) + `at_risk`
    * (= n, the rows that would need suppression or generalization),
    * violating classes only.
    *
    * Scale: ONE hash aggregate over the quasi-identifier key — the same
    * shuffle any groupBy pays, map-side partials included; output is
    * violation-sized, not data-sized. Class sizes are integers, so the
    * report is bit-reproducible.
    */
  def kAnonymity(df: DataFrame, quasi: Seq[Column], k: Int): DataFrame = {
    require(k >= 2, s"k must be >= 2, got $k")
    df.groupBy(quasi: _*)
      .agg(count(lit(1)).as("n"))
      .filter(col("n") < k)
      .withColumn("at_risk", col("n"))
  }

  /** l-diversity audit — [[kAnonymity]]'s necessary complement: a
    * class can be large (k-anonymous) yet still leak if every member
    * shares the same SENSITIVE value. Reports each quasi-identifier
    * class whose count of distinct sensitive values is below `l`,
    * with both the class size and its diversity. One map-side-
    * combined aggregation; violation-sized output.
    */
  def lDiversity(df: DataFrame, quasi: Seq[Column], sensitive: Column,
                 l: Int): DataFrame = {
    require(l >= 2, s"l must be >= 2, got $l")
    df.groupBy(quasi: _*)
      .agg(count(lit(1)).as("n"),
        count_distinct(sensitive).as("l_div"))
      .filter(col("l_div") < l)
  }

  /** t-closeness audit (Li/Li/Venkatasubramanian 2007) — the third rung
    * of the release-gate ladder after [[kAnonymity]] and [[lDiversity]]:
    * a class can be large AND diverse yet still leak if its SENSITIVE
    * distribution differs from the corpus-wide one (e.g. one store-day
    * whose transactions are all high-value). For an ORDERED numeric
    * sensitive attribute the Earth Mover's Distance has the closed form
    * EMD = (1/(m-1)) * sum_j |CumP_j - CumQ_j| over the m value buckets,
    * which this op evaluates as exact integers: with class cumulative
    * count cumC, global cumulative cumG, class size n and corpus size N,
    * each term is |cumC*N - cumG*n| / (n*N), so the reported
    * emd = sum_j |cumC_j*N - cumG_j*n| / (n*N*(m-1)) is ONE rounded
    * division of an exact DECIMAL(38,0) numerator — bit-reproducible.
    *
    * Scale: two hash aggregates (class x bucket, bucket) plus a
    * classes x buckets grid join — classes are QI-cardinality (audit
    * policy keeps this bounded: type x day here), buckets are
    * value-domain-sized at `bucketWidth` granularity, so the grid is
    * audit-sized, never data-sized. The per-class cumsum windows
    * partition by class; the only global window is over the bucket
    * domain (the [[Profile.aucRank]] score-domain discipline).
    */
  def tCloseness(df: DataFrame, quasi: Seq[Column], sensitive: Column,
                 bucketCents: Long = 5000L, t: Double = 0.2): DataFrame = {
    require(bucketCents > 0, s"bucketCents must be > 0, got $bucketCents")
    val big = DecimalType(38, 0)
    // integral floor-div: cents - pmod(cents, w) is divisible by w, so
    // the one double division below is exact by construction
    val cents = round(sensitive * lit(100)).cast("long")
    val bucket = ((cents - pmod(cents, lit(bucketCents)))
      / lit(bucketCents)).cast("long")
    val base = df.select(quasi :+ bucket.as("b"): _*)
    val qNames = base.columns.dropRight(1).toSeq
    val qCols = qNames.map(col)

    val global = base.groupBy(col("b")).agg(count(lit(1)).as("g"))
    val wg = Window.orderBy(col("b"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val gCum = global.withColumn("cum_g", sum(col("g")).over(wg))
      .select(col("b"), col("cum_g"))
    val totals = global.agg(sum(col("g")).cast(big).as("nn"),
      count(lit(1)).cast(big).as("m"))

    val classes = base.groupBy(qCols: _*).agg(count(lit(1)).as("n"))
    val classCnt = base.groupBy(qCols :+ col("b"): _*)
      .agg(count(lit(1)).as("c"))
    val grid = classes.crossJoin(gCum) // classes x bucket-domain audit grid
      .join(classCnt, qNames :+ "b", "left")
      .withColumn("c0", coalesce(col("c"), lit(0L)))
    val wc = Window.partitionBy(qCols: _*).orderBy(col("b"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val perClass = grid
      .withColumn("cum_c", sum(col("c0")).over(wc))
      .crossJoin(broadcast(totals))
      .groupBy(qCols :+ col("n") :+ col("nn") :+ col("m"): _*)
      .agg(sum(abs(col("cum_c").cast(big) * col("nn")
        - col("cum_g").cast(big) * col("n").cast(big))).as("num"))
    perClass.select(qCols ++ Seq(
      col("n"),
      when(col("m") > 1, round(col("num").cast("double")
        / (col("n").cast(big) * col("nn") * (col("m") - 1)).cast("double"),
        6)).otherwise(lit(0.0)).as("emd")): _*)
      .withColumn("violates", col("emd") > lit(t))
  }
}
