package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.TextDedup

/** Dev profiler for the char near-dedup funnel (`near_dedup_chars`) —
  * the heaviest bench query. Times each funnel stage independently so a
  * regression (or an optimization) can be attributed to candidate
  * generation, signature prefilter, hashed-set verify, or the exact
  * string decision. Not part of the driver contract.
  * Usage: runMain graft.tools.ProfChars [sfDir]
  */
object ProfChars {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"${(System.nanoTime() - t0) / 1e9}%8.2f  $name%-32s rows=$n")
    }

    val docs = graft.Tables.documents(spark, sfDir)
    time("docs.count warm")(docs.count())

    val n = 5
    val numHashes = 64
    val hashed = TextDedup.charShingles(docs, n)
      .select(col("doc_id"),
        pmod(xxhash64(col("shingle")), lit(TextDedup.lshPrime)).as("x"))
      .persist()
    time("hashed shingles persist")(hashed.count())
    val sigs = TextDedup.minhashSigs(hashed, numHashes, TextDedup.lshPrime)
      .persist()
    time("minhash sigs persist")(sigs.count())
    val lsh = TextDedup.bucketPairs(
      TextDedup.bandsOf(sigs, numHashes, bands = 32))
    time("lsh band pairs")(lsh.count())
    val rare = TextDedup.pairIntersections(
      hashed.withColumnRenamed("x", "shingle"), 100)
      .select(col("doc_a"), col("doc_b"))
    time("rare-shingle pairs")(rare.count())
    val cand = lsh.unionByName(rare).distinct().persist()
    time("union distinct")(cand.count())

    val minAgree = math.max(0, math.ceil((0.5 - 0.22) * numHashes)).toInt
    val sigInts = sigs.select(col("doc_id"),
      transform(col("sig"), v => v.cast("int")).as("sig"))
    val pre = cand
      .join(sigInts.select(col("doc_id").as("doc_a"), col("sig").as("sig_a")), "doc_a")
      .join(sigInts.select(col("doc_id").as("doc_b"), col("sig").as("sig_b")), "doc_b")
      .filter(size(filter(zip_with(col("sig_a"), col("sig_b"),
        (x, y) => when(x === y, lit(1))), e => e.isNotNull)) >= minAgree)
      .select(col("doc_a"), col("doc_b"))
      .persist()
    time("stage1 sig-agreement")(pre.count())

    val iSets = hashed.groupBy(col("doc_id"))
      .agg(collect_set(col("x")).as("iset"))
      .select(col("doc_id"), col("iset"), size(col("iset")).as("ni"))
    val nearExact = pre
      .join(iSets.select(col("doc_id").as("doc_a"), col("iset").as("ia"),
        col("ni").as("na")), "doc_a")
      .join(iSets.select(col("doc_id").as("doc_b"), col("iset").as("ib"),
        col("ni").as("nb")), "doc_b")
      .withColumn("ii", size(array_intersect(col("ia"), col("ib"))))
      .filter(col("ii").cast("double") / (col("na") + col("nb") - col("ii"))
        >= 0.5 - 0.04)
      .select(col("doc_a"), col("doc_b"))
      .persist()
    time("stage2 hashed-set jaccard")(nearExact.count())
    time("stage3 exact strings")(
      TextDedup.verifyJaccard(nearExact,
        TextDedup.charShingles(docs, n), 0.5).count())

    hashed.unpersist(); sigs.unpersist(); cand.unpersist()
    pre.unpersist(); nearExact.unpersist()

    time("FULL near_dedup_chars")(
      TextDedup.nearDupJaccardChars(docs).count())
    time("FULL again")(
      TextDedup.nearDupJaccardChars(docs).count())

    spark.stop()
  }
}
