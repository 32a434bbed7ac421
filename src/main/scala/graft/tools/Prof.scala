package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev profiler: times individual stages of the heavy operators so bench
  * regressions can be attributed. Not part of the driver contract.
  * Usage: runMain graft.tools.Prof [sfDir]
  */
object Prof {
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
      println(f"${(System.nanoTime() - t0) / 1e9}%8.2f  $name%-28s rows=$n")
    }

    val docs = graft.Tables.documents(spark, sfDir)
    time("docs.count warm")(docs.count())
    time("docs.count again")(docs.count())

    val sh = graft.ops.TextDedup.shingles(docs, 3)
    time("shingles explode+distinct")(sh.count())
    val shP = sh.persist()
    time("shingles persist")(shP.count())
    time("doc sizes")(shP.groupBy(col("doc_id")).agg(count(lit(1))).count())
    val postings = shP.groupBy(col("shingle"))
      .agg(sort_array(collect_list(col("doc_id"))).as("ds"))
      .filter(size(col("ds")) >= 2 && size(col("ds")) <= 1000)
    time("postings")(postings.count())
    time("full near_dedup")(
      graft.ops.TextDedup.nearDupJaccard(docs).count())
    shP.unpersist()

    time("fingerprint")(graft.ops.Text.docFingerprint(docs).count())
    time("minhash full")(graft.ops.TextDedup.minhashLshPairs(docs).count())
    time("minhash full again")(graft.ops.TextDedup.minhashLshPairs(docs).count())

    val emb = graft.Tables.embeddings(spark, sfDir)
    time("brute topk")(graft.ops.Similarity.bruteForceTopK(emb,
      emb.filter(col("vec_id") < 32), 5).count())
    time("brute topk again")(graft.ops.Similarity.bruteForceTopK(emb,
      emb.filter(col("vec_id") < 32), 5).count())
    time("ann")(graft.ops.Similarity.ivfTopK(emb,
      emb.filter(col("vec_id") < 32), 5).count())
    time("ann again")(graft.ops.Similarity.ivfTopK(emb,
      emb.filter(col("vec_id") < 32), 5).count())
    time("near_dup LSH full")(
      graft.ops.Similarity.cosineNearDup(emb, 0.5).count())
    time("near_dup LSH again")(
      graft.ops.Similarity.cosineNearDup(emb, 0.5).count())
    time("near_dup exact (ref)")(
      graft.ops.Similarity.cosineNearDupExact(emb, 0.5).count())
    time("kmeans ann")(graft.ops.Similarity.ivfTopK(emb,
      emb.filter(col("vec_id") < 32), 5, kmeansIters = 2).count())

    spark.stop()
  }
}
