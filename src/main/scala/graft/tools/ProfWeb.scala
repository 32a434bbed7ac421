package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev profiler for the composed web front-door stages (round 15): times
  * each stage of the near → sem / near → substr chains separately so a
  * slow composition can be attributed to a stage instead of guessed at.
  * Not part of the driver contract. Usage: runMain graft.tools.ProfWeb
  * [sfDir]
  */
object ProfWeb {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir", "/root/repo/target/spark-warehouse")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"${(System.nanoTime() - t0) / 1e9}%8.2f  $name%-36s rows=$n")
    }

    val stagings = graft.SparkEntry.webStagings(spark, sfDir).toMap

    def timeC(name: String)(f: => org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
      val t0 = System.nanoTime()
      val df = f
      println(f"${(System.nanoTime() - t0) / 1e9}%8.2f  $name%-36s (construction only)")
      df
    }
    // construction-only cost (what every plan dump / sweep / bench pass
    // pays BEFORE the first action)
    spark.catalog.clearCache()
    val cNear = timeC("construct webPipelineNear")(
      graft.ops.Text.webPipelineNear(stagings("web_near")))
    time("  then count")(cNear.count())
    spark.catalog.clearCache()
    val cSub = timeC("construct webPipelineSubstr")(
      graft.ops.Text.webPipelineSubstr(stagings("web_substr")))
    time("  then count")(cSub.count())
    spark.catalog.clearCache()
    val cSub2 = timeC("construct webPipelineSubstr again")(
      graft.ops.Text.webPipelineSubstr(stagings("web_substr")))
    time("  then count again")(cSub2.count())
    spark.catalog.clearCache()

    // near tail decomposed: construct (analysis only) vs count (exec)
    // vs the outer ckpt's toRdd (AQE executes stages there)
    val nt = timeC("substr: near tail construct")(
      graft.ops.Text.webNearTail(
        graft.ops.Text.webPipeline(stagings("web_substr")), keepText = true))
    time("substr: near tail count (no ckpt)")(nt.count())
    time("substr: near tail count again")(nt.count())
    val nt2 = timeC("substr: outer ckpt call (toRdd)")(nt.localCheckpoint(false))
    time("substr: ckpt count")(nt2.count())
    spark.catalog.clearCache()

    // baseline chain costs, fresh cache per block
    time("webPipeline(near staging)")(
      graft.ops.Text.webPipeline(stagings("web_near")).count())
    spark.catalog.clearCache()
    time("webPipelineNear(near staging)")(
      graft.ops.Text.webPipelineNear(stagings("web_near")).count())
    spark.catalog.clearCache()
    time("webPipelineNear(substr staging)")(
      graft.ops.Text.webPipelineNear(stagings("web_substr")).count())
    spark.catalog.clearCache()

    // substr decomposed: materialize the near ledger first (the
    // registered op's lazy localCheckpoint), then each downstream leg
    // against the materialized cut
    val near = graft.ops.Text.webNearTail(
      graft.ops.Text.webPipeline(stagings("web_substr")), keepText = true)
      .localCheckpoint(false)
    time("near ledger materialize (ckpt)")(near.count())
    val kept = near.filter(col("status") === "kept")
      .select(col("doc_id"), col("text_clean").as("text"))
    time("kept slice")(kept.count())
    val ws = split(col("text"), " ")
    val grams = graft.ops.Par.widen(kept)
      .filter(size(ws) >= 8)
      .select(col("doc_id"),
        posexplode(transform(sequence(lit(0), size(ws) - lit(8)),
          i => array_join(slice(ws, i + 1, lit(8)), " ")))
          .as(Seq("pos", "gram")))
      .select(col("doc_id"), col("pos"),
        xxhash64(col("gram")).as("g64"), hash(col("gram")).as("g32"))
    time("grams explode+hash")(grams.count())
    val firstWin = org.apache.spark.sql.expressions.Window
      .partitionBy(col("g64"), col("g32"))
      .orderBy(col("doc_id"), col("pos"))
    val flagged = grams
      .withColumn("rn", org.apache.spark.sql.functions.row_number().over(firstWin))
      .filter(col("rn") > 1)
      .groupBy(col("doc_id"))
      .agg(sort_array(collect_set(col("pos"))).as("starts"))
    time("flagged starts (window+rollup)")(flagged.count())
    time("exactSubstrDedup(kept) full")(
      graft.ops.TextDedup.exactSubstrDedup(kept).count())
    time("full substr join vs cut")(
      near.join(graft.ops.TextDedup.exactSubstrDedup(kept)
          .select(col("doc_id"), col("n_removed")), Seq("doc_id"), "left")
        .count())
    spark.catalog.clearCache()
    time("webPipelineSubstr cold")(
      graft.ops.Text.webPipelineSubstr(stagings("web_substr")).count())
    spark.catalog.clearCache()

    // sem decomposed
    val nearS = graft.ops.Text.webNearTail(
      graft.ops.Text.webPipeline(stagings("web_sem"))).persist()
    time("sem: near ledger materialize")(nearS.count())
    val vecs = graft.SparkEntry.semMarginVectors(spark, sfDir)
    time("sem: candidate vectors")(vecs.count())
    time("sem: cosineNearDup vs warm cache")(
      graft.ops.Similarity.cosineNearDup(vecs, 0.9, 8, 16).count())
    nearS.unpersist()
    spark.catalog.clearCache()
    time("webPipelineSem cold")(
      graft.SparkEntry.queries("web_pipeline_sem")(spark, sfDir).count())
    spark.stop()
  }
}
