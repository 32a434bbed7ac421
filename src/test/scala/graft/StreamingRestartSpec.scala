package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Exactly-once across restarts: a streaming aggregation stopped and
  * restarted from its checkpoint must neither lose nor double-count the
  * files it already processed — the property that makes the file-backed
  * harness (and any production deployment) restart-safe.
  */
class StreamingRestartSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("foreachBatch maintenance resumes exactly from a written " +
       "snapshot: parquet-roundtripped mid-feed KMV state + the " +
       "remaining feed == the full-feed sketch") {
    // the SCALE.md honest-limits operational contract, executed: the
    // maintained view is a pure associative+commutative merge, so
    // write-snapshot / reload / merge-the-rest is exact resume
    import graft.ops.Profile
    import org.apache.spark.sql.functions._
    val events = Tables.events(spark, "/root/testdata/sf0.001")
      .select(col("event_id"), col("event_type"), col("value"))
    val (g, i, v) = (col("event_type"), col("event_id"), col("value"))
    val k = 256
    val full = Profile.bottomKMerge(
      Profile.bottomKSample(events, g, i, v, k), k)
    // "crash" after half the feed: snapshot state to parquet
    val half1 = events.filter(col("event_id") % 2 === 0)
    val half2 = events.filter(col("event_id") % 2 === 1)
    val snapDir = java.nio.file.Files
      .createTempDirectory("graft-resume").toString + "/state"
    Profile.bottomKSample(half1, g, i, v, k)
      .write.mode("overwrite").parquet(snapDir)
    // restart: reload the snapshot, merge only the unprocessed half
    val resumed = Profile.bottomKMerge(
      spark.read.parquet(snapDir)
        .unionByName(Profile.bottomKSample(half2, g, i, v, k)), k)
    val key = (df: org.apache.spark.sql.DataFrame) =>
      df.select("g", "id", "c").as[(String, Long, Long)].collect().toSet
    assert(key(resumed) === key(full))
    assert(key(full).nonEmpty)
  }

  test("windowed counts survive a stop/restart from checkpoint without double-counting") {
    val root = java.nio.file.Files.createTempDirectory("graft-restart").toString
    val src = s"$root/src"
    val ckpt = s"$root/ckpt"
    val events = Tables.events(spark, "/root/testdata/sf0.001")
      .select(col("event_id"), col("ts"), col("event_type"))

    val firstHalf = events.filter(col("event_id") % 2 === 0)
    val secondHalf = events.filter(col("event_id") % 2 === 1)
    firstHalf.coalesce(2).write.mode("overwrite").parquet(src)

    def start(name: String) = spark.readStream
      .schema(events.schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(src)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .writeStream.format("memory").queryName(name)
      .option("checkpointLocation", ckpt)
      .outputMode("complete").start()

    // phase 1: process the first half, then stop
    val q1 = start("graft_restart_1")
    q1.processAllAvailable(); q1.stop()

    // phase 2: more files arrive while the query is down; restart from
    // the SAME checkpoint (fresh sink table — complete mode rewrites it)
    secondHalf.coalesce(2).write.mode("append").parquet(src)
    val q2 = start("graft_restart_2")
    q2.processAllAvailable(); q2.stop()

    val streamed = spark.table("graft_restart_2")
      .select(col("window.start"), col("event_type"), col("n"))
      .as[(java.sql.Timestamp, String, Long)].collect().toSet
    val batch = events
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start"), col("event_type"), col("n"))
      .as[(java.sql.Timestamp, String, Long)].collect().toSet
    assert(streamed === batch)
  }

  test("curation front door: kill mid-feed + restart from checkpoint " +
       "keeps the closed-feed verdict readout exactly-once (r11 " +
       "verdict stretch 7)") {
    // The production failure mode for the staging-sink ingest: the
    // stream dies with part of the feed undelivered, a new incarnation
    // resumes against the SAME checkpoint + sink. The parquet sink's
    // file-commit protocol (_spark_metadata) must yield each staged row
    // exactly once — a resume bug shows up as duplicate rows (double
    // verdict counts) or lost rows (missing docs) in the readout.
    import graft.streaming.Streaming
    val root = java.nio.file.Files
      .createTempDirectory("graft-curation-restart").toString
    val (src, sink, ckpt) = (s"$root/src", s"$root/sink", s"$root/ckpt")
    val raw = Tables.events(spark, "/root/testdata/sf0.001")
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("value"), col("props"))
    val render = (df: org.apache.spark.sql.DataFrame) =>
      df.select(col("event_id").as("doc_id"),
        concat_ws(" ", lit("Café"),
          coalesce(col("event_type"), lit("null")),
          coalesce(col("user_id").cast("string"), lit("null"))).as("text"))

    // feed wave 1 only (2 files = 1 micro-batch at maxFilesPerTrigger=2),
    // run, and "crash" — wave 2 is still undelivered at kill time
    val wave1 = raw.filter(col("event_id") % 2 === 0)
    val wave2 = raw.filter(col("event_id") % 2 === 1)
    wave1.coalesce(2).write.mode("overwrite").parquet(src)
    val schema1 =
      Streaming.runCurationStream(spark, raw.schema, render, src, sink, ckpt)

    // restart: the rest of the feed arrives, the new incarnation resumes
    // from the SAME checkpoint and must process ONLY the new files
    wave2.coalesce(2).write.mode("append").parquet(src)
    val schema2 =
      Streaming.runCurationStream(spark, raw.schema, render, src, sink, ckpt)
    assert(schema1 === schema2)

    // exactly-once at the row level: every doc staged once, none lost
    val staged = spark.read.schema(schema2).parquet(sink)
    assert(staged.count() === raw.count())
    assert(staged.groupBy(col("doc_id")).count()
      .filter(col("count") > 1).count() === 0L, "duplicate staged docs")

    // and the verdict readout hash-equals the batch front door on the
    // same corpus (the same literal tail both run)
    val streamed = Streaming.curationReadout(spark, schema2, sink, 3, 0.5)
    val batch = graft.ops.TextDedup.curationPipeline(render(raw))
    val k = (df: org.apache.spark.sql.DataFrame) =>
      df.collect().map(_.toSeq).toSet
    assert(k(streamed) === k(batch))
    assert(streamed.count() > 0)
  }

  // ---- round 13 (r12 verdict item 4): the foreachBatch upsert family --

  private def rowSet(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(_.toSeq).toSet

  test("streaming upsert: kill mid-feed + restart from checkpoint, " +
       "then a no-new-files incarnation — snapshot stays exactly the " +
       "batch latest-wins, never double-applied") {
    import graft.streaming.Streaming
    import graft.ops.Dedup
    val root = java.nio.file.Files
      .createTempDirectory("graft-upsert-restart").toString
    val (src, snap, ckpt) = (s"$root/src", s"$root/snap", s"$root/ckpt")
    val keys = Seq("user_id", "event_type")
    val events = Tables.events(spark, "/root/testdata/sf0.001")
      .select(col("event_id"), col("ts"), col("user_id"),
        col("event_type"), col("value"))

    // seed v=-1 with the even half (the registered op's target split)
    val seed = Dedup.dedupLatest(events.filter(col("event_id") % 2 === 0),
      keys, col("ts"), Seq(col("event_id")))
    seed.write.mode("overwrite").parquet(Streaming.snapshotDir(snap, -1L))

    def pass(): Unit = Streaming.runSnapshotMaintenance(
      spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1).parquet(src),
      Streaming.upsertMerge(keys), snap, ckpt)

    // phase 1: half the stream arrives (2 files = 2 micro-batches),
    // then the query dies
    val odd = events.filter(col("event_id") % 2 === 1)
    odd.filter(col("event_id") % 4 === 1).coalesce(2)
      .write.mode("overwrite").parquet(src)
    pass()

    // phase 2: the rest arrives while down; restart on the SAME
    // checkpoint must process only the new files
    odd.filter(col("event_id") % 4 === 3).coalesce(2)
      .write.mode("append").parquet(src)
    pass()
    val afterRestart = rowSet(Streaming.latestSnapshot(spark, snap))

    // phase 3: an incarnation with NOTHING new to do — the snapshot
    // must not move (a double-apply bug shows up here even for
    // non-idempotent merges)
    pass()
    assert(rowSet(Streaming.latestSnapshot(spark, snap)) === afterRestart)

    val batch = Dedup.dedupLatest(events, keys, col("ts"),
      Seq(col("event_id")))
    assert(afterRestart === rowSet(batch))
    assert(afterRestart.nonEmpty)
  }

  test("streaming CDC apply: kill mid-log + restart from checkpoint — " +
       "replicated state (tombstones included) equals the batch " +
       "collapse of the full log") {
    import graft.streaming.Streaming
    val root = java.nio.file.Files
      .createTempDirectory("graft-cdc-restart").toString
    val (src, snap, ckpt) = (s"$root/src", s"$root/snap", s"$root/ckpt")
    val keys = Seq("user_id", "event_type")
    val log = Tables.events(spark, "/root/testdata/sf0.001")
      .select(col("event_id"), col("ts"), col("user_id"),
        col("event_type"), col("value"))
      .withColumn("op",
        when(col("event_id") % 10 === 0, "D")
          .when(col("event_id") % 10 < 4, "I").otherwise("U"))

    // seed v=-1 with the even half collapsed (the registered split)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keys.map(col): _*)
      .orderBy(col("ts").desc, col("event_id").desc)
    def collapse(df: org.apache.spark.sql.DataFrame) =
      df.withColumn("__rn", org.apache.spark.sql.functions.row_number()
        .over(w)).filter(col("__rn") === 1).drop("__rn")
    collapse(log.filter(col("event_id") % 2 === 0))
      .write.mode("overwrite").parquet(Streaming.snapshotDir(snap, -1L))

    def pass(): Unit = Streaming.runSnapshotMaintenance(
      spark.readStream.schema(log.schema)
        .option("maxFilesPerTrigger", 1).parquet(src),
      Streaming.cdcMerge(keys), snap, ckpt)

    val odd = log.filter(col("event_id") % 2 === 1)
    odd.filter(col("event_id") % 4 === 1).coalesce(2)
      .write.mode("overwrite").parquet(src)
    pass()
    odd.filter(col("event_id") % 4 === 3).coalesce(2)
      .write.mode("append").parquet(src)
    pass()
    val afterRestart = rowSet(Streaming.latestSnapshot(spark, snap))
    pass() // nothing new: must be a no-op
    assert(rowSet(Streaming.latestSnapshot(spark, snap)) === afterRestart)

    // tombstone-retaining state == one collapse of the ENTIRE log
    assert(afterRestart === rowSet(collapse(log)))
    // and the served view (tombstones filtered) matches the batch
    // cdcApply contract the registered oracle verifies
    val served = Streaming.latestSnapshot(spark, snap)
      .filter(col("op") =!= "D").drop("op")
    assert(rowSet(served) ===
      rowSet(collapse(log).filter(col("op") =!= "D").drop("op")))
    assert(rowSet(served).nonEmpty)
  }

  // ---- round 14 (r13 verdict item 4): the remaining foreachBatch ----
  // ---- maintainers, migrated off executor memory ---------------------

  /** Drive `merge` through kill/restart/no-op-replay on a 2-wave file
    * feed: wave 1 → crash → wave 2 arrives while down → restart on the
    * SAME checkpoint → an incarnation with nothing new (the
    * double-apply probe for non-idempotent merges). Returns the final
    * snapshot. Shared by the five round-14 family proofs — the same
    * runSnapshotMaintenance + merge fn the registered ops run.
    */
  private def killRestartReplay(feed: org.apache.spark.sql.DataFrame,
      merge: (org.apache.spark.sql.DataFrame,
              org.apache.spark.sql.DataFrame) => org.apache.spark.sql.DataFrame,
      seed: org.apache.spark.sql.DataFrame,
      splitCol: String, tag: String): org.apache.spark.sql.DataFrame = {
    import graft.streaming.Streaming
    val root = java.nio.file.Files
      .createTempDirectory(s"graft-$tag-restart").toString
    val (src, snap, ckpt) = (s"$root/src", s"$root/snap", s"$root/ckpt")
    seed.repartition(1)
      .write.mode("overwrite").parquet(Streaming.snapshotDir(snap, -1L))
    def pass(): Unit = Streaming.runSnapshotMaintenance(
      spark.readStream.schema(feed.schema)
        .option("maxFilesPerTrigger", 1).parquet(src),
      merge, snap, ckpt)
    feed.filter(col(splitCol) % 2 === 0).coalesce(2)
      .write.mode("overwrite").parquet(src)
    pass() // phase 1: half the feed, then the query dies
    feed.filter(col(splitCol) % 2 === 1).coalesce(2)
      .write.mode("append").parquet(src)
    pass() // phase 2: restart on the same checkpoint
    val afterRestart = rowSet(Streaming.latestSnapshot(spark, snap))
    pass() // phase 3: nothing new — must be a no-op even for
           // non-idempotent merges (the replay double-apply probe)
    assert(rowSet(Streaming.latestSnapshot(spark, snap)) === afterRestart,
      s"$tag: a no-new-files incarnation moved the snapshot")
    assert(afterRestart.nonEmpty, s"$tag: empty final snapshot")
    // GC contract: only the current version and its merge base may
    // remain on storage, however many batches the feed produced
    assert(Streaming.snapshotVersions(snap,
        spark.sparkContext.hadoopConfiguration).size <= 2,
      s"$tag: old snapshot versions not GC'd: " +
        Streaming.snapshotVersions(snap,
          spark.sparkContext.hadoopConfiguration).mkString(","))
    Streaming.latestSnapshot(spark, snap)
  }

  private def events0001 = Tables.events(spark, "/root/testdata/sf0.001")

  test("agg maintenance (round 14): kill/restart/replay lands exactly " +
       "the batch buildAgg recompute — the non-idempotent decomposable " +
       "merge never double-counts") {
    import graft.streaming.Streaming
    import graft.ops.Changelog
    val keys = Seq("user_id", "event_type")
    val events = events0001.select(col("event_id"), col("ts"),
      col("user_id"), col("event_type"), col("value"))
    val fin = killRestartReplay(events, Streaming.aggMerge(keys),
      Changelog.buildAgg(events.limit(0), keys, col("value")),
      "event_id", "agg")
    assert(rowSet(fin) ===
      rowSet(Changelog.buildAgg(events, keys, col("value"))))
  }

  test("HLL register maintenance (round 14): kill/restart/replay lands " +
       "the batch daily-register table bit-for-bit") {
    import graft.streaming.Streaming
    import graft.ops.Profile
    val events = events0001.select(col("event_id"), col("ts"),
      col("user_id"))
    val fin = killRestartReplay(events, Streaming.hllMerge,
      Profile.hllDailyRegs(events.limit(0), col("ts"), col("user_id")),
      "event_id", "hll")
    assert(rowSet(fin) ===
      rowSet(Profile.hllDailyRegs(events, col("ts"), col("user_id"))))
  }

  test("heavy-hitter count maintenance (round 14): kill/restart/replay " +
       "lands the exact full-feed counts — union+re-sum never " +
       "double-applied") {
    import graft.streaming.Streaming
    val events = events0001.select(col("event_id"), col("user_id"))
    val fin = killRestartReplay(events, Streaming.countMerge,
      events.limit(0).groupBy(col("user_id").as("key"))
        .agg(count(lit(1)).as("n")),
      "event_id", "hh")
    assert(rowSet(fin) === rowSet(
      events.groupBy(col("user_id").as("key")).agg(count(lit(1)).as("n"))))
  }

  test("KMV bottom-k maintenance (round 14): kill/restart/replay lands " +
       "the batch sketch — the multiset-union merge is the exact class " +
       "the versioned replay guarantee exists for") {
    import graft.streaming.Streaming
    import graft.ops.Profile
    val k = 256
    val events = events0001.select(col("event_id"), col("event_type"),
      col("value"))
    val fin = killRestartReplay(events, Streaming.sketchMerge(k),
      Profile.bottomKSample(events.limit(0), col("event_type"),
        col("event_id"), col("value"), k),
      "event_id", "kmv")
    assert(rowSet(fin) === rowSet(Profile.bottomKSample(events,
      col("event_type"), col("event_id"), col("value"), k)))
  }

  test("KS drift count-table maintenance (round 14): kill/restart/" +
       "replay lands the batch pair counts exactly") {
    import graft.streaming.Streaming
    val events = events0001.select(col("event_id"), col("ts"),
      col("value"))
    val fin = killRestartReplay(events, Streaming.ksMerge,
      Streaming.ksCounts(events.limit(0)), "event_id", "ks")
    assert(rowSet(fin) === rowSet(Streaming.ksCounts(events)))
  }

  test("conformal count-table maintenance (round 14): kill/restart/" +
       "replay lands the batch side counts exactly") {
    import graft.streaming.Streaming
    val events = events0001.select(col("event_id"), col("event_type"),
      col("value"))
    val fin = killRestartReplay(events, Streaming.conformalMerge,
      Streaming.conformalCounts(events.limit(0)), "event_id", "conf")
    assert(rowSet(fin) === rowSet(Streaming.conformalCounts(events)))
  }

  test("DSIR count-table maintenance (round 14): kill/restart/replay " +
       "lands the batch frequency tables exactly") {
    import graft.streaming.Streaming
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("text"), col("lang"))
    val fin = killRestartReplay(docs,
      Streaming.dsirMerge("en", 256),
      // seed = counts of the empty corpus — the registered op's exact
      // v=-1 state, via the same shared helper
      Streaming.dsirCounts(docs.limit(0), "en", 256),
      "doc_id", "dsir")
    assert(rowSet(fin) === rowSet(Streaming.dsirCounts(docs, "en", 256)))
  }

  test("web front door NEAR face (round 15): kill mid-feed + restart " +
       "from checkpoint keeps the closed-feed near readout exactly-once " +
       "— with the near pair SPLIT across the restart boundary") {
    // the production failure mode for the staged near stage: the
    // ingest dies after staging a page whose near-twin is still
    // undelivered; the resumed incarnation must stage the twin exactly
    // once, and the seal-time near readout must merge the pair across
    // the boundary. A resume bug shows as a duplicate staged page
    // (which the dedup window would silently eat for the MIRROR class
    // — but a duplicated KEPT page becomes a spurious self-near-pair)
    // or a lost twin (near class dead).
    import graft.streaming.Streaming
    val root = java.nio.file.Files
      .createTempDirectory("graft-webnear-restart").toString
    val (src, sink, ckpt) = (s"$root/src", s"$root/sink", s"$root/ckpt")
    val l1 = (1 to 30).map(i => s"alpha$i").mkString(" ") +
      " the quick brown fox jumps high today."
    val l2 = (1 to 30).map(i => s"beta$i").mkString(" ") +
      " the calm river flows gently south now."
    val page = l1 + "\n" + l2
    val other = l2.replace("beta", "zeta") + "\n" + l1.replace("alpha", "eta")
    val raw = Seq(
      2L -> page,                                      // wave 1
      4L -> other,                                     // wave 1
      3L -> (page + "\n" + graft.ops.Text.WebNearLine) // wave 2: the twin
    ).toDF("doc_id", "text")
    val wave1 = raw.filter(col("doc_id") % 2 === 0)
    val wave2 = raw.filter(col("doc_id") % 2 === 1)
    wave1.coalesce(2).write.mode("overwrite").parquet(src)
    val schema1 = Streaming.runProjectionStream(spark, raw.schema,
      graft.ops.Text.webStage12, src, sink, ckpt)
    // kill; the twin arrives; the new incarnation resumes from the
    // SAME checkpoint and must process ONLY the new files
    wave2.coalesce(2).write.mode("append").parquet(src)
    val schema2 = Streaming.runProjectionStream(spark, raw.schema,
      graft.ops.Text.webStage12, src, sink, ckpt)
    assert(schema1 === schema2)
    val staged = spark.read.schema(schema2).parquet(sink)
    assert(staged.count() === raw.count())
    assert(staged.groupBy(col("doc_id")).count()
      .filter(col("count") > 1).count() === 0L, "duplicate staged docs")
    // the seal-time readout runs the literal batch tails — row-identical
    // to the batch op, with the cross-boundary pair merged
    val streamed = graft.ops.Text.webNearTail(
      graft.ops.Text.webVerdictTail(staged))
    val batch = graft.ops.Text.webPipelineNear(raw)
    assert(rowSet(streamed) === rowSet(batch))
    val st = streamed.orderBy(col("doc_id"))
      .as[(Long, Boolean, String, Option[Long], Option[Double])].collect()
    assert(st.map(_._3).toSeq === Seq("kept", "near_dup", "kept"),
      "the near pair split across the restart boundary must merge")
    assert(st(1)._4 === Some(2L))
  }
}
