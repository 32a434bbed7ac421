package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Negative controls for the streaming slice of DegeneracySpec's sweep.
  *
  * DegeneracySpec asserts every registered query's readout is non-empty
  * (and its flags non-constant) — but a streaming op's returned
  * DataFrame is a memory-sink readout, so the round-9 verdict asked for
  * proof that the sweep's signal actually rides the MICRO-BATCH STATE
  * path rather than some batch fallback: for each streaming state
  * family, drive a deliberately degenerate feed and assert the readout
  * shows exactly the degenerate signal the sweep would flag (empty, or
  * collapsed). If state handling were broken or bypassed, these
  * controls — not just the happy-path oracles — are what moves.
  *
  * Families covered: symmetric-hash join state, watermark-driven outer
  * eviction, dropDuplicates keyed state, append-mode windowed
  * aggregation state, and flatMapGroupsWithState arbitrary state.
  */
class StreamingDegeneracyControlSpec extends AnyFunSuite {

  private val dir = "/root/testdata/sf0.001"
  private lazy val spark = TestSpark.spark

  private def scratch(tag: String): String = {
    val p = java.nio.file.Files.createTempDirectory(s"graft_degctl_$tag")
    p.toFile.deleteOnExit()
    p.toString
  }

  private def events = Tables.events(spark, dir)
    .select(col("event_id"), col("ts"), col("user_id"),
      col("event_type"), col("value"))

  test("join-state control: a feed with NO purchase side yields an " +
       "EMPTY inner-join readout (the shape the n>0 gate trips on)") {
    // the purchase side never populates its state store, so no view can
    // ever match — if anything non-empty came back, the readout would
    // not be riding the symmetric-hash join state at all
    val noPurchases = events.filter(col("event_type") =!= "purchase")
    val out = graft.streaming.Streaming.streamStreamJoin(
      spark, noPurchases, windowSec = 3600L, scratch("join"))
    assert(out.count() === 0L,
      "inner join over an absent side must be empty")
    // and the registered feed is the positive control: non-empty
    val reg = graft.streaming.Streaming.streamStreamJoin(
      spark, events, windowSec = 3600L, scratch("join_pos"))
    assert(reg.count() > 0L)
  }

  test("outer-eviction control: a watermark delay wider than the feed " +
       "span never evicts, so the NULL rows (eviction's only product) " +
       "vanish") {
    // streaming_join_outer's null rows exist ONLY because the watermark
    // passes view_ts + window and closes the view's state; with delay >>
    // feed span nothing closes and the outer join degenerates to the
    // inner matches — the constant-flag/dead-branch shape the sweep
    // exists to catch
    val out = graft.streaming.Streaming.streamStreamJoinOuter(
      spark, events, windowSec = 600L, delaySec = 3650L * 86400L,
      scratch("outer"))
    assert(out.count() > 0L, "matched pairs must still emit")
    assert(out.filter(col("purchase_id").isNull).count() === 0L,
      "no watermark progress ⇒ no state closure ⇒ no null rows; if " +
      "null rows appear they did not come from eviction")
  }

  test("dedup-state control: an all-one-key feed collapses to EXACTLY " +
       "one row across all micro-batches (cross-batch keyed state)") {
    // the feed is written twice over 4 files / 4 triggers; only the
    // state store can collapse copies that arrive in DIFFERENT
    // micro-batches — per-batch dedup would emit ≥1 row per trigger
    val oneKey = events.withColumn("event_id", lit(42L))
    val out = graft.streaming.Streaming.streamingDedup(
      spark, oneKey, scratch("dedup"))
    assert(out.count() === 1L,
      "dropDuplicates state must collapse the key across micro-batches")
  }

  test("append-agg-state control: a watermark that never passes the " +
       "feed span closes NO window — the append readout is EMPTY") {
    val src = events.filter(col("event_type").isNotNull)
      .select(col("ts"), col("event_type"))
    val dirOut = scratch("winapp")
    src.repartition(2).write.mode("overwrite").parquet(dirOut)
    val q = spark.readStream.schema(src.schema)
      .option("maxFilesPerTrigger", 1).parquet(dirOut)
      .withWatermark("ts", "3650 days")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .writeStream.format("memory").queryName("graft_degctl_winapp")
      .outputMode("append").start()
    q.processAllAvailable(); q.stop()
    assert(spark.table("graft_degctl_winapp").count() === 0L,
      "append mode emits a window only when the watermark closes it; " +
      "an un-advanceable watermark must therefore emit nothing — rows " +
      "here would mean the readout is not gated by aggregation state")
  }

  test("arbitrary-state control: one user + gap ≥ feed span merges " +
       "everything into ONE session whose update counter proves " +
       "cross-batch state") {
    val oneUser = events.withColumn("user_id", lit(7L))
    val out = graft.streaming.Streaming.statefulSessionize(
      spark, oneUser, gapSeconds = 400L * 86400L, scratch("sess"))
    val rows = out.collect()
    assert(rows.length === 1,
      "gap ≥ span must interval-merge every event into one session")
    // the readout keeps each key's LAST update only; n_events of that
    // single surviving session must cover the WHOLE feed — anything
    // smaller means a micro-batch's contribution never reached (or
    // never read) the first batch's state
    assert(rows.head.getAs[Long]("n_events") === events.count(),
      "the single session must span the entire multi-trigger feed")
  }
}
