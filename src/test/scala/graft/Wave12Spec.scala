package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Changelog, Profile, Temporal, Text}

/** Round-6 twelfth wave: Holt smoothing, first-touch attribution,
  * rolling median, n-gram diversity, and the tombstone-retaining CDC
  * advance behind `streaming_cdc_apply`.
  */
class Wave12Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tsOf(day: Int, i: Int) =
    java.sql.Timestamp.valueOf(f"2024-03-$day%02d 10:00:$i%02d")

  test("holtForecast tracks a linear series exactly: level = last x, " +
       "trend = slope, forecast extrapolates") {
    // day d carries d events: x = 1,2,3,4 — a pure trend. EWMA would lag
    // (its steady-state lag is slope/α); Holt's trend term lands exactly.
    val rows = for (d <- 1 to 4; i <- 1 to d) yield ("a", tsOf(d, i))
    val out = Temporal.holtForecast(rows.toDF("g", "ts"), col("g"), col("ts"))
      .as[(String, Long, Double, Double, Double)].collect()
    assert(out.length === 1)
    assert(out.head === (("a", 4L, 4.0, 1.0, 11.0))) // 4 + 7·1
  }

  test("holtForecast hand-check on a non-linear series and the " +
       "single-day edge (b=0, forecast=level)") {
    // g=a: x = 1,3,2 → init (l=1,b=2); t2: l=.5·3+.5·3=3, b=.5·2+.5·2=2
    //      t3: l=.5·2+.5·5=3.5, b=.5·.5+.5·2=1.25 → fc=3.5+8.75=12.25
    val rows = (for (d <- Seq((1, 1), (2, 3), (3, 2)); i <- 1 to d._2)
      yield ("a", tsOf(d._1, i))) ++ Seq(("b", tsOf(1, 1)))
    val out = Temporal.holtForecast(rows.toDF("g", "ts"), col("g"), col("ts"))
      .as[(String, Long, Double, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(out("a") === (("a", 3L, 3.5, 1.25, 12.25)))
    assert(out("b") === (("b", 1L, 1.0, 0.0, 1.0)))
  }

  test("attributionFirstTouch credits revenue to the acquisition channel") {
    val e = Seq(
      // user 1: first touch 'view' (ts tiebreak), buys 2.50 + 1.00
      (1L, tsOf(1, 1), 10L, "view", 0.0),
      (1L, tsOf(1, 2), 11L, "purchase", 2.50),
      (1L, tsOf(2, 1), 12L, "purchase", 1.00),
      // user 2: first touch 'click', never buys
      (2L, tsOf(1, 1), 13L, "click", 0.0),
      // user 3: first touch 'view', no purchase
      (3L, tsOf(3, 1), 14L, "view", 0.0),
      // user 4: equal ts as id 16 — id tiebreak picks 15 ('click')
      (4L, tsOf(1, 5), 15L, "click", 0.0),
      (4L, tsOf(1, 5), 16L, "purchase", 9.99)
    ).toDF("user_id", "ts", "event_id", "event_type", "value")
    val out = Temporal.attributionFirstTouch(e, col("user_id"), col("ts"),
        col("event_id"), col("event_type"), col("value"))
      .as[(String, Long, Long, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(out("view") === (("view", 2L, 1L, 3.50)))
    assert(out("click") === (("click", 2L, 1L, 9.99)))
    assert(!out.contains("purchase")) // nobody's FIRST event was a purchase
  }

  test("rollingMedian: growing frames, dyadic even-frame averages, " +
       "and spike robustness") {
    // counts by day: 1,9,3,5 — day2's rolling mean jumps to 5; the
    // median stays at the half-way dyadic 5.0 then recenters on 3
    val rows = for (d <- Seq((1, 1), (2, 9), (3, 3), (4, 5)); i <- 1 to d._2)
      yield ("a", tsOf(d._1, i % 60))
    val out = Profile.rollingMedian(rows.toDF("g", "ts"), col("g"), col("ts"))
      .as[(String, java.sql.Date, Long, Double)].collect()
      .map(r => r._2.toString -> r._4).toMap
    assert(out("2024-03-01") === 1.0) // frame [1]
    assert(out("2024-03-02") === 5.0) // frame [1,9] -> (1+9)/2
    assert(out("2024-03-03") === 3.0) // frame [1,3,9]
    assert(out("2024-03-04") === 4.0) // frame [1,3,5,9] -> (3+5)/2
  }

  test("ngramDiversity: exact distinct/total per n; repeated text shows " +
       "lower distinct-n than fresh text") {
    val docs = Seq(
      (1L, "a b a b", "rep"), (2L, "a b a b", "rep"),
      (3L, "u v w x", "fresh")
    ).toDF("doc_id", "text", "source")
    val out = Text.ngramDiversity(docs)
      .as[(String, Int, Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r).toMap
    // rep unigrams: 8 total, {a,b} distinct; bigrams: 6 total,
    // {"a b","b a"} distinct; trigrams: 4 total, {"a b a","b a b"}
    assert(out(("rep", 1)) === (("rep", 1, 8L, 2L, 0.25)))
    assert(out(("rep", 2)) === (("rep", 2, 6L, 2L, 2.0 / 6.0)))
    assert(out(("rep", 3)) === (("rep", 3, 4L, 2L, 0.5)))
    // fresh: everything distinct -> ratio 1.0 at every n
    assert(out(("fresh", 1))._5 === 1.0)
    assert(out(("fresh", 2))._5 === 1.0)
    assert(out(("fresh", 3))._5 === 1.0)
    val rep = out(("rep", 1))._5
    val fresh = out(("fresh", 1))._5
    assert(rep < fresh)
  }

  test("cdcAdvance: any batch slicing/order lands the same state, and " +
       "tombstones block resurrection by late older updates") {
    def df(rows: Seq[(Long, String, Long, Int, Double, String)]) =
      rows.toDF("user_id", "event_type", "event_id", "d", "value", "op")
        .select(col("user_id"), col("event_type"), col("event_id"),
          timestamp_seconds(lit(1709290000L) + col("d")).as("ts"),
          col("value"), col("op"))
    val keys = Seq("user_id", "event_type")
    val seqCols = Seq("ts", "event_id")
    // key (1,a): I then U (newest wins); key (2,b): I then D (gone);
    // key (3,c): D at t=9 then a LATE OLDER U at t=5 (must stay deleted)
    val log = Seq(
      (1L, "a", 1L, 1, 10.0, "I"), (1L, "a", 2L, 3, 11.0, "U"),
      (2L, "b", 3L, 1, 20.0, "I"), (2L, "b", 4L, 4, 0.0, "D"),
      (3L, "c", 5L, 9, 0.0, "D"), (3L, "c", 6L, 5, 30.0, "U"))
    val empty = df(Nil)
    def runSlices(slices: Seq[Seq[(Long, String, Long, Int, Double, String)]]) =
      slices.foldLeft(empty) { (st, b) => Changelog.cdcAdvance(st, df(b), keys, seqCols) }
        .filter(col("op") =!= "D")
        .select(col("user_id"), col("event_type"), col("event_id"), col("value"))
        .as[(Long, String, Long, Double)].collect().toSet
    val a = runSlices(Seq(log.take(2), log.slice(2, 4), log.drop(4)))
    val b = runSlices(Seq(log.reverse)) // one batch, reversed order
    val c = runSlices(log.reverse.map(Seq(_))) // row-at-a-time, reversed
    val expected = Set((1L, "a", 2L, 11.0)) // (2,b) deleted, (3,c) deleted
    assert(a === expected); assert(b === expected); assert(c === expected)
    // and the filtered state equals cdcApply over the full log
    val batchRef = Changelog.cdcApply(df(log), keys, col("ts"),
        Seq(col("event_id")), col("op"))
      .select(col("user_id"), col("event_type"), col("event_id"), col("value"))
      .as[(Long, String, Long, Double)].collect().toSet
    assert(a === batchRef)
  }
}
