package graft

import org.scalatest.funsuite.AnyFunSuite

/** Round-15 wave 38: the COMPLETE web front door
  * (`web_pipeline_full`) — every stage in production order as one
  * composition. The per-stage coupling proofs live in Wave36/37 (the
  * tails are the same function values); what THIS spec proves is the
  * composition itself: all planted tiers resolve to their own stage's
  * verdict inside the full chain, the stage populations nest the way
  * the chain claims (surgery only over sem survivors, sem only over
  * near survivors), and every status class is live at once.
  */
class Wave38Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private type Row8 = (Long, Boolean, String, Option[Long],
    Option[Double], Option[Double], Option[Long], Option[String])

  private lazy val rows: Array[Row8] =
    SparkEntry.queries("web_pipeline_full")(spark,
        "/root/testdata/sf0.001")
      .as[Row8].collect()
  private lazy val statusById = rows.map(r => r._1 -> r._3).toMap

  test("web_pipeline_full registration: every status class of every " +
       "stage is live at once at sf0.001") {
    val byStatus = rows.groupBy(_._3).view.mapValues(_.length).toMap
    for (c <- Seq("kept", "exact_dup", "near_dup", "sem_dup",
                  "substr_pruned", "c4_page", "gopher_repetition",
                  "gopher_line_dup", "gopher_quality"))
      assert(byStatus.getOrElse(c, 0) > 0, s"class '$c' empty: $byStatus")
  }

  test("stage populations nest: surgery columns only on the surgery " +
       "population, sem cosine only on the sem class, metrics carried " +
       "through the composition") {
    for ((id, _, st, _, _, cos, rem, txt) <- rows) {
      // surgery runs over sem survivors only: any page merged (or
      // dropped) before the surgery stage must carry NO surgery row
      if (st != "kept" && st != "substr_pruned")
        assert(rem.isEmpty && txt.isEmpty,
          s"row $id ($st): surgery columns on a pre-surgery status")
      // a page the surgery visited but left whole is kept with 0
      if (st == "kept")
        assert(rem.contains(0L),
          s"row $id: kept page must carry n_removed_tokens 0, got $rem")
      if (st == "substr_pruned") {
        assert(rem.exists(_ > 0), s"row $id: substr_pruned with $rem")
        assert(txt.isDefined, s"row $id: substr_pruned without text_dedup")
      }
      // sem cosine only on the sem class (near_dup pages never enter
      // the sem candidate set; kept pages have no partner)
      if (st != "sem_dup")
        assert(cos.isEmpty, s"row $id ($st): sem_cosine $cos")
    }
  }

  test("planted tiers resolve to their OWN stage inside the full " +
       "chain: near twins never exact-merge, sem twins never " +
       "near-merge onto unreversed pages, the footer prunes a " +
       "surviving carrier") {
    val nearTwins = rows.filter(r => r._1 >= 200000L && r._1 < 300000L)
    val semTwins = rows.filter(_._1 >= 300000L)
    assert(nearTwins.nonEmpty && semTwins.nonEmpty, "tiers missing")
    assert(nearTwins.forall(_._3 != "exact_dup"),
      "a near twin hash-merged — the extra kept line failed")
    for (t <- nearTwins if statusById(t._1 - 200000L) == "kept")
      assert(t._3 == "near_dup",
        s"near twin ${t._1} of kept page must be near_dup, got ${t._3}")
    assert(semTwins.forall(_._3 != "exact_dup"),
      "a sem twin hash-merged — the reversal failed")
    // a sem twin may near-merge only onto another twin (reversal
    // preserves twin-twin similarity, destroys twin-base similarity)
    for (t <- semTwins if t._3 == "near_dup")
      assert(t._4.exists(_ >= 200000L),
        s"sem twin ${t._1} near-merged onto base ${t._4}")
    for (t <- semTwins if statusById(t._1 - 300000L) == "kept")
      assert(t._3 == "sem_dup" || t._3 == "near_dup",
        s"sem twin ${t._1} of kept page must merge, got ${t._3}")
    assert(semTwins.exists(_._3 == "sem_dup"),
      "no sem twin reached the sem stage inside the composition")
    // the license footer: at least one surviving carrier is pruned
    // and loses at least the 8-token shared window
    val pruned = rows.filter(_._3 == "substr_pruned")
    assert(pruned.nonEmpty, "no substr_pruned page in the full chain")
    assert(pruned.exists(_._7.exists(_ >= 8)),
      "no pruned page lost a full 8-token window")
  }
}
