package graft

import org.scalatest.funsuite.AnyFunSuite

import java.io.File

/** Staleness gate for CORRECTNESS_MATRIX.json (round-11 verdict item 2
  * — it was the one committed artifact nothing protected): the matrix
  * is regenerated manually by `tools/matrix.py`, and without this spec
  * a round could add queries and the committed "343/343 at every SF"
  * claim would silently rot. In the CatalogSpec mold:
  *  - the artifact exists and covers exactly the three driver-pinned
  *    scale factors;
  *  - at EVERY SF, `total` equals the LIVE registry size
  *    (`SparkEntry.queries.size`) — so adding a query without rerunning
  *    the matrix turns the suite red;
  *  - `match == total` and the failure lists are empty — a committed
  *    matrix with red cells is not an artifact, it's a bug report.
  */
class MatrixSpec extends AnyFunSuite {

  private val sfs = Seq("0.001", "0.01", "0.1")

  private lazy val root = {
    val f = new File("/root/repo/CORRECTNESS_MATRIX.json")
    assert(f.exists(),
      "CORRECTNESS_MATRIX.json missing — run `python3 tools/matrix.py` " +
      "and commit the result")
    new com.fasterxml.jackson.databind.ObjectMapper().readTree(f)
  }

  test("matrix covers exactly the three driver-pinned scale factors") {
    val keys = {
      val it = root.fieldNames()
      val buf = scala.collection.mutable.Buffer[String]()
      it.forEachRemaining(buf += _)
      buf.toSet
    }
    assert(keys == sfs.toSet, s"matrix SFs $keys != expected $sfs")
  }

  for (sf <- sfs) {
    test(s"sf$sf: total equals the live registry and every query matches") {
      val cell = root.get(sf)
      assert(cell != null, s"sf$sf missing from matrix")
      val live = SparkEntry.queries.size
      val total = cell.get("total").asInt()
      val matched = cell.get("match").asInt()
      assert(total == live,
        s"matrix total $total != live registry $live — a query was " +
        "added/removed without rerunning tools/matrix.py")
      assert(matched == total, s"matrix shows $matched/$total at sf$sf")
      for (k <- Seq("spark_failed", "oracle_failed")) {
        val arr = cell.get(k)
        assert(arr != null && arr.isArray && arr.size() == 0,
          s"sf$sf $k non-empty: $arr")
      }
    }
  }
}
