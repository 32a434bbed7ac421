package graft

import java.io.File

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Distribute

/** The bloom-filter layout's claim is that the filters are REALLY in
  * the files — not just that the roundtrip query returns the right
  * rows (any plain parquet write does that). This spec opens the
  * written footers with parquet-mr directly and checks: every row
  * group carries a readable bloom filter for the key column, present
  * keys probe positive (no false negatives — the correctness
  * contract), and an absent key probes negative in at least one row
  * group (the filter actually discriminates, i.e. skipping can
  * happen).
  */
class BloomLayoutSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val sf = "/root/testdata/sf0.001"
  private val outDir = "/root/repo/target/graft-tmp/bloom_spec"

  test("bloom filters are present in every row group, complete on " +
       "present keys, and discriminating on absent ones") {
    val src = Tables.orders(spark, sf)
      .select(col("o_orderkey"), col("o_custkey"))
    val present = src.select(min(col("o_orderkey")), max(col("o_orderkey")))
      .as[(Long, Long)](org.apache.spark.sql.Encoders.product[(Long, Long)])
      .head()
    val out = Distribute.bloomLayout(spark, src, "o_orderkey", outDir,
      lookup = Seq(present._1, present._2, 999999999L))
    // roundtrip correctness first: the lookup finds both real keys
    val got = out.select(col("o_orderkey")).collect().map(_.getLong(0)).toSet
    assert(got.contains(present._1) && got.contains(present._2))
    assert(!got.contains(999999999L))

    val files = new File(outDir).listFiles()
      .filter(f => f.getName.endsWith(".parquet") && f.length() > 0)
    assert(files.nonEmpty, s"no parquet files written under $outDir")
    val conf = new Configuration()
    var groups = 0
    var absentNegative = 0
    for (f <- files) {
      val reader = ParquetFileReader.open(
        HadoopInputFile.fromPath(new Path(f.getAbsolutePath), conf))
      try {
        val blocks = reader.getFooter.getBlocks.asScala
        for (block <- blocks) {
          val cols = block.getColumns.asScala
          val keyMeta = cols.find(_.getPath.toDotString == "o_orderkey")
            .getOrElse(fail(s"no o_orderkey chunk in ${f.getName}"))
          assert(keyMeta.getBloomFilterOffset > 0,
            s"row group in ${f.getName} has no bloom filter offset")
          val bf = reader.readBloomFilter(keyMeta)
          assert(bf != null, s"bloom filter unreadable in ${f.getName}")
          // completeness: keys actually IN this row group must probe
          // positive — bloom filters never false-negative. Key→row-
          // group attribution is only unambiguous when the file has a
          // single row group (true at this data size; guard anyway).
          if (blocks.size == 1) {
            val inGroup = spark.read.parquet(f.getAbsolutePath)
              .select(col("o_orderkey")).limit(50)
              .collect().map(_.getLong(0))
            for (k <- inGroup)
              assert(bf.findHash(bf.hash(k)),
                s"present key $k probed NEGATIVE — broken filter")
          }
          if (!bf.findHash(bf.hash(999999999L))) absentNegative += 1
          // the non-key column must NOT pay for a filter it didn't ask
          // for (write option was column-scoped)
          val other = cols.find(_.getPath.toDotString == "o_custkey").get
          assert(other.getBloomFilterOffset <= 0,
            "o_custkey grew a bloom filter without being configured")
          groups += 1
        }
      } finally reader.close()
    }
    assert(groups > 0)
    // discrimination: a 1e6-ndv-sized filter at this row count should
    // reject the absent key essentially everywhere; require at least
    // one rejecting group so "skipping is possible" is demonstrated,
    // without flaking on the (astronomically unlikely) fp case
    assert(absentNegative > 0,
      "absent key probed positive in EVERY row group — filter useless")
  }
}
