package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (SURVEY §2.8 E5): media payloads travel as
  * opaque `binary` columns with typed metadata alongside; decode /
  * feature-extraction runs partition-wise so a real decoder (image/audio
  * codec) amortizes its setup per partition, not per row.
  *
  * The decode step itself is a STUB — deterministic fake features derived
  * from the bytes (this container has no media codecs). Everything
  * around it is real: schema, binary transport, partition-wise execution,
  * typed output.
  */
object Multimodal {

  final case class Blob(doc_id: Long, blob: Array[Byte], lang: String)
  final case class Features(doc_id: Long, width: Int, height: Int,
                            n_bytes: Long, format: String)

  /** STUB decoder — a real pipeline would decode image bytes here
    * (e.g. JPEG dimensions). Fake features are pure functions of the
    * bytes so the op stays verifiable.
    */
  private def decodeStub(b: Blob): Features =
    Features(b.doc_id,
      width = (b.blob.length % 640),
      height = (b.blob.headOption.getOrElse(0: Byte) & 0xff),
      n_bytes = b.blob.length.toLong,
      format = "stub/raw")

  /** Pack text into a binary payload column (stand-in for image bytes)
    * and run partition-wise feature extraction.
    */
  def decodeFeatures(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val blobs: Dataset[Blob] = docs
      .select(col("doc_id"), col("text").cast("binary").as("blob"), col("lang"))
      .as[Blob]
    // mapPartitions: decoder init happens once per partition (real codecs
    // are expensive to construct); rows stream through without collecting
    blobs.mapPartitions { it =>
      // val decoder = Decoder.open(...)  <- real init would live here
      it.map(decodeStub)
    }.toDF()
  }
}
