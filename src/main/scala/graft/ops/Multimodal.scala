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

  /** Resize planning on decoded features: fit into a `target`-pixel box
    * preserving aspect ratio — pure integral arithmetic (`div`) so the
    * result is engine-portable. The actual pixel resample would run in
    * the same partition-wise decoder pass; its geometry is what the
    * pipeline schedules on.
    */
  def resizePlan(features: DataFrame, target: Int = 224): DataFrame =
    features.select(
      col("doc_id"), col("width"), col("height"),
      expr(s"CAST(width * $target div greatest(width, height, 1) AS INT)")
        .as("target_w"),
      expr(s"CAST(height * $target div greatest(width, height, 1) AS INT)")
        .as("target_h"))

  final case class Frame(doc_id: Long, frame_idx: Int, byte_offset: Long,
                         checksum: Long)

  /** Frame sampling over a binary "video" payload: every `stride`-th
    * fixed-size frame, one output row per sampled frame with a
    * deterministic per-frame checksum (the stub for per-frame feature
    * extraction). Partition-wise like [[decodeFeatures]] — a real codec
    * seeks per frame inside the same pass; rows:frames is 1:many via a
    * streaming flatMap, nothing materializes per document.
    */
  def frameSample(docs: DataFrame, frameBytes: Int = 64,
                  stride: Int = 2): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val blobs: Dataset[Blob] = docs
      .select(col("doc_id"), col("text").cast("binary").as("blob"), col("lang"))
      .as[Blob]
    blobs.mapPartitions { it =>
      // per-partition codec init would live here
      it.flatMap { b =>
        val nFrames = b.blob.length / frameBytes
        (0 until nFrames by stride).iterator.map { i =>
          val off = i * frameBytes
          var s = 0L
          var j = off
          while (j < off + frameBytes) { s += (b.blob(j) & 0xff); j += 1 }
          Frame(b.doc_id, i, off.toLong, s)
        }
      }
    }.toDF()
  }
}
