package graft.sources.v2

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import java.nio.file.{Files, Paths}
import java.util.{Map => JMap}
import scala.jdk.CollectionConverters._

/** DataSource V2 for the paginated-endpoint page store (reference S1,
  * `pipeline/data_pipeline.py:26-65`) — the scale path promised in
  * SURVEY §2.1: one `InputPartition` PER PAGE, so a 10k-page raw zone
  * reads with 10k-way parallelism instead of the driver-side fetch loop.
  *
  * Page files are the mock endpoint's envelopes
  * (`{"records": [...], "pagination": {...}}`, written by
  * [[graft.sources.Paginated.writeMockPages]]). Planning lists
  * consecutive `page_N.json` files (the missing-page stop condition);
  * record parsing happens inside each partition reader, off the driver.
  *
  * Usage: `spark.read.format("graft.sources.v2.PagedJsonSource")
  *   .option("path", pagesDir).load()`
  */
class PagedJsonSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    PagedJsonSource.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: JMap[String, String]): Table =
    new PagedTable(properties.get("path"))
}

object PagedJsonSource {
  val schema: StructType = graft.sources.Paginated.recordSchema
}

private[v2] class PagedTable(path: String) extends Table with SupportsRead {
  override def name(): String = s"paged_json($path)"
  override def schema(): StructType = PagedJsonSource.schema
  override def capabilities(): java.util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder with Scan with Batch with SupportsPushDownRequiredColumns {
      private var required: StructType = PagedJsonSource.schema

      // column pruning pushdown: a `select(event_id)` only parses that
      // field out of each page, and the scan's ReadSchema shows it
      override def pruneColumns(requiredSchema: StructType): Unit =
        required = requiredSchema

      override def build(): Scan = this
      override def readSchema(): StructType = required
      override def toBatch: Batch = this

      override def planInputPartitions(): Array[InputPartition] =
        Iterator.from(1)
          .map(p => s"$path/page_$p.json")
          .takeWhile(f => Files.exists(Paths.get(f)))
          .map(f => PagePartition(f): InputPartition)
          .toArray

      override def createReaderFactory(): PartitionReaderFactory =
        new PagePartitionReaderFactory(required)
    }
}

private[v2] case class PagePartition(file: String) extends InputPartition

private[v2] class PagePartitionReaderFactory(schema: StructType)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new PageReader(partition.asInstanceOf[PagePartition].file, schema)
}

/** Parses one page envelope and streams its records as InternalRows,
  * projecting only the pruned schema's fields.
  */
private[v2] class PageReader(file: String, schema: StructType)
    extends PartitionReader[InternalRow] {
  private val records = {
    val root = new ObjectMapper().readTree(Files.readString(Paths.get(file)))
    val recs = root.path("records")
    (0 until recs.size()).iterator.map(recs.get)
  }
  private var current: InternalRow = _

  override def next(): Boolean =
    if (records.hasNext) {
      val r = records.next()
      current = new GenericInternalRow(schema.fields.map[Any] { f =>
        f.name match {
          case "event_id"   => r.path("event_id").asLong()
          case "user_id"    => r.path("user_id").asLong()
          case "event_type" => UTF8String.fromString(r.path("event_type").asText())
          case "value"      => r.path("value").asDouble()
        }
      })
      true
    } else false

  override def get(): InternalRow = current
  override def close(): Unit = ()
}
