package graft.sources

import com.fasterxml.jackson.databind.ObjectMapper
import java.util
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.types.{IntegerType, StringType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import scala.jdk.CollectionConverters._

/** S3: paginated-REST scan as a DataSourceV2 — the scale path for the
  * reference's page-accumulation loop
  * (`fhir_etl/GTEx/gtex_fhirizer.py:53-75`, 436 pages fetched serially
  * on the driver). Here every page is its own `InputPartition`, so
  * executors read pages in parallel and the driver never materializes
  * the corpus (SURVEY §7.4).
  *
  * Zero-egress form: a "page" is a staged envelope file
  * `{"data": [...], "paging_info": {...}}`; a live deployment would
  * swap the file read for an HTTP GET inside the same PartitionReader
  * without touching the plan shape.
  *
  * Design choice: the source emits raw per-record JSON (`value STRING`,
  * `page INT`) rather than parsing server-side schemas itself — parsing
  * stays in Catalyst (`from_json`, codegen'd, prunable), mirroring how
  * the Kafka source hands off bytes.
  *
  * Usage: `spark.read.format("graft.sources.RestPagesSource")
  *   .option("path", dir).load()`
  */
class RestPagesSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    RestPages.Schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new RestPagesTable(properties.get("path"))
}

object RestPages {
  val Schema: StructType = new StructType()
    .add("value", StringType).add("page", IntegerType)

  def pageFiles(dir: String): Seq[java.io.File] =
    Option(new java.io.File(dir).listFiles()).toSeq.flatten
      .filter(_.getName.endsWith(".json")).sortBy(_.getName)
}

class RestPagesTable(dir: String) extends Table with SupportsRead {
  override def name(): String = s"rest_pages($dir)"
  override def schema(): StructType = RestPages.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new RestPagesScan(dir)
    }
}

final case class PagePartition(path: String, page: Int) extends InputPartition

class RestPagesScan(dir: String) extends Scan with Batch {
  override def readSchema(): StructType = RestPages.Schema
  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] =
    RestPages.pageFiles(dir).zipWithIndex
      .map { case (f, i) => PagePartition(f.getPath, i) }.toArray

  override def createReaderFactory(): PartitionReaderFactory =
    (partition: InputPartition) => {
      val p = partition.asInstanceOf[PagePartition]
      new PartitionReader[InternalRow] {
        private val records: Iterator[InternalRow] = {
          val root = new ObjectMapper().readTree(new java.io.File(p.path))
          root.get("data").elements().asScala.map { rec =>
            InternalRow(UTF8String.fromString(rec.toString), p.page)
          }
        }
        private var current: InternalRow = _
        override def next(): Boolean =
          records.hasNext && { current = records.next(); true }
        override def get(): InternalRow = current
        override def close(): Unit = ()
      }
    }
}
