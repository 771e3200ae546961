package graft.sources

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 whole-file text source — the reference's F1 scan
  * (one record per file: filename key + entire contents,
  * /root/reference/mr/worker.go:102-109) re-expressed through Spark's
  * connector API instead of an RDD veneer:
  *
  *  - one `InputPartition` per file ≡ the reference's one map task per
  *    input file (master.go:129-144), so task parallelism = file count;
  *  - `SupportsPushDownRequiredColumns`: a query touching only
  *    (path, length) never reads file bytes — the reader materializes
  *    exactly the pruned columns (asserted in WholeFileSourceSpec);
  *  - executors read their own partition's bytes (the driver only
  *    lists metadata), so contents never pass through the driver.
  *
  * Usage: `spark.read.format("graft.sources.WholeFileSource")
  * .load(dir)`.
  */
class WholeFileSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    WholeFileSource.Schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table =
    new WholeFileTable(properties.get("path"))
  override def supportsExternalMetadata(): Boolean = true
}

object WholeFileSource {
  val Schema: StructType = StructType(Seq(
    StructField("path", StringType, nullable = false),
    StructField("length", LongType, nullable = false),
    StructField("content", StringType, nullable = true)))
}

private[sources] class WholeFileTable(path: String) extends Table with SupportsRead {
  override def name(): String = s"wholefile($path)"
  override def schema(): StructType = WholeFileSource.Schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new WholeFileScanBuilder(Option(path).getOrElse(options.get("path")))
}

private[sources] class WholeFileScanBuilder(path: String)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = WholeFileSource.Schema
  override def pruneColumns(requiredSchema: StructType): Unit = required = requiredSchema
  override def build(): Scan = new WholeFileScan(path, required)
}

private[sources] class WholeFileScan(path: String, required: StructType)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] = {
    val base = new java.io.File(path)
    val files = Option(base.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isFile && !f.getName.startsWith("_") && !f.getName.startsWith("."))
      .sortBy(_.getName)
    files.map(f => WholeFilePartition(f.getAbsolutePath, f.length()): InputPartition)
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new WholeFileReaderFactory(required.fieldNames)
}

private[sources] case class WholeFilePartition(path: String, len: Long) extends InputPartition

private[sources] class WholeFileReaderFactory(cols: Array[String])
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val wp = p.asInstanceOf[WholeFilePartition]
    new PartitionReader[InternalRow] {
      private var consumed = false
      override def next(): Boolean = if (consumed) false else { consumed = true; true }
      override def get(): InternalRow = {
        val vals: Array[Any] = cols.map {
          case "path" => UTF8String.fromString(wp.path)
          case "length" => java.lang.Long.valueOf(wp.len)
          case "content" => UTF8String.fromBytes(
            java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(wp.path)))
        }
        InternalRow.fromSeq(scala.collection.immutable.ArraySeq.unsafeWrapArray(vals))
      }
      override def close(): Unit = ()
    }
  }
}
