package graft.sources

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DSv2 sink with the reference's text-output contract (F9): one
  * `mr-out-<partition>` file of `"key value"` lines per partition,
  * committed by temp-file + atomic rename
  * (/root/reference/mr/worker.go:72-98 — `ioutil.TempFile` then
  * `os.Rename`). Task attempts write attempt-unique temp files;
  * only the attempt Spark's commit coordinator accepts gets renamed in
  * the driver-side job commit, so stragglers/retries (the reference's
  * backup tasks, master.go:111-127) can never tear or duplicate an
  * output file.
  *
  * Usage: `df.select(key, value).repartition(R, key).write
  * .format("graft.sources.KvTextSink").mode("append").save(dir)`.
  */
class KvTextSink extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    KvTextSink.Schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table =
    new KvSinkTable(properties.get("path"))
  override def supportsExternalMetadata(): Boolean = true
}

object KvTextSink {
  val Schema: StructType = StructType(Seq(
    org.apache.spark.sql.types.StructField("key", org.apache.spark.sql.types.StringType),
    org.apache.spark.sql.types.StructField("value", org.apache.spark.sql.types.StringType)))
}

private[sources] class KvSinkTable(path: String) extends Table with SupportsWrite {
  override def name(): String = s"kvtext($path)"
  override def schema(): StructType = KvTextSink.Schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_WRITE, TableCapability.TRUNCATE)
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    require(info.schema().fields.length == 2,
      s"KvTextSink expects exactly (key, value); got ${info.schema().simpleString}")
    new WriteBuilder {
      override def build(): Write = new Write {
        override def toBatch: BatchWrite = new KvBatchWrite(path)
      }
    }
  }
}

private[sources] case class KvCommit(tmp: String, target: String)
  extends WriterCommitMessage

private[sources] class KvBatchWrite(path: String) extends BatchWrite {
  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new KvWriterFactory(path)
  // job commit: only coordinator-accepted attempts are renamed —
  // the worker.go:96 os.Rename, moved to the single commit point
  override def commit(messages: Array[WriterCommitMessage]): Unit =
    messages.foreach { case KvCommit(tmp, target) =>
      Files.move(Paths.get(tmp), Paths.get(target),
        StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
    }
  override def abort(messages: Array[WriterCommitMessage]): Unit =
    messages.foreach { case KvCommit(tmp, _) =>
      Files.deleteIfExists(Paths.get(tmp))
    }
}

private[sources] class KvWriterFactory(path: String) extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new DataWriter[InternalRow] {
      private val tmp = s"$path/_tmp-$partitionId-$taskId"
      private val out = {
        Files.createDirectories(Paths.get(path))
        new java.io.BufferedWriter(new java.io.FileWriter(tmp))
      }
      override def write(row: InternalRow): Unit = {
        out.write(s"${row.getUTF8String(0)} ${row.getUTF8String(1)}")
        out.write("\n")
      }
      override def commit(): WriterCommitMessage = {
        out.close()
        KvCommit(tmp, s"$path/mr-out-$partitionId")
      }
      override def abort(): Unit = { out.close(); Files.deleteIfExists(Paths.get(tmp)) }
      override def close(): Unit = ()
    }
}
