package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.metric.CustomTaskMetric
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, SupportsTruncate, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSource V2 WRITE surface: a validation sink that computes a
  * partition-order-independent checksum of everything written —
  * `df.write.format("graft.sources.ChecksumSink").option("name", t)
  * .mode("append"|"overwrite").save()`, result via
  * [[ChecksumSink.result]].
  *
  * The point is the two-phase commit protocol a real sink implements:
  * each task's DataWriter accumulates (count, xor-of-row-hashes) and
  * surfaces it as its WriterCommitMessage; the driver-side BatchWrite
  * aggregates ONLY committed messages — a speculative duplicate or failed
  * task's partial state is discarded by abort(), never double-counted.
  * XOR + count aggregation is commutative, so the result is independent
  * of partitioning and task order, which the spec exploits.
  */
class ChecksumSink extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    new StructType() // schema comes from the written DataFrame
  override def supportsExternalMetadata(): Boolean = true
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new ChecksumTable(schema, properties.getOrDefault("name", "default"))
}

object ChecksumSink {
  /** (rows written, xor checksum) per sink name — last committed write. */
  private val results = new java.util.concurrent.ConcurrentHashMap[String, (Long, Long)]()
  def result(name: String): Option[(Long, Long)] = Option(results.get(name))
  /** Release a consumed entry — nonce-suffixed sink names (the
    * q_checksum_sink reentrancy fix) must not accumulate in the
    * JVM-global registry across repeated builds in one session. */
  def clear(name: String): Unit = results.remove(name)
  private[sources] def record(name: String, v: (Long, Long)): Unit =
    results.put(name, v)

  /** Stable content hash of a row (schema-driven; UTF8String/primitive
    * hashCodes are content-based). */
  private[sources] def rowHash(row: InternalRow, schema: StructType): Long = {
    var h = 1L
    var i = 0
    while (i < schema.length) {
      val v = row.get(i, schema(i).dataType)
      h = h * 31 + (if (v == null) 0 else v.hashCode())
      i += 1
    }
    h
  }
}

private class ChecksumTable(schema0: StructType, name: String)
    extends Table with SupportsWrite {
  override def name(): String = s"checksum($name)"
  override def schema(): StructType = schema0
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_WRITE, TableCapability.TRUNCATE)
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new ChecksumWriteBuilder(info.schema(), name)
}

private class ChecksumWriteBuilder(schema: StructType, name: String)
    extends WriteBuilder with SupportsTruncate {
  override def truncate(): WriteBuilder = this // sink keeps no prior state
  override def build(): Write = new Write {
    override def toBatch: BatchWrite = new ChecksumBatchWrite(schema, name)
  }
}

private case class ChecksumMessage(count: Long, checksum: Long)
    extends WriterCommitMessage

private class ChecksumBatchWrite(schema: StructType, name: String)
    extends BatchWrite {
  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new ChecksumWriterFactory(schema)
  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    // only COMMITTED task messages arrive here; aborted/speculative
    // duplicates never contribute
    val agg = messages.foldLeft((0L, 0L)) { case ((n, x), m) =>
      val c = m.asInstanceOf[ChecksumMessage]
      (n + c.count, x ^ c.checksum)
    }
    ChecksumSink.record(name, agg)
  }
  override def abort(messages: Array[WriterCommitMessage]): Unit = ()
}

private class ChecksumWriterFactory(schema: StructType) extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new DataWriter[InternalRow] {
      private var count = 0L
      private var checksum = 0L
      override def write(row: InternalRow): Unit = {
        count += 1
        checksum ^= ChecksumSink.rowHash(row, schema)
      }
      override def commit(): WriterCommitMessage = ChecksumMessage(count, checksum)
      override def abort(): Unit = ()
      override def close(): Unit = ()
      override def currentMetricsValues(): Array[CustomTaskMetric] = Array.empty
    }
}
