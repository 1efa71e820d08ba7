package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2: a deterministic synthetic document corpus —
  * `spark.read.format("graft.sources.SynthSource").option("rows", n)
  * .option("partitions", p).load()` → (doc_id BIGINT, text STRING).
  *
  * Generation is a pure function of doc_id (16 words indexed by the first
  * 16 hex digits of md5(doc_id)), so the corpus is identical across runs,
  * partition counts and engines — a DuckDB oracle can regenerate it in
  * SQL, which is what q_synth_source checks. Reads are embarrassingly
  * parallel (one contiguous id range per input partition, no shuffle, no
  * driver-side data) and the scan supports COLUMN PRUNING: a doc_id-only
  * projection never computes md5/text at all.
  *
  * This is the extension tier for sources (SURVEY.md §7): TableProvider →
  * Table → ScanBuilder (+ SupportsPushDownRequiredColumns) → Batch →
  * PartitionReaderFactory, the same surface a parquet/Kafka connector
  * implements, here with a generator instead of IO.
  */
class SynthSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    SynthSource.Schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new SynthTable(
      properties.getOrDefault("rows", "1000").toLong,
      properties.getOrDefault("partitions", "4").toInt,
      properties.getOrDefault("rowsPerBatch", "250").toLong)
}

object SynthSource {
  val Schema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("text", StringType, nullable = false)))

  /** 16 words indexed by a hex digit — the whole generation rule. */
  val Vocab: IndexedSeq[String] = IndexedSeq(
    "alpha", "bravo", "charlie", "delta", "echo", "foxtrot", "golf",
    "hotel", "india", "juliett", "kilo", "lima", "mike", "november",
    "oscar", "papa")

  def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** The document for an id: 16 vocab words picked by the first 16 hex
    * digits of md5(id). Mirrored in SQL by q_synth_source's oracle. */
  def text(id: Long): String =
    md5hex(id.toString).substring(0, 16)
      .map(c => Vocab(Character.digit(c, 16))).mkString(" ")
}

private class SynthTable(rows: Long, partitions: Int, rowsPerBatch: Long)
    extends Table with SupportsRead {
  override def name(): String = s"synth($rows, $partitions)"
  override def schema(): StructType = SynthSource.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new SynthScanBuilder(rows, partitions, rowsPerBatch)
}

private class SynthScanBuilder(rows: Long, partitions: Int, rowsPerBatch: Long)
    extends ScanBuilder with SupportsPushDownRequiredColumns
    with org.apache.spark.sql.connector.read.SupportsPushDownFilters
    with org.apache.spark.sql.connector.read.SupportsPushDownAggregates {
  import org.apache.spark.sql.sources._
  import org.apache.spark.sql.connector.expressions.aggregate.{Aggregation, CountStar, Max, Min}

  private var required: StructType = SynthSource.Schema
  private var pushed: Array[Filter] = Array.empty
  // generated ids live in [lo, hi) — doc_id comparisons narrow the range
  // EXACTLY (ids are dense and ordered), so handled filters need no
  // residual re-evaluation and pruned partitions are never generated
  private var lo = 0L
  private var hi = Long.MaxValue
  private var aggRow: Option[Array[Long]] = None
  private var aggSchema: StructType = _

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (accepted, rejected) = filters.partition {
      case EqualTo("doc_id", v: Long) => lo = math.max(lo, v); hi = math.min(hi, v + 1); true
      case GreaterThan("doc_id", v: Long) => lo = math.max(lo, v + 1); true
      case GreaterThanOrEqual("doc_id", v: Long) => lo = math.max(lo, v); true
      case LessThan("doc_id", v: Long) => hi = math.min(hi, v); true
      case LessThanOrEqual("doc_id", v: Long) => hi = math.min(hi, v + 1); true
      case _ => false
    }
    pushed = accepted
    rejected // unhandled filters stay with Spark
  }
  override def pushedFilters(): Array[Filter] = pushed

  // ---- aggregate pushdown: stats a generator KNOWS without generating ----
  // Ids are dense in the (filter-narrowed) range, so ungrouped COUNT(*) /
  // MIN(doc_id) / MAX(doc_id) are pure range arithmetic — the same trick a
  // parquet scan plays with footer statistics. COMPLETE pushdown: Spark
  // plans no aggregation at all; the scan answers with one row.
  private def effectiveRange: (Long, Long) =
    (math.max(lo, 0L), math.min(rows, math.max(hi, 0L)))

  private def answer(agg: Aggregation): Option[(StructType, Array[Long])] = {
    if (agg.groupByExpressions.nonEmpty || agg.aggregateExpressions.isEmpty)
      return None
    val (l, h) = effectiveRange
    if (h <= l) return None // empty range: min/max are NULL — let Spark aggregate
    def isDocId(e: org.apache.spark.sql.connector.expressions.Expression): Boolean =
      e.describe == "doc_id"
    val cols = agg.aggregateExpressions.map {
      case _: CountStar => Some(StructField("count(*)", LongType, false) -> (h - l))
      case m: Min if isDocId(m.column) => Some(StructField("min(doc_id)", LongType, false) -> l)
      case m: Max if isDocId(m.column) => Some(StructField("max(doc_id)", LongType, false) -> (h - 1))
      case _ => None
    }
    if (cols.exists(_.isEmpty)) None
    else {
      val (fields, values) = cols.flatten.unzip
      Some((StructType(fields), values))
    }
  }

  override def supportCompletePushDown(agg: Aggregation): Boolean =
    answer(agg).isDefined

  override def pushAggregation(agg: Aggregation): Boolean =
    answer(agg) match {
      case Some((schema, values)) =>
        aggSchema = schema; aggRow = Some(values); true
      case None => false
    }

  override def build(): Scan = aggRow match {
    case Some(values) => new SynthAggScan(aggSchema, values)
    case None =>
      new SynthScan(math.min(rows, math.max(hi, 0)), math.max(lo, 0),
        partitions, required, rowsPerBatch)
  }
}

/** Single-row scan answering a completely-pushed aggregation. */
private class SynthAggScan(schema: StructType, values: Array[Long])
    extends Scan with Batch {
  override def readSchema(): StructType = schema
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] =
    Array(SynthAggPartition(values))
  override def createReaderFactory(): PartitionReaderFactory =
    new PartitionReaderFactory {
      override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
        val SynthAggPartition(vs) = p: @unchecked
        new PartitionReader[InternalRow] {
          private var done = false
          override def next(): Boolean = if (done) false else { done = true; true }
          override def get(): InternalRow =
            new GenericInternalRow(vs.map(v => v: Any))
          override def close(): Unit = ()
        }
      }
    }
}

private case class SynthAggPartition(values: Array[Long]) extends InputPartition

private class SynthScan(limit: Long, offset: Long, partitions: Int,
                        required: StructType, rowsPerBatch: Long)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] =
    SynthScan.ranges(offset, limit, partitions)
  override def createReaderFactory(): PartitionReaderFactory =
    new SynthReaderFactory(required.fieldNames)
  override def toMicroBatchStream(checkpointLocation: String)
      : org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
    new SynthMicroBatch(limit, offset, partitions, required, rowsPerBatch)
}

private object SynthScan {
  /** Contiguous id-range partitions for [offset, limit). */
  def ranges(offset: Long, limit: Long, partitions: Int): Array[InputPartition] = {
    val total = math.max(limit - offset, 0L)
    val per = math.max((total + partitions - 1) / partitions, 1L)
    (0 until partitions).iterator
      .map(i => SynthRange(offset + i * per,
        math.min(offset + (i + 1) * per, limit)))
      .filter(r => r.start < r.end).toArray
  }
}

/** Streaming offset: how many ids have been made available. */
private case class SynthStreamOffset(id: Long)
    extends org.apache.spark.sql.connector.read.streaming.Offset {
  override def json(): String = id.toString
}

/** Micro-batch view of the generator: each latestOffset() poll releases
  * the next `rowsPerBatch` ids (the rate-limited arrival shape of
  * maxFilesPerTrigger / maxOffsetsPerTrigger), so a bounded corpus flows
  * as a multi-batch stream with exactly-once offsets in the checkpoint.
  * Batches split into the SAME contiguous id-range partitions as the
  * batch scan; generation stays a pure function of doc_id, so restart
  * and replay are deterministic. Column pruning applies to the streaming
  * path through the same ScanBuilder. */
private class SynthMicroBatch(limit: Long, offset: Long, partitions: Int,
                              required: StructType, rowsPerBatch: Long)
    extends org.apache.spark.sql.connector.read.streaming.MicroBatchStream
    with org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow {
  import org.apache.spark.sql.connector.read.streaming.{Offset, ReadLimit}

  override def initialOffset(): Offset = SynthStreamOffset(offset)
  // admission control paces releases from the ENGINE-provided start, so
  // the stream is stateless across restarts (a checkpointed offset
  // resumes exactly where it left off)
  override def latestOffset(start: Offset, readLimit: ReadLimit): Offset = {
    val s = start.asInstanceOf[SynthStreamOffset].id
    // never regress below the engine's start (filters can make
    // limit < offset): offsets in the checkpoint must stay monotone
    SynthStreamOffset(math.max(s, math.min(s + rowsPerBatch, limit)))
  }
  override def reportLatestOffset(): Offset = SynthStreamOffset(limit)
  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()
  // AvailableNow: the engine drains batch-by-batch until latestOffset
  // stops advancing; the generator has no external cap to snapshot
  override def prepareForTriggerAvailableNow(): Unit = ()
  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "admission-control latestOffset(start, limit) is the entry point")
  override def deserializeOffset(json: String): Offset =
    SynthStreamOffset(json.toLong)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[SynthStreamOffset].id
    val e = end.asInstanceOf[SynthStreamOffset].id
    SynthScan.ranges(s, e, partitions)
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new SynthReaderFactory(required.fieldNames)
}

private case class SynthRange(start: Long, end: Long) extends InputPartition

private class SynthReaderFactory(fields: Array[String])
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val SynthRange(start, end) = partition: @unchecked
    new PartitionReader[InternalRow] {
      private var id = start - 1
      override def next(): Boolean = { id += 1; id < end }
      override def get(): InternalRow =
        new GenericInternalRow(fields.map {
          case "doc_id" => id: Any
          // text is only generated when the projection asks for it —
          // the pruning contract a real connector honors
          case "text" => UTF8String.fromString(SynthSource.text(id)): Any
        })
      override def close(): Unit = ()
    }
  }
}
