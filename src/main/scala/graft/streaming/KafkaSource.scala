package graft.streaming

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadAllAvailable, ReadLimit, ReadMaxRows, SupportsTriggerAvailableNow}
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.StructType
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.core.StreamElement

/** Offset-tracked Structured Streaming source over the embedded Kafka
  * log — a real DataSourceV2 `MicroBatchStream`, not a MemoryStream pump:
  * offsets are planned per partition, each micro-batch reads exactly
  * [start, end) splits (one `InputPartition` per topic partition), the
  * engine checkpoints the JSON offsets, and a restarted query resumes
  * from the committed position (reference: the reference's
  * DirectUnboundedSource.java:47 checkpoints per-split offsets the same
  * way; its KafkaLogReader observe/ack maps to `commit`).
  *
  * Two broker bindings (see [[EmbeddedKafka.TopicHandle]]):
  *
  *  - WIRE brokers (`tcp:<host>:<port>`, a [[KafkaWire]] server in any
  *    process): splits carry OFFSETS ONLY and each executor task fetches
  *    its slice from the broker over the socket; writers buffer their
  *    task's rows and PRODUCE them over the socket at task commit — the
  *    networked binding's plan shape end to end (at-least-once at
  *    task-attempt granularity, like spark-sql-kafka's producer).
  *  - IN-PROCESS brokers: the log lives in the DRIVER JVM only —
  *    executors are separate processes on a real cluster and cannot see
  *    its static registry (LocalClusterSmoke proved a registry-reading
  *    PartitionReader returns zero rows under local-cluster). The
  *    process boundary is honored the way a networked binding honors the
  *    broker boundary: splits carry the records fetched at PLAN time on
  *    the driver, and writes ride back in task commit messages (the
  *    pattern of Spark's own memory sink).
  *
  * Everything Spark-facing (offset planning, splits, checkpoint
  * recovery, group commit) is identical across the two.
  *
  * Usage: `spark.readStream.format("graft-kafka").option("broker", b)
  * .option("topic", t)` with optional `option("group", g)` to commit
  * processed offsets to a consumer group on the embedded log.
  */
object KafkaSource {

  val SHORT_NAME = "graft-kafka"

  def schema: StructType = StreamElement.encoder.schema

  private[streaming] def offsetsToJson(m: Map[Int, Long]): String =
    m.toSeq.sortBy(_._1).map { case (p, o) => s""""$p":$o""" }
      .mkString("{", ",", "}")

  private[streaming] def offsetsFromJson(s: String): Map[Int, Long] = {
    val body = s.trim.stripPrefix("{").stripSuffix("}").trim
    if (body.isEmpty) Map.empty
    else body.split(",").map { kv =>
      val Array(k, v) = kv.split(":")
      k.trim.stripPrefix("\"").stripSuffix("\"").toInt -> v.trim.toLong
    }.toMap
  }

  /** StreamElement → InternalRow in the product-encoder field order. */
  private[streaming] def toRow(e: StreamElement): InternalRow =
    new GenericInternalRow(Array[Any](
      UTF8String.fromString(e.entity), UTF8String.fromString(e.key),
      UTF8String.fromString(e.attribute), UTF8String.fromString(e.uuid),
      e.seqId, e.stamp, e.value, e.delete, e.deleteWildcard))

  /** InternalRow (product-encoder field order) → StreamElement. */
  private[streaming] def fromRow(r: InternalRow): StreamElement =
    StreamElement(
      r.getUTF8String(0).toString, r.getUTF8String(1).toString,
      r.getUTF8String(2).toString, r.getUTF8String(3).toString,
      r.getLong(4), r.getLong(5),
      if (r.isNullAt(6)) null else r.getBinary(6),
      r.getBoolean(7), r.getBoolean(8))
}

/** Per-partition offsets, serialized as `{"0":12,"1":7}`. */
case class KafkaSourceOffset(offsets: Map[Int, Long]) extends Offset {
  override def json(): String = KafkaSource.offsetsToJson(offsets)
}

class KafkaSourceProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = KafkaSource.SHORT_NAME
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    KafkaSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new KafkaSourceTable(properties.get("broker"), properties.get("topic"),
      Option(properties.get("group")),
      Option(properties.get("maxRecordsPerTrigger")).map(_.toLong))
}

class KafkaSourceTable(broker: String, topicName: String, group: Option[String],
    maxRecordsPerTrigger: Option[Long]) extends Table
    with SupportsRead with SupportsWrite {
  require(broker != null && topicName != null,
    "graft-kafka requires options broker and topic")
  override def name(): String = s"graft-kafka://$broker/$topicName"
  override def schema(): StructType = KafkaSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ, TableCapability.BATCH_READ,
      TableCapability.BATCH_WRITE, TableCapability.STREAMING_WRITE)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan =
        new KafkaScan(broker, topicName, group, maxRecordsPerTrigger)
    }
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    val names = info.schema().fieldNames.toSeq
    require(names == KafkaSource.schema.fieldNames.toSeq,
      s"graft-kafka writes take the StreamElement schema " +
        s"(${KafkaSource.schema.fieldNames.mkString(", ")}); got " +
        names.mkString(", "))
    new WriteBuilder {
      override def build(): Write = new KafkaWrite(broker, topicName)
    }
  }
}

/** DataSourceV2 write onto the embedded log. Executor tasks CANNOT
  * append to the driver-resident broker directly (on a real cluster the
  * executor JVM's static registry is a different, empty object — a
  * direct `topic.append` there silently drops every record, which
  * LocalClusterSmoke exists to catch). Task writers therefore buffer the
  * epoch's records and ship them in their commit message; the
  * DRIVER-side commit appends them to the broker — the same
  * rows-ride-the-commit-message pattern as Spark's own memory sink, and
  * the honest process-boundary analog of a networked produce. Only
  * COMMITTED task attempts land (a speculative duplicate attempt's
  * message is discarded by Spark before commit), preserving the log's
  * at-least-once contract across query retries.
  */
class KafkaWrite(broker: String, topicName: String) extends Write {
  private def append(messages: Array[WriterCommitMessage], metric: String): Unit = {
    // lazy: wire-broker commits carry only produced COUNTS (the tasks
    // already produced over the socket) — resolving the handle anyway
    // would pay a wire round trip per epoch for nothing
    lazy val topic = EmbeddedKafka.topic(broker, topicName)
    var n = 0L
    messages.foreach { m =>
      val km = m.asInstanceOf[KafkaCommitMessage]
      if (km.elements.nonEmpty) km.elements.foreach(topic.append)
      n += km.elements.length + km.produced
    }
    graft.core.Metrics.inc(metric, n)
  }
  override def toBatch: BatchWrite = new BatchWrite {
    override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
      new KafkaWriterFactory(broker, topicName)
    override def commit(messages: Array[WriterCommitMessage]): Unit =
      append(messages, "graft.kafka.batch.written")
    override def abort(messages: Array[WriterCommitMessage]): Unit = ()
  }
  override def toStreaming: StreamingWrite = new StreamingWrite {
    override def createStreamingWriterFactory(info: PhysicalWriteInfo): StreamingDataWriterFactory =
      new KafkaWriterFactory(broker, topicName)
    override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit =
      append(messages, "graft.kafka.stream.written")
    override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit = ()
  }
}

/** In-JVM brokers: `elements` ride to the driver, which appends them in
  * job commit. Wire brokers: the TASK already produced over the socket —
  * `produced` carries only the count for the driver-side metric.
  */
case class KafkaCommitMessage(elements: Array[StreamElement],
    produced: Long = 0L) extends WriterCommitMessage

class KafkaWriterFactory(broker: String, topicName: String)
    extends DataWriterFactory with StreamingDataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    writer
  override def createWriter(partitionId: Int, taskId: Long,
      epochId: Long): DataWriter[InternalRow] = writer
  private def writer: DataWriter[InternalRow] = new DataWriter[InternalRow] {
    private val buf = scala.collection.mutable.ArrayBuffer.empty[StreamElement]
    override def write(row: InternalRow): Unit = {
      buf += KafkaSource.fromRow(row); ()
    }
    override def commit(): WriterCommitMessage =
      if (KafkaWire.isWire(broker)) {
        // REAL networked produce, executor-side, on task commit: the
        // buffered batch goes to the broker over the socket in one
        // append. At-least-once at task-attempt granularity (a committed
        // attempt whose commit message the driver later discards has
        // still produced) — the same contract as Kafka's non-
        // transactional producer in spark-sql-kafka; exactly-once batch
        // ingest routes through AttributeLogFamily.appendIdempotent.
        val n = KafkaWire.withClient(broker)(
          _.appendBatch(topicName, buf.iterator))
        KafkaCommitMessage(Array.empty, produced = n.toLong)
      } else KafkaCommitMessage(buf.toArray)
    override def abort(): Unit = ()
    override def close(): Unit = ()
  }
}

class KafkaScan(broker: String, topicName: String, group: Option[String],
    maxRecordsPerTrigger: Option[Long] = None) extends Scan {
  override def readSchema(): StructType = KafkaSource.schema

  /** Batch read: one split per partition over [0, latest). Wire brokers
    * plan offsets ONLY — the executor-side reader fetches its slice from
    * the broker itself (the networked plan shape).
    */
  override def toBatch: Batch = new Batch {
    override def planInputPartitions(): Array[InputPartition] = {
      val t = EmbeddedKafka.topic(broker, topicName)
      val wire = KafkaWire.isWire(broker)
      t.latestOffsets.toArray.map { case (p, end) =>
        KafkaInputPartition(broker, topicName, p, 0L, end,
          if (wire) Array.empty else t.slice(p, 0L, end)): InputPartition
      }
    }
    override def createReaderFactory(): PartitionReaderFactory =
      new KafkaReaderFactory
  }

  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new KafkaMicroBatchStream(broker, topicName, group, maxRecordsPerTrigger)
}

/** A split: one topic partition, offsets [from, until). `elements` are
  * the split's records, fetched from the DRIVER-resident broker at plan
  * time — a reader resolving the static registry executor-side would see
  * an EMPTY broker on a real cluster (a networked split carries only
  * offsets because its executor can fetch from the broker itself; ours
  * cannot, and the per-split volume is identical either way).
  */
case class KafkaInputPartition(broker: String, topic: String, partition: Int,
    from: Long, until: Long, elements: Array[StreamElement]) extends InputPartition

class KafkaReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[KafkaInputPartition]
    // wire splits carry offsets only: THIS task fetches its slice from
    // the broker over the socket — the real networked fetch, running
    // wherever Spark scheduled the task
    val elems =
      if (KafkaWire.isWire(p.broker))
        KafkaWire.withClient(p.broker)(_.slice(p.topic, p.partition,
          p.from, p.until))
      else p.elements
    new PartitionReader[InternalRow] {
      private var i = -1
      override def next(): Boolean = { i += 1; i < elems.length }
      override def get(): InternalRow = KafkaSource.toRow(elems(i))
      override def close(): Unit = ()
    }
  }
}

/** Admission control: `maxRecordsPerTrigger` caps each micro-batch (the
  * reference's ThroughputLimiter on the observe path; the same knob
  * spark-sql-kafka exposes), distributed greedily across partitions.
  * `Trigger.AvailableNow` snapshots the latest offsets up front and
  * drains to exactly that point in capped batches, then terminates.
  */
class KafkaMicroBatchStream(broker: String, topicName: String,
    group: Option[String], maxRecordsPerTrigger: Option[Long] = None)
    extends MicroBatchStream with SupportsTriggerAvailableNow {

  // resolved ONCE per stream instance (= per query run): wire-broker
  // resolution re-validates the partition count with a create round
  // trip, and this is the driver's per-trigger hot loop —
  // latestOffset/reportLatestOffset/prepare each land here several
  // times per micro-batch, so a per-call resolve would add connection
  // setups + round trips to every trigger. Stream start is the
  // re-validation point a stream needs (a topic dropped and recreated
  // at a different width MID-stream invalidates the checkpointed
  // offsets anyway).
  private lazy val topic = EmbeddedKafka.topic(broker, topicName)

  @volatile private var availableNowCap: Option[Map[Int, Long]] = None

  override def initialOffset(): Offset = KafkaSourceOffset(topic.earliestOffsets)

  override def latestOffset(): Offset = KafkaSourceOffset(topic.latestOffsets)

  override def getDefaultReadLimit: ReadLimit =
    maxRecordsPerTrigger.map(ReadLimit.maxRows).getOrElse(ReadLimit.allAvailable())

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowCap = Some(topic.latestOffsets)

  override def reportLatestOffset(): Offset = KafkaSourceOffset(topic.latestOffsets)

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val from = start.asInstanceOf[KafkaSourceOffset].offsets
    // AvailableNow drains to the prepared snapshot, never past it
    val target = availableNowCap.getOrElse(topic.latestOffsets)
    limit match {
      case _: ReadAllAvailable => KafkaSourceOffset(target)
      case mr: ReadMaxRows =>
        var budget = mr.maxRows()
        val out = target.toSeq.sortBy(_._1).map { case (p, end) =>
          val lo = from.getOrElse(p, 0L)
          val take = math.min(math.max(0L, end - lo), budget)
          budget -= take
          p -> (lo + take)
        }.toMap
        KafkaSourceOffset(out)
      case _ => KafkaSourceOffset(target)
    }
  }

  override def deserializeOffset(json: String): Offset =
    KafkaSourceOffset(KafkaSource.offsetsFromJson(json))

  /** Batch completed: advance the consumer group on the log (the
    * reference's OnNextContext.confirm ack path).
    */
  override def commit(end: Offset): Unit = {
    graft.core.Metrics.inc("graft.kafka.stream.batches")
    group.foreach(g =>
      topic.commit(g, end.asInstanceOf[KafkaSourceOffset].offsets))
  }

  override def stop(): Unit = ()

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[KafkaSourceOffset].offsets
    val t = topic // planning runs on the driver
    val wire = KafkaWire.isWire(broker)
    end.asInstanceOf[KafkaSourceOffset].offsets.toArray
      .flatMap { case (p, until) =>
        val from = s.getOrElse(p, 0L)
        if (until > from)
          // wire splits carry offsets only (executor fetches); in-JVM
          // splits carry the records, because the broker is a driver
          // object a real executor process cannot reach
          Some(KafkaInputPartition(broker, topicName, p, from, until,
            if (wire) Array.empty else t.slice(p, from, until)): InputPartition)
        else None
      }
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new KafkaReaderFactory
}
