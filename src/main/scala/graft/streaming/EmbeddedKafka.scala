package graft.streaming

import scala.collection.concurrent.TrieMap
import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.Dataset

import graft.core.StreamElement

/** Embedded Kafka-shaped commit log — the test double behind the
  * `kafka://` storage seam (no network and no Kafka client jars exist in
  * this build; the production binding seats spark-sql-kafka behind the
  * same [[AttributeLogFamily]] surface).
  *
  * Implements the observable semantics of the reference's Kafka storage
  * (reference: direct/io-kafka/.../KafkaStorage.java:53,
  * KafkaLogReader observe/ack, DirectUnboundedSource.java:47 offsets and
  * splits):
  *
  *  - a topic has a fixed number of PARTITIONS; elements route by hash of
  *    (key, attribute) — the reference's KeyAttributePartitioner.java:22 —
  *    so one key's history is totally ordered within one partition;
  *  - every append gets a monotonically increasing OFFSET within its
  *    partition;
  *  - consumer groups COMMIT offsets; a new consumer of the group resumes
  *    from the committed position (at-least-once replay of uncommitted
  *    tail, exactly the reference's observe/ack contract).
  */
object EmbeddedKafka {

  final case class Record(partition: Int, offset: Long, element: StreamElement)

  private val topics = TrieMap.empty[String, Topic]

  /** Resolve-or-create a broker-scoped topic: `kafka://broker/topic`. */
  def topic(broker: String, name: String, numPartitions: Int = 4): Topic =
    topics.getOrElseUpdate(s"$broker/$name", new Topic(broker, name, numPartitions))

  /** Drop all topics (test isolation). */
  def reset(): Unit = topics.clear()

  /** Drop ONE topic and release its retained log (scratch topics of
    * repeatedly-run queries must not accumulate in a long session).
    */
  def drop(broker: String, name: String): Unit = {
    topics.remove(s"$broker/$name"); ()
  }

  final class Topic(val broker: String, val name: String, val numPartitions: Int) {
    private val partitions: Array[ArrayBuffer[StreamElement]] =
      Array.fill(numPartitions)(ArrayBuffer.empty[StreamElement])
    private val groupOffsets = TrieMap.empty[String, Map[Int, Long]]

    /** KeyAttributePartitioner: stable hash of (key, attribute). */
    def partitionFor(e: StreamElement): Int =
      math.floorMod((e.key + "#" + e.attribute).hashCode, numPartitions)

    def append(e: StreamElement): Record = synchronized {
      val p = partitionFor(e)
      val buf = partitions(p)
      buf += e
      Record(p, buf.size - 1L, e)
    }

    def earliestOffsets: Map[Int, Long] =
      (0 until numPartitions).map(_ -> 0L).toMap

    def latestOffsets: Map[Int, Long] = synchronized {
      (0 until numPartitions).map(p => p -> partitions(p).size.toLong).toMap
    }

    /** Poll records at-or-after `from` per partition (absent partitions
      * start at the beginning), ordered by (partition, offset).
      */
    def poll(from: Map[Int, Long] = Map.empty): Seq[Record] = synchronized {
      (0 until numPartitions).flatMap { p =>
        val start = math.max(0L, from.getOrElse(p, 0L)).toInt
        partitions(p).iterator.zipWithIndex.drop(start).map {
          case (e, off) => Record(p, off.toLong, e)
        }
      }
    }

    // monotone per-partition: a commit can only ADVANCE the group
    // position (Kafka semantics); a plain overwrite would let a slower
    // consumer's stale ack REGRESS a concurrent consumer's committed
    // offset and re-deliver acknowledged records
    def commit(group: String, offsets: Map[Int, Long]): Unit =
      groupOffsets.updateWith(group) {
        case Some(cur) => Some(cur ++ offsets.map { case (p, o) =>
          p -> math.max(o, cur.getOrElse(p, Long.MinValue)) })
        case None      => Some(offsets)
      }

    def committed(group: String): Map[Int, Long] =
      groupOffsets.getOrElse(group, Map.empty)

    /** Records of one partition in offset range [from, until) — the
      * per-split read the streaming source's partition readers issue.
      */
    def slice(p: Int, from: Long, until: Long): Array[StreamElement] =
      synchronized {
        val buf = partitions(p)
        val lo = math.max(0L, from).toInt
        val hi = math.min(buf.size.toLong, until).toInt
        if (hi <= lo) Array.empty else buf.slice(lo, hi).toArray
      }

    private[streaming] def allElements: Seq[StreamElement] =
      synchronized { partitions.flatMap(_.toSeq).toSeq }
  }

  /** A consumer in a group: poll from the committed position, process,
    * ack → commit (CommitLogReader.observe + OnNextContext.confirm).
    */
  final class Consumer(topic: Topic, group: String) {
    /** Fetch everything past the committed position WITHOUT committing —
      * a crash before ack replays these records to the next consumer.
      */
    def pollUncommitted(): Seq[Record] = topic.poll(topic.committed(group))

    /** Acknowledge processed records: advance the group offsets past them. */
    def ack(records: Seq[Record]): Unit = {
      if (records.nonEmpty) {
        val next = records.groupBy(_.partition)
          .map { case (p, rs) => p -> (rs.map(_.offset).max + 1) }
        topic.commit(group, topic.committed(group) ++ next)
      }
    }
  }
}

/** `kafka://` attribute family over the embedded log.
  *
  * Both read paths go through the [[KafkaSource]] DataSourceV2: batch
  * reads plan one split per topic partition (readers pull their slice —
  * the distributed plan shape; only the embedded broker itself is
  * driver-JVM state, exactly like the reference's test InMemStorage),
  * and streaming is the offset-tracked `MicroBatchStream` with
  * checkpointed offsets, restart recovery and admission control.
  */
final class KafkaLogFamily(val spark: org.apache.spark.sql.SparkSession,
    val topic: EmbeddedKafka.Topic) extends AttributeLogFamily {
  import graft.core.StreamElement.encoder

  /** Distributed append through the DataSourceV2 write path — executor
    * tasks buffer their partitions and the records land on the broker in
    * the DRIVER-side job commit (commit messages carry the rows: the
    * broker is a driver-JVM object an executor process cannot reach, see
    * [[KafkaWrite]]).
    *
    * Ordering/delivery contract (differs from the `Seq` overload, which
    * appends in sequence order from the driver): broker offset order is
    * commit-message order (per Spark partition), NOT dataset row order
    * across partitions, and a retried WRITE JOB re-appends — at-least-
    * once at job granularity. Callers needing exactly-once batch appends
    * should route through [[AttributeLogFamily.appendIdempotent]] (uuid
    * anti-join) instead; callers needing deterministic offsets should
    * use the `Seq` overload or a single-partition dataset.
    */
  def append(elems: Dataset[StreamElement]): Unit =
    elems.toDF().write.format(KafkaSource.SHORT_NAME)
      .option("broker", topic.broker).option("topic", topic.name)
      .mode("append").save()

  /** ONE-pass snapshot for the live broker: the skew-safe two-pass
    * default references the log twice, and a kafka batch scan resolves
    * its offset range PER SCAN at planning time — a concurrent append
    * landing between the two resolutions would tear the snapshot (the
    * tombstone pass seeing data the latest pass does not). The typed
    * one-pass aggregator reads the topic exactly once, so the snapshot
    * is always a point-in-time state of the log; for a mutable live
    * source that consistency outranks the wide-wildcard-key buffer
    * trade (a topic hot-key compaction is bounded by its retained
    * segment anyway).
    */
  override def batchSnapshot(asOf: Long = Long.MaxValue): Dataset[StreamElement] =
    graft.operators.LatestWithTombstones.snapshot(batchUpdates(), asOf)

  override def append(elems: Seq[StreamElement]): Unit = {
    graft.core.Metrics.inc("graft.elements.appended", elems.size.toLong)
    elems.foreach(topic.append)
  }

  def batchUpdates(from: Long = Long.MinValue,
      until: Long = Long.MaxValue): Dataset[StreamElement] = {
    var df = spark.read.format(KafkaSource.SHORT_NAME)
      .option("broker", topic.broker).option("topic", topic.name).load()
    if (from != Long.MinValue)
      df = df.filter(org.apache.spark.sql.functions.col("stamp") >= from)
    if (until != Long.MaxValue)
      df = df.filter(org.apache.spark.sql.functions.col("stamp") < until)
    df.as[StreamElement]
  }

  def streamFromOldest(): Dataset[StreamElement] =
    streamReader(None).load().as[StreamElement]

  /** Streaming subscription that also COMMITS processed offsets to the
    * consumer group after each checkpointed micro-batch (the reference's
    * observe+ack pairing).
    */
  def streamFromOldest(group: String): Dataset[StreamElement] =
    streamReader(Some(group)).load().as[StreamElement]

  /** Throughput-limited streaming subscription: at most
    * `maxRecordsPerTrigger` records per micro-batch — the reference's
    * ThroughputLimiter knob on the source's admission control.
    */
  def streamFromOldestThrottled(maxRecordsPerTrigger: Long): Dataset[StreamElement] =
    streamReader(None)
      .option("maxRecordsPerTrigger", maxRecordsPerTrigger)
      .load().as[StreamElement]

  private def streamReader(group: Option[String]) = {
    val r = spark.readStream.format(KafkaSource.SHORT_NAME)
      .option("broker", topic.broker).option("topic", topic.name)
    group.fold(r)(g => r.option("group", g))
  }

  def consumer(group: String): EmbeddedKafka.Consumer =
    new EmbeddedKafka.Consumer(topic, group)

  /** Commits serialize per embedded topic (in-process store — no second
    * JVM can reach it, so no cross-process lock path).
    */
  override def commitLockToken: String =
    s"kafka:${System.identityHashCode(topic)}"
}
