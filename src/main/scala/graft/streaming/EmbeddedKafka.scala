package graft.streaming

import scala.collection.concurrent.TrieMap
import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.Dataset

import graft.core.StreamElement

/** Kafka-shaped commit log behind the `kafka://` storage seam — TWO
  * broker bindings under one [[TopicHandle]] surface: the in-process
  * [[Topic]] store, and the NETWORKED binding where the broker is a
  * [[KafkaWire]] TCP server in this or another process
  * (`tcp:<host>:<port>` broker ids). No Kafka jars exist in this build
  * (offline resolution — so neither kafka-clients nor an embeddable
  * KRaft broker is possible); the wire binding makes every broker
  * interaction a real socket protocol anyway, and a genuine
  * spark-sql-kafka binding seats behind the same
  * [[AttributeLogFamily]]/[[TopicHandle]] surface when jars exist.
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

  /** The client surface of a Kafka-shaped topic — what every consumer of
    * the `kafka://` family programs against. Two bindings: the in-JVM
    * [[Topic]] (the broker lives in this process) and the networked
    * [[RemoteTopic]] (the broker is another process; every call is a
    * [[KafkaWire]] round trip). A future genuine `org.apache.kafka`
    * client binding seats HERE.
    */
  sealed trait TopicHandle {
    def broker: String
    def name: String
    def numPartitions: Int
    def append(e: StreamElement): Record
    def earliestOffsets: Map[Int, Long]
    def latestOffsets: Map[Int, Long]
    def commit(group: String, offsets: Map[Int, Long]): Unit
    def committed(group: String): Map[Int, Long]
    def slice(p: Int, from: Long, until: Long): Array[StreamElement]

    /** KeyAttributePartitioner: stable hash of (key, attribute). */
    final def partitionFor(e: StreamElement): Int =
      math.floorMod((e.key + "#" + e.attribute).hashCode, numPartitions)

    /** Sequential append of a batch. In-process this is the plain loop;
      * the wire binding overrides it with ONE round trip — a
      * per-element append over TCP would pay a connection per record.
      */
    def appendAll(elems: Seq[StreamElement]): Unit = elems.foreach(append)

    /** Poll records at-or-after `from` per partition (absent partitions
      * start at the beginning), ordered by (partition, offset).
      */
    final def poll(from: Map[Int, Long] = Map.empty): Seq[Record] =
      (0 until numPartitions).flatMap { p =>
        val start = math.max(0L, from.getOrElse(p, 0L))
        slice(p, start, Long.MaxValue).iterator.zipWithIndex.map {
          case (e, i) => Record(p, start + i, e)
        }
      }
  }

  private val topics = TrieMap.empty[String, TopicHandle]

  /** Resolve-or-create a broker-scoped topic (`kafka://broker/topic`).
    * Broker ids of the form `tcp:<host>:<port>` resolve to a
    * [[RemoteTopic]] speaking [[KafkaWire]] to that address; anything
    * else is an in-process [[Topic]].
    */
  def topic(broker: String, name: String, numPartitions: Int = 4): TopicHandle =
    if (KafkaWire.isWire(broker)) {
      // the broker owns the partition count: CREATE is idempotent and
      // returns the actual width (an existing topic keeps its layout).
      // Re-validate on EVERY resolve rather than trusting the cache — an
      // ephemeral port reused by a later broker, or a drop+recreate from
      // another process at a different width, would otherwise leave a
      // stale handle silently routing by the wrong partition count. One
      // extra round trip per driver-side resolve; executor tasks never
      // resolve handles (they open clients from the broker string).
      val n = KafkaWire.withClient(broker)(_.create(name, numPartitions))
      topics.get(s"$broker/$name") match {
        case Some(h: RemoteTopic) if h.numPartitions == n => h
        case _ =>
          val h = new RemoteTopic(broker, name, n)
          topics.put(s"$broker/$name", h)
          h
      }
    } else topics.getOrElseUpdate(s"$broker/$name",
      new Topic(broker, name, numPartitions))

  /** The in-process resolution only — the wire SERVER uses this to reach
    * the log it owns without re-dispatching on the broker string.
    */
  private[streaming] def localTopic(broker: String, name: String,
      numPartitions: Int = 4): Topic =
    topic(broker, name, numPartitions).asInstanceOf[Topic]

  /** Drop all topics (test isolation). */
  def reset(): Unit = topics.clear()

  /** Topics an in-process broker currently serves, with widths — the
    * wire server answers OpTopics (the follower re-join protocol's
    * first step) from this.
    */
  private[streaming] def listLocal(broker: String): Seq[(String, Int)] =
    topics.toSeq.collect {
      case (key, t: Topic) if key.startsWith(broker + "/") =>
        (key.stripPrefix(broker + "/"), t.numPartitions)
    }.sortBy(_._1)

  /** Release every topic of an in-process broker id (a closed wire
    * server's per-instance store must not outlive it).
    */
  private[streaming] def dropLocalBroker(broker: String): Unit =
    topics.keys.filter(_.startsWith(broker + "/"))
      .foreach(k => topics.remove(k))

  /** Drop ONE topic and release its retained log (scratch topics of
    * repeatedly-run queries must not accumulate in a long session).
    */
  def drop(broker: String, name: String): Unit = {
    topics.remove(s"$broker/$name")
    // a wire drop must reach the broker even when THIS process never
    // cached a handle — the topic may have been created by another
    // process, and drop-by-name is the whole point of a shared broker
    if (KafkaWire.isWire(broker)) KafkaWire.withClient(broker)(_.drop(name))
  }

  /** Networked topic handle: the broker is ANOTHER process (or another
    * object in this one, reached the same way) at `tcp:<host>:<port>`;
    * each call is a wire round trip and the broker's process assigns
    * partitions and offsets. Handles are driver-side resolution objects;
    * executor-side readers/writers open their own [[KafkaWire.Client]]
    * from the broker STRING (this class never rides a task closure).
    */
  final class RemoteTopic(val broker: String, val name: String,
      val numPartitions: Int) extends TopicHandle {
    private def withClient[T](f: KafkaWire.Client => T): T =
      KafkaWire.withClient(broker)(f)
    def append(e: StreamElement): Record = {
      val (p, off) = withClient(_.append(name, e))
      Record(p, off, e)
    }
    def earliestOffsets: Map[Int, Long] = withClient(_.earliest(name))
    def latestOffsets: Map[Int, Long] = withClient(_.latest(name))
    def commit(group: String, offsets: Map[Int, Long]): Unit =
      withClient(_.commit(name, group, offsets))
    def committed(group: String): Map[Int, Long] =
      withClient(_.committed(name, group))
    def slice(p: Int, from: Long, until: Long): Array[StreamElement] =
      withClient(_.slice(name, p, from, until))
    override def appendAll(elems: Seq[StreamElement]): Unit = {
      withClient(_.appendBatch(name, elems.iterator)); ()
    }
  }

  final class Topic(val broker: String, val name: String,
      val numPartitions: Int) extends TopicHandle {
    // per-PARTITION monitors (each buffer is its own lock): appends and
    // slices of different partitions must never serialize on one
    // topic-wide lock — the partition is the scaling unit on both sides
    // of the log (the reference splits consumption per partition,
    // DirectUnboundedSource.split:161; the wire broker serves each
    // connection on its own thread), so a producer fleet writing 8
    // partitions and an executor fleet fetching 8 splits both run
    // genuinely in parallel here. Cross-partition offset snapshots are
    // intentionally weakly consistent — Kafka itself orders nothing
    // across partitions, and per-partition offsets only grow.
    private val partitions: Array[ArrayBuffer[StreamElement]] =
      Array.fill(numPartitions)(ArrayBuffer.empty[StreamElement])
    private val groupOffsets = TrieMap.empty[String, Map[Int, Long]]

    def append(e: StreamElement): Record = {
      val p = partitionFor(e)
      val buf = partitions(p)
      buf.synchronized {
        buf += e
        Record(p, buf.size - 1L, e)
      }
    }

    /** Replica apply: insert at an EXPLICIT leader-assigned offset. The
      * leader's concurrent connections forward in whatever order their
      * threads run, so frames can arrive out of per-partition order —
      * future offsets park in a reassembly buffer and drain the moment
      * the gap fills, which makes the replica's log byte-identical to
      * the leader's under any interleave. Already-held offsets are
      * skipped (idempotent — a leader retry or a sync racing live
      * replication cannot double-apply).
      */
    private[streaming] def appendAt(p: Int, offset: Long,
        e: StreamElement): Unit = {
      val buf = partitions(p)
      buf.synchronized {
        if (offset >= buf.size) {
          val pend = pending(p)
          pend.put(offset, e)
          while (!pend.isEmpty && pend.firstKey == buf.size.toLong) {
            buf += pend.pollFirstEntry().getValue
          }
        }
      }
    }

    /** Per-partition reassembly buffers for [[appendAt]] (guarded by the
      * partition's own monitor).
      */
    private val pending: Array[java.util.TreeMap[Long, StreamElement]] =
      Array.fill(numPartitions)(new java.util.TreeMap[Long, StreamElement]())

    def earliestOffsets: Map[Int, Long] =
      (0 until numPartitions).map(_ -> 0L).toMap

    def latestOffsets: Map[Int, Long] =
      (0 until numPartitions).map { p =>
        val buf = partitions(p)
        p -> buf.synchronized(buf.size.toLong)
      }.toMap

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

    /** Every group's committed positions — the wire's OpGroups answer;
      * the follower re-join sync replays these through [[commit]]'s
      * max-merge (idempotent, order-independent).
      */
    private[streaming] def groups: Seq[(String, Map[Int, Long])] =
      groupOffsets.toSeq.sortBy(_._1)

    /** Records of one partition in offset range [from, until) — the
      * per-split read the streaming source's partition readers issue.
      */
    def slice(p: Int, from: Long, until: Long): Array[StreamElement] = {
      val buf = partitions(p)
      buf.synchronized {
        val lo = math.max(0L, from).toInt
        val hi = math.min(buf.size.toLong, until).toInt
        if (hi <= lo) Array.empty else buf.slice(lo, hi).toArray
      }
    }

    private[streaming] def allElements: Seq[StreamElement] =
      partitions.toSeq.flatMap(b => b.synchronized(b.toSeq))
  }

  /** A consumer in a group: poll from the committed position, process,
    * ack → commit (CommitLogReader.observe + OnNextContext.confirm).
    */
  final class Consumer(topic: TopicHandle, group: String) {
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
    val topic: EmbeddedKafka.TopicHandle) extends AttributeLogFamily {
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
    topic.appendAll(elems)
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

  /** Commits serialize per topic. In-process topics key by object
    * identity (no second JVM can reach them); wire topics key by the
    * broker ADDRESS + name, since two handles to one remote topic are
    * the same log (the broker itself serializes appends regardless —
    * this token only scopes the in-JVM monitor).
    */
  override def commitLockToken: String = topic match {
    case _: EmbeddedKafka.RemoteTopic =>
      s"kafka:${topic.broker}/${topic.name}"
    case t => s"kafka:${System.identityHashCode(t)}"
  }
}
