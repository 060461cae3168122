package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

import graft.core.StreamElement

/** File-backed commit-log attribute family: an append-only parquet directory
  * of StreamElements serving every access pattern of the reference's family
  * model (reference: commit-log reads CommitLogReader.java:37, batch reads
  * BatchLogReader.java, family routing BeamDataOperator.java:160-401).
  *
  *  - commit-log    → `stream()` / `streamFromOldest()` (file streaming
  *                    source; offsets+checkpoints replace manual acks)
  *  - batch-updates → `batchUpdates()` full-history scan with stamp-range
  *                    pushdown (start inclusive, end exclusive —
  *                    BeamDataOperator.getBatchUpdates:257)
  *  - batch-snapshot→ `batchSnapshot()` compacted read
  *  - writes        → `append()` (the OnlineAttributeWriter analog; each
  *                    append is one atomic parquet commit)
  *
  * The same interface seats a Kafka binding (spark.readStream.format
  * ("kafka")) — the routing layer only needs read/stream/append.
  */
final class CommitLogFamily(val spark: SparkSession, val path: String)
    extends AttributeLogFamily {
  import StreamElement.encoder

  /** One atomic parquet commit per append, serialized per log directory:
    * two concurrent append JOBS on one directory share `_temporary` under
    * the default FileOutputCommitter, so one job's commit/cleanup can
    * delete the other's staged task files — an acknowledged write lost
    * silently. Concurrent writers (gateway ingest handlers, transformation
    * sinks, transaction commits) therefore all funnel through the same
    * storage-keyed [[graft.core.CommitArbiter]] lock; the nested acquire
    * from a transaction commit (which already holds it) is a no-op.
    */
  def append(elems: Dataset[StreamElement]): Unit =
    graft.core.CommitArbiter.withCommitLock(this) {
      elems.write.mode("append").parquet(path)
    }

  /** Commits serialize per parquet directory, across family instances. */
  override def commitLockToken: String = s"parquet:$path"

  /** Cross-process arbitration through a marker file inside the log
    * directory (underscore-prefixed, so Spark's file index ignores it).
    */
  override def commitLockPath: Option[String] = Some(s"$path/_commit.lock")

  private def nonEmpty: Boolean = {
    // resolve from the PATH's scheme, not the default FS (same Wrong FS
    // hazard ensureDir already guards: an s3a:// family on an
    // hdfs-default cluster)
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = org.apache.hadoop.fs.FileSystem.get(p.toUri,
      spark.sparkContext.hadoopConfiguration)
    fs.exists(p)
  }

  /** Full update history (batch-updates access), optional stamp range
    * [from, until).
    */
  override def batchUpdates(from: Long = Long.MinValue,
      until: Long = Long.MaxValue): Dataset[StreamElement] = {
    if (!nonEmpty) StreamElement.emptyDs(spark)
    else {
      var df = spark.read.schema(encoder.schema).parquet(path)
      if (from != Long.MinValue) df = df.filter(col("stamp") >= from)
      if (until != Long.MaxValue) df = df.filter(col("stamp") < until)
      df.as[StreamElement]
    }
  }

  // batch-snapshot access (BeamDataOperator.getBatchSnapshot:328
  // fallback) uses the trait default: per-(key,attribute)-state
  // compaction, tombstone scan with deleteWildcard pushdown, and the
  // scalar fast path when the binder declared the family wildcard-free
  // (see AttributeLogFamily.batchSnapshot)

  /** The file streaming source refuses a missing directory, but a freshly
    * deployed family legitimately has no writes yet (an ingest server
    * starts its transformation observers BEFORE the first element
    * arrives) — materialize the empty log directory so subscribing to a
    * virgin commit log works like subscribing to an empty topic.
    */
  private def ensureDir(): Unit = {
    val p = new org.apache.hadoop.fs.Path(path)
    // resolve the filesystem from the PATH's scheme, not the default FS —
    // an s3a:// family on an hdfs-default cluster must not throw Wrong FS
    val fs = org.apache.hadoop.fs.FileSystem.get(p.toUri,
      spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) fs.mkdirs(p)
  }

  /** Streaming subscription replaying from the oldest retained element
    * (commit-log access, position=OLDEST).
    */
  override def streamFromOldest(): Dataset[StreamElement] = {
    ensureDir()
    spark.readStream.schema(encoder.schema).parquet(path).as[StreamElement]
  }

  /** Throughput-limited streaming subscription: at most `maxFilesPerTrigger`
    * log segments per micro-batch — the reference's ThroughputLimiter knob
    * mapped to the file source's native backpressure option
    * (ThroughputLimiter.java:27; see [[Throughput]] for the direct-path
    * token bucket).
    */
  def streamFromOldestThrottled(maxFilesPerTrigger: Int): Dataset[StreamElement] = {
    ensureDir()
    spark.readStream.schema(encoder.schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(path).as[StreamElement]
  }

  /** Streaming subscription; file sources always replay retained history, so
    * "from now" is approximated by a stamp filter at query start (the Kafka
    * binding would use startingOffsets=latest).
    */
  def stream(fromStamp: Long): Dataset[StreamElement] =
    streamFromOldest().filter(col("stamp") >= fromStamp).as[StreamElement]

  /** Attach a watermark for event-time windowed consumption: bounded
    * out-of-orderness, the reference's default estimator
    * (BoundedOutOfOrdernessWatermarkEstimator.java:38). Returns the
    * element columns PLUS the watermark-annotated `eventTime` column —
    * group on THAT column (`window(col("eventTime"), ...)`); dropping it
    * would discard the only column carrying the watermark metadata and
    * fail any downstream append-mode aggregation's analysis.
    */
  def streamWithWatermark(maxOutOfOrdernessMs: Long,
      stampUnit: String = "micros"): org.apache.spark.sql.DataFrame = {
    val ts = stampUnit match {
      case "micros" => timestamp_micros(col("stamp"))
      case "millis" => timestamp_millis(col("stamp"))
      case u        => throw new IllegalArgumentException(u)
    }
    streamFromOldest()
      .withColumn("eventTime", ts)
      .withWatermark("eventTime", s"$maxOutOfOrdernessMs milliseconds")
  }

  /** Exactly-once-ish sink: idempotent-by-uuid append ([[appendIdempotent]],
    * inherited — the anti-join rides this family's stamp-range pushdown)
    * via foreachBatch
    * (reference BufferUntilCheckpoint + commit callbacks collapse to
    * checkpointed idempotent writes on Spark; BufferUntilCheckpoint.java:37).
    */
  def sink(stream: Dataset[StreamElement], checkpoint: String): DataStreamWriter[StreamElement] =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[StreamElement], _: Long) =>
        appendIdempotent(batch)
      }
}
