package graft.randomaccess

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.StreamElement
import graft.functions.Hash60
import graft.operators.LatestWithTombstones
import graft.sources.StoreManifest

/** Key-bucketed materialization of a compacted snapshot — the Spark-native
  * analog of the reference's random-access families (Cassandra/HBase in
  * the reference deployment: direct/io-cassandra, access=random-access):
  * a pre-compacted store whose physical layout serves point lookups.
  *
  * Layout: hive-partitioned by `kb = hash60(key) % buckets`, key-sorted
  * within each bucket, versioned by a [[graft.sources.StoreManifest]].
  * A `get(key)` then costs:
  *   - manifest-side pruning to ONE bucket's files (no directory
  *     listing — the lookup reads 1/buckets of the store, gated in
  *     BucketedSnapshotSpec via inputFiles),
  *   - row-group pruning on the sorted `key` column inside that bucket,
  *   - zero aggregation — the store IS the snapshot, so a lookup is a
  *     pure pruned scan, not a compaction (contrast
  *     [[RandomAccessReader]], which compacts the changelog per lookup).
  *
  * Every read resolves the manifest once: maintenance publishes a new
  * generation in one atomic rename, so a reader racing a [[refresh]]
  * sees either the complete old version or the complete new one —
  * replaced files outlive their manifest one retained generation, and a
  * reader staler than that fails LOUDLY (FileNotFound), never silently
  * short (the r13 in-place directory swap had a silent-miss window
  * between its two renames; ManifestStoreSpec pins the new contract).
  * A crashed mutation leaves the last published version serving and
  * some unreferenced garbage ([[StoreManifest.vacuum]]) — there is no
  * refusal state, so availability survives a dead maintainer.
  *
  * Maintenance: [[refresh]] folds a changelog delta by rewriting ONLY the
  * buckets whose keys the delta touches — at 256 buckets, a delta
  * touching 1% of the key space rewrites ~93% fewer bytes than a full
  * snapshot rewrite, and untouched buckets are never read. The store
  * RETAINS tombstones ([[LatestWithTombstones.compactRetaining]] — the
  * Kafka-log-compaction model), so refresh is an unconditional semigroup
  * fold: deltas may arrive in ANY order, late data included, and the
  * live view stays equal to full compaction of everything ever folded
  * in. [[expireTombstones]] reclaims tombstones once lateness is
  * bounded; [[replicate]] drives refresh from a Structured Streaming
  * changelog (the reference's commit-log → random-access replication).
  */
final class BucketedSnapshotStore(spark: SparkSession, val path: String,
    val buckets: Int = 256) {
  require(buckets > 0)

  private def bucketCol(key: Column): Column =
    pmod(Hash60.column(key), lit(buckets.toLong))

  /** Driver-side twin of [[bucketCol]] (same md5-based hash60). */
  def bucketOf(key: String): Long = {
    val h = Hash60.digest60(key.getBytes("UTF-8"))
    ((h % buckets) + buckets) % buckets
  }

  /** The shared manifest-store plumbing, bound to this store's layout. */
  private val store = StoreManifest.Handle(spark, path, "kb")

  /** Materialize a compacted snapshot as the store's full contents. */
  def write(snapshot: Dataset[StreamElement]): Unit = {
    snapshot.toDF()
      .withColumn("kb", bucketCol(col("key")))
      .repartition(col("kb"))
      .sortWithinPartitions(col("kb"), col("key"), col("attribute"))
      .write.partitionBy("kb").mode("overwrite")
      // forced static: dynamic partitionOverwriteMode would merge stale
      // buckets into a rebuild (see IvfStore.write)
      .option("partitionOverwriteMode", "static").parquet(path)
    store.publishInitial(readSchema)
    ()
  }

  private def asElements(df: DataFrame): Dataset[StreamElement] =
    df.drop("kb").as[StreamElement](StreamElement.encoder)

  /** Explicit read schema (element fields + the partition column): a
    * store whose every key was deleted is a legitimately EMPTY store,
    * and schema inference has nothing to infer there.
    */
  private val readSchema = org.apache.spark.sql.types.StructType(
    StreamElement.encoder.schema.fields :+
      org.apache.spark.sql.types.StructField("kb",
        org.apache.spark.sql.types.LongType))

  /** Current-version scan, optionally pruned to a bucket subset at the
    * manifest (file-list) layer. A store nothing was ever written to is
    * a legitimately empty store.
    */
  private def readDf(kbs: Option[Seq[Long]] = None): DataFrame =
    store.current() match {
      case None =>
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], readSchema)
      case Some(m) => store.scan(m, kbs)
    }

  /** The live snapshot view (all buckets, tombstones hidden). */
  def snapshot(): Dataset[StreamElement] =
    asElements(readDf().filter(!col("delete")))

  /** Raw store contents including retained tombstones. */
  def contents(): Dataset[StreamElement] = asElements(readDf())

  /** The bucket-pruned scan a point lookup performs — exposed for the
    * pruning gate in BucketedSnapshotSpec (files are selected from the
    * manifest; the spec asserts inputFiles ⊆ the key's bucket).
    */
  private[randomaccess] def lookupScan(key: String): DataFrame =
    readDf(Some(Seq(bucketOf(key))))

  /** Point lookup: bucket-pruned, aggregate-free scan. */
  def get(key: String, attribute: String): Option[StreamElement] =
    asElements(lookupScan(key)
        .filter(col("key") === key &&
          col("attribute") === attribute && !col("delete")))
      .collect().headOption

  /** Batched lookups: the key set prunes to its bucket set. */
  def multiFetch(keys: Seq[String], attribute: String): Map[String, StreamElement] = {
    val kbs = keys.map(bucketOf).distinct
    asElements(readDf(Some(kbs))
        .filter(col("key").isin(keys: _*) &&
          col("attribute") === attribute && !col("delete")))
      .collect().map(e => e.key -> e).toMap
  }

  /** All live attributes of a key (scanWildcardAll shape). */
  def scan(key: String): Seq[StreamElement] =
    asElements(readDf(Some(Seq(bucketOf(key))))
        .filter(col("key") === key && !col("delete")))
      .collect().sortBy(_.attribute).toSeq

  /** Fold a changelog delta into the store, rewriting only the buckets
    * the delta's keys touch. No ordering precondition: the store retains
    * tombstones, so the per-bucket re-compaction over (existing ∪ delta)
    * is a semigroup fold — late elements resolve exactly as they would
    * in a full compaction (SnapshotLaws property). Affected buckets are
    * replaced in one atomic manifest publish; untouched buckets are
    * never read or written. A refresh into a never-written store
    * bootstraps it (the replicate-to-fresh-path flow).
    */
  def refresh(delta: Dataset[StreamElement]): Unit = this.synchronized {
    val m = store.current().getOrElse(store.publishInitial(readSchema))
    val withKb = delta.toDF().withColumn("kb", bucketCol(col("key")))
    val affected = withKb.select("kb").distinct()
      .collect().map(_.getLong(0)).sorted.toSeq
    if (affected.isEmpty) return
    val existing = asElements(store.scan(m, Some(affected)))
    swapBuckets(m,
      LatestWithTombstones.compactRetaining(existing.unionByName(delta)),
      affected)
  }

  /** Reclaim tombstones older than `horizonUs` — call once lateness is
    * bounded (the horizon plays Kafka's delete.retention.ms / Cassandra's
    * gc_grace). Only buckets actually holding expired tombstones are
    * rewritten. After expiry, a delta element older than the horizon may
    * resurrect its cell — the documented log-compaction contract.
    */
  def expireTombstones(horizonUs: Long): Unit = this.synchronized {
    // a never-written store legitimately has nothing to expire — the
    // periodic-maintenance flow (expiry alongside replicate) may fire
    // before the first micro-batch ever lands
    val m = store.current().getOrElse(return)
    val expired = col("delete") && col("stamp") < horizonUs
    val affected = store.scan(m).filter(expired).select("kb").distinct()
      .collect().map(_.getLong(0)).sorted.toSeq
    if (affected.isEmpty) return
    swapBuckets(m,
      asElements(store.scan(m, Some(affected)).filter(!expired)),
      affected)
  }

  /** Maintain the store from a streaming changelog — the reference's
    * commit-log → random-access replication
    * (reference: ConfigRepository replication families; direct/core
    * commit-log observe feeding random-access writers). Each micro-batch
    * is one [[refresh]]; because refresh is order-insensitive, replay
    * after a checkpoint restart converges to the same store. Caller
    * `.start()`s the returned writer.
    */
  def replicate(stream: Dataset[StreamElement], checkpoint: String):
      org.apache.spark.sql.streaming.DataStreamWriter[StreamElement] =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .foreachBatch { (batch: Dataset[StreamElement], _: Long) =>
        refresh(batch)
      }

  /** Reclaim files no retained manifest references (crashed-mutation
    * garbage). Run from the (single) maintainer only.
    */
  def vacuum(): Seq[String] = store.vacuum()

  /** Replace the affected buckets' contents with `merged` in one atomic
    * manifest publish ([[StoreManifest.commitSwap]]): new files are
    * staged and moved in invisibly, the publish rename flips every
    * future reader to the new version, and the displaced files survive
    * one retained generation for readers mid-scan. Crash at any point
    * leaves the previous version serving.
    */
  private def swapBuckets(m: StoreManifest.Manifest,
      merged: Dataset[StreamElement], affected: Seq[Long]): Unit = {
    store.commitSwap(m,
      merged.toDF()
        .withColumn("kb", bucketCol(col("key")))
        .repartition(col("kb"))
        .sortWithinPartitions(col("kb"), col("key"), col("attribute")),
      affected)
    ()
  }
}
