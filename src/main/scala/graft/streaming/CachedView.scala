package graft.streaming

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.StreamingQuery

import graft.core.StreamElement

/** Locally-materialized, continuously-maintained compacted view of a
  * commit log — read-write random access over the latest snapshot
  * (reference: direct/core/.../view/CachedView.java:43, impl
  * LocalCachedPartitionedView.java:59 — assign:126, get:267,
  * scanWildcard:298, write:402).
  *
  * Maintenance: [[StateOps.snapshotUpdates]] turns the changelog into an
  * upsert/evict stream; `foreachBatch` folds it into an in-process map.
  * Like the reference's view (a per-process cache of assigned partitions),
  * this is a LOCAL cache: at cluster scale each consumer materializes the
  * key range it is assigned, or reads the state store directly — the
  * maintenance query itself is fully distributed.
  */
final class CachedView(family: CommitLogFamily) {

  private val cache = TrieMap.empty[(String, String), StreamElement]
  private var query: Option[StreamingQuery] = None

  /** Start continuous maintenance (CachedView.assign). */
  def assign(checkpoint: String): CachedView = synchronized {
    val updates = StateOps.snapshotUpdates(family.streamFromOldest())
    val q = updates.writeStream
      .outputMode("update")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[StreamElement], _: Long) =>
        batch.collect().foreach { e =>
          if (e.isDelete) cache.remove((e.key, e.attribute))
          else cache.put((e.key, e.attribute), e)
        }
      }
      .start()
    query = Some(q)
    this
  }

  /** Block until all currently-available log entries are reflected. */
  def processAllAvailable(): Unit = query.foreach(_.processAllAvailable())

  /** Point lookup of the latest value (RandomAccessReader.get:121). */
  def get(key: String, attribute: String): Option[StreamElement] =
    cache.get((key, attribute))

  /** List wildcard suffix values for a key (scanWildcard:260). */
  def scanWildcard(key: String, wildcardPrefix: String,
      limit: Int = Int.MaxValue): Seq[StreamElement] =
    cache.iterator
      .filter { case ((k, a), _) => k == key && a.startsWith(wildcardPrefix) }
      .map(_._2).toSeq.sortBy(_.attribute).take(limit)

  /** All attributes of a key (scanWildcardAll:207). */
  def scanWildcardAll(key: String): Seq[StreamElement] =
    cache.iterator.filter(_._1._1 == key).map(_._2).toSeq.sortBy(_.attribute)

  /** Paged key listing (listEntities:325). */
  def listEntities(offset: Int, limit: Int): Seq[String] =
    cache.keysIterator.map(_._1).toSeq.distinct.sorted.slice(offset, offset + limit)

  /** Write-through (CachedView is read-write, write:402): append to the
    * log; the maintenance query folds it back into the cache.
    */
  def write(element: StreamElement): Unit = family.append(Seq(element))

  def stop(): Unit = synchronized { query.foreach(_.stop()); query = None }
}
