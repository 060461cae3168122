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
  *
  * Memory bound (reference TimeBoundedVersionedCache.java): each cell
  * keeps at most `maxVersions` versions and only versions within
  * `keepDurationMs` of the newest stamp seen — older versions (and cells
  * whose every version aged out or is a tombstone) are evicted, so the
  * cache cannot grow without bound under churn. Defaults keep one
  * version forever (the plain latest-value cache).
  */
final class CachedView(family: AttributeLogFamily,
    maxVersions: Int = 1,
    keepDurationMs: Long = Long.MaxValue,
    stampUnit: String = "millis") {

  require(maxVersions >= 1, "maxVersions must be >= 1")
  // keepDurationMs is WALL-CLOCK milliseconds; stamps may be on a
  // different clock (this repo's events-derived changelogs stamp in
  // MICROS — pass stampUnit="micros" there, or a 1h keep becomes 3.6
  // real seconds). The conversion happens once, here.
  private val keepDurationStamps: Long = {
    val mul = StateOps.stampDivisor(stampUnit) // one shared unit whitelist
    if (keepDurationMs == Long.MaxValue ||
        keepDurationMs > Long.MaxValue / mul) Long.MaxValue
    else keepDurationMs * mul
  }

  // versions newest-first by (stamp, seqId, uuid); tombstones are versions
  // too so as-of reads below a delete stay correct until they age out
  private val cache = TrieMap.empty[(String, String), List[StreamElement]]
  @volatile private var maxStampSeen: Long = Long.MinValue
  private var query: Option[StreamingQuery] = None
  private var lastCheckpoint: Option[String] = None
  // the predicate's canonical Column text: equality means "same range"
  // (identically-constructed predicates — the assignPartitions path —
  // print identically); an equivalent-but-differently-written predicate
  // conservatively reads as a range CHANGE, which forces the safe
  // rebuild rather than a wrong resume
  private var lastPredicate: Option[String] = None

  private def pos(e: StreamElement) = e.position

  private def evictionFloor: Long =
    if (keepDurationStamps == Long.MaxValue || maxStampSeen == Long.MinValue)
      Long.MinValue
    else maxStampSeen - keepDurationStamps

  private def fold(e: StreamElement): Unit = {
    if (e.stamp > maxStampSeen) maxStampSeen = e.stamp
    val k = (e.key, e.attribute)
    val floor = evictionFloor
    // distinctBy position: an element delivered twice (foreachBatch
    // at-least-once replay after a crash between fold and checkpoint
    // commit) must not occupy two version slots and evict a genuine
    // older version
    val merged = (e :: cache.getOrElse(k, Nil))
      .sortBy(pos)(Ordering.Tuple3[Long, Long, String].reverse)
      .distinctBy(pos)
      .take(maxVersions)
      .filter(v => v.stamp >= floor || v == e)
    // a cell retaining ONLY tombstones serves no read — the latest is
    // filtered as a delete and an as-of below the oldest tombstone has
    // no value version to return — so drop it entirely (at any
    // maxVersions; keeping [tomb, tomb] would pin deleted keys forever
    // under the default infinite keepDuration)
    if (merged.isEmpty || merged.forall(_.isDelete))
      cache.remove(k)
    else cache.put(k, merged)
  }

  /** Drop versions that aged past the keep duration; cells left with only
    * tombstones (or nothing) are removed. Called after each batch (with a
    * sweep-cadence guard) and callable directly for tests/maintenance.
    */
  def evictAged(): Unit = {
    val floor = evictionFloor
    if (floor != Long.MinValue) {
      cache.foreach { case (k, versions) =>
        val kept = versions.filter(_.stamp >= floor)
        if (kept.isEmpty || kept.forall(_.isDelete)) cache.remove(k)
        else if (kept.size != versions.size) cache.put(k, kept)
      }
      lastSweptFloor = floor
    }
  }

  /** Per-batch sweep with a cadence guard: the full-cache scan runs only
    * once the floor advanced an eighth of the keep window past the last
    * sweep — [[fold]] already enforces the floor on every touched cell,
    * so the guard only delays reclaiming UNTOUCHED cells (bounded by
    * keep/8 extra retention) while saving an O(total cells) scan per
    * micro-batch on large views with small batches.
    */
  private var lastSweptFloor: Long = Long.MinValue
  private def evictAgedIfDue(): Unit = {
    val floor = evictionFloor
    if (floor != Long.MinValue &&
        (lastSweptFloor == Long.MinValue ||
          floor - lastSweptFloor >= math.max(1L, keepDurationStamps / 8)))
      evictAged()
  }

  /** Start continuous maintenance over the WHOLE family
    * (CachedView.assign with every partition).
    */
  def assign(checkpoint: String): CachedView =
    assign(checkpoint, org.apache.spark.sql.functions.lit(true))

  /** Partition-scoped maintenance: only elements matching `keyPredicate`
    * are maintained — the filter sits UPSTREAM of the stateful snapshot
    * operator and the driver-side collect, so a process materializes (and
    * keeps streaming state for) exactly its assigned key range. This is
    * what makes the per-process cache viable at cluster scale: N
    * consumers each assign a disjoint range and no JVM holds the full
    * keyspace (reference LocalCachedPartitionedView.assign:126 — the view
    * caches only the partitions handed to it).
    */
  def assign(checkpoint: String,
      keyPredicate: org.apache.spark.sql.Column): CachedView = synchronized {
    // RE-assigning a DIFFERENT key range is a rebuild, not a resume: the
    // same checkpoint would restart from its committed offsets and never
    // fold the NEW range's history, while the old range's cells would
    // serve stale forever (the reference re-reads on assign,
    // LocalCachedPartitionedView.assign:126). Same-range re-assign keeps
    // the resume contract (cache continuity, no double-fold —
    // StreamingRecoverySpec pins it).
    val predExpr = keyPredicate.toString
    val rangeChanged = lastPredicate.exists(_ != predExpr)
    if (rangeChanged) {
      require(!lastCheckpoint.contains(checkpoint),
        "re-assigning a different key range on the SAME checkpoint would " +
          "resume past the new range's history — pass a fresh checkpoint " +
          "(the view re-reads the log from oldest and rebuilds)")
      cache.clear()
      maxStampSeen = Long.MinValue
      lastSweptFloor = Long.MinValue
    }
    // a COLD view (this instance never assigned) resuming a checkpoint
    // that already has committed offsets would pair an EMPTY cache with
    // a query that skips the committed history — an incomplete view
    // with no error anywhere. Cross-process restart = fresh checkpoint:
    // the log is the source of truth and the fold is deterministic.
    if (lastPredicate.isEmpty) {
      val p = new org.apache.hadoop.fs.Path(checkpoint, "offsets")
      val fs = p.getFileSystem(family.spark.sparkContext.hadoopConfiguration)
      if (fs.exists(p) && fs.listStatus(p).nonEmpty)
        throw new IllegalStateException(
          "cold view cannot resume an existing checkpoint at " +
            s"$checkpoint: its cache is empty and the resumed query " +
            "skips the already-committed history — start from a FRESH " +
            "checkpoint to re-fold the log from oldest")
    }
    // the local cache ages cells out at keepDurationMs (evictAged), so the
    // UPSTREAM snapshot state ages out in lockstep: idle keys are evicted
    // from the flatMapGroupsWithState store on the same horizon, keeping
    // the maintenance query's state bounded by keys active within the keep
    // window instead of every key ever seen. Both sides interpret stamps
    // through the SAME `stampUnit`; a stale re-emit after an upstream
    // eviction is harmless because fold() ranks versions by
    // (stamp, seqId, uuid) and the local evictAged drops it anyway.
    val cleanup =
      if (keepDurationMs == Long.MaxValue) None
      else Some(scala.concurrent.duration.Duration(keepDurationMs,
        java.util.concurrent.TimeUnit.MILLISECONDS))
    val updates = StateOps.snapshotUpdates(
      family.streamFromOldest().filter(keyPredicate),
      cleanup = cleanup, stampUnit = stampUnit)
    // a RE-assign must not orphan the previous maintenance query: stop
    // it first, or two queries fold into one cache forever (the old one
    // maintaining ranges this process no longer owns, unstoppable once
    // its handle is overwritten)
    query.foreach(_.stop())
    val q = StreamConf.scoped(updates) { ds =>
      ds.writeStream
        .outputMode("update")
        .option("checkpointLocation", checkpoint)
        .foreachBatch { (batch: Dataset[StreamElement], _: Long) =>
          batch.collect().foreach(fold)
          evictAgedIfDue()
        }
        .start()
    }
    query = Some(q)
    lastCheckpoint = Some(checkpoint)
    lastPredicate = Some(predExpr)
    this
  }

  /** Reference-shaped partition assignment: keys hash into
    * `numPartitions` buckets; this process maintains only `partitions`.
    */
  def assignPartitions(checkpoint: String, partitions: Set[Int],
      numPartitions: Int): CachedView = {
    require(partitions.nonEmpty && partitions.forall(p => p >= 0 && p < numPartitions),
      s"partitions must be within [0, $numPartitions)")
    import org.apache.spark.sql.functions._
    assign(checkpoint,
      pmod(hash(col("key")), lit(numPartitions)).isin(partitions.toSeq: _*))
  }

  /** Block until all currently-available log entries are reflected. */
  def processAllAvailable(): Unit = query.foreach(_.processAllAvailable())

  /** Point lookup of the latest value (RandomAccessReader.get:121). */
  def get(key: String, attribute: String): Option[StreamElement] =
    cache.get((key, attribute)).flatMap(_.headOption).filterNot(_.isDelete)

  /** As-of lookup over retained versions (TimeBoundedVersionedCache.get). */
  def get(key: String, attribute: String, stamp: Long): Option[StreamElement] =
    cache.get((key, attribute))
      .flatMap(_.find(_.stamp <= stamp))
      .filterNot(_.isDelete)

  /** Retained versions of a cell, newest first (for inspection/tests). */
  def versions(key: String, attribute: String): Seq[StreamElement] =
    cache.getOrElse((key, attribute), Nil)

  /** List wildcard suffix values for a key (scanWildcard:260). */
  def scanWildcard(key: String, wildcardPrefix: String,
      limit: Int = Int.MaxValue): Seq[StreamElement] =
    cache.iterator
      .filter { case ((k, a), _) => k == key && a.startsWith(wildcardPrefix) }
      .flatMap(_._2.headOption).filterNot(_.isDelete)
      .toSeq.sortBy(_.attribute).take(limit)

  /** All attributes of a key (scanWildcardAll:207). */
  def scanWildcardAll(key: String): Seq[StreamElement] =
    cache.iterator.filter(_._1._1 == key)
      .flatMap(_._2.headOption).filterNot(_.isDelete)
      .toSeq.sortBy(_.attribute)

  /** Latest non-tombstone version of every cached cell — the full
    * materialized snapshot this view serves (inspection/oracle surface;
    * a production consumer reads it cell-wise via [[get]]/[[scanWildcard]]).
    */
  def snapshotContents: Seq[StreamElement] =
    cache.iterator.flatMap(_._2.headOption).filterNot(_.isDelete).toSeq

  /** Paged key listing (listEntities:325). */
  def listEntities(offset: Int, limit: Int): Seq[String] =
    cache.iterator
      .filter(_._2.headOption.exists(!_.isDelete))
      .map(_._1._1).toSeq.distinct.sorted.slice(offset, offset + limit)

  /** Write-through (CachedView is read-write, write:402): append to the
    * log; the maintenance query folds it back into the cache.
    */
  def write(element: StreamElement): Unit = family.append(Seq(element))

  def stop(): Unit = synchronized { query.foreach(_.stop()); query = None }
}
