package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}

import graft.core.StreamElement

/** Storage-agnostic attribute family surface — the seam every storage
  * binding implements so the routing layer (GraftOperator), random access,
  * cached views, transactions and transformations are storage-neutral
  * (reference: storage descriptors under direct/io-*, all plugging into
  * the same DataAccessor contract, direct/core/.../DataAccessor.java).
  *
  *  - commit-log    → [[streamFromOldest]]
  *  - batch-updates → [[batchUpdates]] with stamp-range pushdown
  *  - batch-snapshot→ [[batchSnapshot]] compacted read
  *  - writes        → [[append]]
  */
trait AttributeLogFamily {
  def spark: SparkSession

  def append(elems: Dataset[StreamElement]): Unit

  def append(elems: Seq[StreamElement]): Unit = {
    graft.core.Metrics.inc("graft.elements.appended", elems.size.toLong)
    append(spark.createDataset(elems)(StreamElement.encoder))
  }

  /** Full update history, optional stamp range [from, until). */
  def batchUpdates(from: Long = Long.MinValue,
      until: Long = Long.MaxValue): Dataset[StreamElement]

  /** Declared-attribute hint set by the binder
    * ([[graft.core.GraftOperator.family]]): true when every attribute
    * this family can ever hold resolves to a SCALAR declaration, so no
    * deleteWildcard tombstone is possible and [[batchSnapshot]] may skip
    * the tombstone branch. Declaration-time-only mutation; families
    * bound outside the repository keep the safe `false`.
    */
  final def wildcardFree: Boolean = _wildcardFree
  private[this] var _wildcardFree = false
  final def declareWildcardFree(): this.type = { _wildcardFree = true; this }

  /** Compacted snapshot: latest-with-tombstones reduce of the updates
    * when the storage has no dedicated snapshot form.
    *
    * DEFAULT = the per-cell plan ([[graft.operators.SnapshotCompact]]):
    * typed per-(key,attribute) reduce + a tombstone join, whose shuffle
    * rows and aggregation state are per CELL. The one-shuffle typed
    * aggregator ([[graft.operators.LatestWithTombstones]]) buffers ALL
    * live suffixes of one (key, wildcard-prefix) in a single in-memory
    * map — a key with millions of live `event.*` suffixes concentrates
    * in one task's buffer. Skew-safety wins as the default; callers
    * with narrow prefixes can still reach for the one-pass aggregator
    * explicitly. A family PROVABLY wildcard-free (declared scalar
    * attributes only — see [[wildcardFree]]) drops the tombstone branch
    * entirely: latest-per-cell minus deletes, one shuffle, no join.
    */
  def batchSnapshot(asOf: Long = Long.MaxValue): Dataset[StreamElement] =
    if (wildcardFree)
      graft.operators.SnapshotCompact.snapshotScalar(batchUpdates(), asOf)
    else
      graft.operators.SnapshotCompact.snapshot(batchUpdates(), asOf)

  /** Streaming subscription replaying from the oldest retained element. */
  def streamFromOldest(): Dataset[StreamElement]

  /** Idempotent-by-uuid append: drops elements whose uuid already exists
    * in the family within the batch's stamp range before appending, so a
    * replayed micro-batch (restart between write and checkpoint commit)
    * does not duplicate rows. The anti-join is bounded to the batch's
    * [min, max] stamps — at 100 TB the dedup scan touches only what the
    * stamp-range pushdown selects, not the whole family (uuid is the
    * reference's per-write identity, StreamElement.java:44).
    */
  def appendIdempotent(batch: Dataset[StreamElement]): Unit = {
    import org.apache.spark.sql.functions.{col, max, min}
    // a caller-pinned batch keeps ITS cache (a second persist is a no-op
    // whose unpersist would silently evict the caller's entry — the
    // Lineage.cut rule); only pin/release when this call created the pin.
    // Lets a caller replaying one derived changelog through several
    // appends pay its derivation once.
    val callerPinned =
      batch.storageLevel != org.apache.spark.storage.StorageLevel.NONE
    val b = if (callerPinned) batch else batch.persist()
    try {
      val mm = b.toDF().agg(min(col("stamp")), max(col("stamp"))).head()
      if (!mm.isNullAt(0)) {
        val existing = batchUpdates(mm.getLong(0), mm.getLong(1) + 1)
          .toDF().select(col("uuid"))
        val fresh = b.join(existing, Seq("uuid"), "left_anti")
          .as[StreamElement](StreamElement.encoder)
        append(fresh)
      }
    } finally { if (!callerPinned) { b.unpersist(); () } }
  }

  /** Storage-identity token for transaction-commit serialization: all
    * coordinators over the same underlying STORAGE (not the same family
    * instance) must produce the same token, so their commits share one
    * in-JVM monitor in [[graft.core.CommitArbiter]]. The default is
    * per-instance — bindings override with their storage's identity.
    */
  def commitLockToken: String = s"family:${System.identityHashCode(this)}"

  /** Location for the cross-process commit lock (atomic-create marker
    * file) on storages a second JVM can reach; None for in-process
    * embedded stores, whose commits can only ever race within one JVM.
    */
  def commitLockPath: Option[String] = None
}

object AttributeLogFamily {

  /** A read-only batch family over an existing changelog Dataset — the
    * adapter that lets derived views (a table re-encoded as a changelog,
    * a proxy read target) flow through every family-typed surface
    * (random access, proxies, snapshots) without a storage round-trip.
    */
  def batchView(ds: Dataset[StreamElement]): AttributeLogFamily =
    new AttributeLogFamily {
      import org.apache.spark.sql.functions.col
      override def spark: SparkSession = ds.sparkSession
      override def append(elems: Dataset[StreamElement]): Unit =
        throw new UnsupportedOperationException("read-only changelog view")
      override def batchUpdates(from: Long, until: Long): Dataset[StreamElement] = {
        var df = ds.toDF()
        if (from != Long.MinValue) df = df.filter(col("stamp") >= from)
        if (until != Long.MaxValue) df = df.filter(col("stamp") < until)
        df.as[StreamElement](StreamElement.encoder)
      }
      override def streamFromOldest(): Dataset[StreamElement] =
        throw new UnsupportedOperationException("batch view")
    }
}
