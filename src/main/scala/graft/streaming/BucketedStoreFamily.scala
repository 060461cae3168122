package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions.col

import graft.core.StreamElement
import graft.randomaccess.BucketedSnapshotStore

/** Random-access family binding backed by [[BucketedSnapshotStore]] —
  * declare `storage: "bucketed://file:///x?buckets=256"` with
  * `access: [ random-access, batch-snapshot ]` and reads route to the
  * bucket-pruned pre-compacted layout transparently (the reference's
  * Cassandra/HBase random-access families play this role; the store's
  * semantics match them: latest-per-cell retained, not full history).
  *
  * Semantics per access pattern:
  *  - `append` folds the batch into the store ([[BucketedSnapshotStore
  *    .refresh]] — order-insensitive, late-data safe, rewrites only
  *    touched buckets);
  *  - `batchSnapshot` IS the store (tombstones hidden) — no compaction
  *    job at read time;
  *  - `batchUpdates` returns the retained contents (latest per cell +
  *    live tombstones): this family stores STATE, not history — replay
  *    semantics live in commit-log families, exactly as in the
  *    reference's access-flag model;
  *  - `streamFromOldest` is refused for the same reason (declare the
  *    access flag on a commit-log family instead);
  *  - [[graft.randomaccess.RandomAccessReader]] detects this family and
  *    serves `get`/`multiFetch` from the store's bucket-pruned path.
  */
final class BucketedStoreFamily(val spark: SparkSession, path: String,
    buckets: Int = 256) extends AttributeLogFamily {

  val store = new BucketedSnapshotStore(spark, path, buckets)

  def append(elems: Dataset[StreamElement]): Unit =
    graft.core.CommitArbiter.withCommitLock(this) {
      store.refresh(elems)
    }

  override def commitLockToken: String = s"bucketed:${store.path}"

  /** Cross-process arbitration marker (the CommitLogFamily pattern) —
    * two JVMs racing the non-atomic bucket swap must serialize.
    */
  override def commitLockPath: Option[String] =
    Some(s"${store.path}/_commit.lock")

  def batchUpdates(from: Long = Long.MinValue,
      until: Long = Long.MaxValue): Dataset[StreamElement] = {
    var ds = store.contents()
    if (from != Long.MinValue) ds = ds.filter(col("stamp") >= from)
    if (until != Long.MaxValue) ds = ds.filter(col("stamp") < until)
    ds
  }

  override def batchSnapshot(asOf: Long = Long.MaxValue): Dataset[StreamElement] =
    if (asOf == Long.MaxValue) store.snapshot()
    else throw new UnsupportedOperationException(
      "bucketed:// stores only the LATEST element per cell — an as-of " +
        "snapshot over it would silently miss overwritten history; serve " +
        "time travel from a batch-updates family")

  def streamFromOldest(): Dataset[StreamElement] =
    throw new UnsupportedOperationException(
      "bucketed:// stores state, not history — serve commit-log access " +
        "from a commit-log family (reference access-flag model)")
}
