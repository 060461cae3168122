package graft.core

import java.util.concurrent.atomic.AtomicLong

import graft.streaming.CommitLogFamily

/** Serialized optimistic transactions over a commit-log family — the
  * reference's transaction support reduced to its observable contract
  * (reference: core/.../repository/TransactionMode.java:19-53 modes
  * NONE/ATTRIBUTE/KEY/ALL; coordinator
  * direct/transaction-manager/.../TransactionLogObserver.java:81 — assigns
  * sequential ids, validates reads against concurrent commits, aborts on
  * conflict; writer TransactionalOnlineAttributeWriter.java).
  *
  * Model: a transaction snapshots the positions of the (key, attribute)
  * cells it reads; commit validates those cells are unchanged, assigns one
  * sequential id to every write, and appends them in a single atomic
  * parquet commit. Commits are serialized per coordinator (the reference
  * serializes through a single transaction-manager observer per scope);
  * conflicting transactions get [[TransactionRejectedException]].
  */
final class TransactionCoordinator(family: CommitLogFamily) {

  final class TransactionRejectedException(msg: String)
      extends RuntimeException(msg)

  private val lastSeq = new AtomicLong({
    // one distributed max over the log — constant driver memory at any
    // family size (a full collect here would OOM the driver at 100 TB)
    import org.apache.spark.sql.functions.{coalesce, lit, max}
    family.batchUpdates().toDF()
      .agg(coalesce(max(org.apache.spark.sql.functions.col("seqId")), lit(0L)))
      .head().getLong(0)
  })

  /** Open transaction holding read positions and buffered writes. */
  final class Transaction private[TransactionCoordinator] () {
    private[TransactionCoordinator] val reads =
      collection.mutable.Map.empty[(String, String), Long] // cell -> seqId seen
    private val writes = collection.mutable.ArrayBuffer.empty[StreamElement]

    /** Transactional read: latest value of a cell, recording its position
      * for commit-time validation.
      */
    def get(key: String, attribute: String): Option[StreamElement] = {
      val cur = new graft.randomaccess.RandomAccessReader(family)
        .get(key, attribute)
      reads((key, attribute)) = cur.map(_.seqId).getOrElse(0L)
      cur
    }

    def update(e: StreamElement): Unit = writes += e

    /** Validate + atomically append (TransactionLogObserver commit path). */
    def commit(): Long = TransactionCoordinator.this.synchronized {
      val ra = new graft.randomaccess.RandomAccessReader(family)
      reads.foreach { case ((k, a), seenSeq) =>
        val nowSeq = ra.get(k, a).map(_.seqId).getOrElse(0L)
        if (nowSeq != seenSeq)
          throw new TransactionRejectedException(
            s"Conflict on ($k, $a): read seq $seenSeq, now $nowSeq")
      }
      val seq = lastSeq.incrementAndGet()
      if (writes.nonEmpty)
        family.append(writes.map(_.copy(seqId = seq)).toSeq)
      seq
    }
  }

  def begin(): Transaction = new Transaction()
}
