package graft.randomaccess

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.functions._

import graft.core.StreamElement
import graft.operators.SnapshotCompact
import graft.streaming.AttributeLogFamily

/** Batch random-access surface over a commit-log family — the reference's
  * point-lookup API (reference: direct/core/.../randomaccess/
  * RandomAccessReader.java:42 — get:121, multiFetch:181, scanWildcard:260,
  * scanWildcardAll:207, listEntities:325).
  *
  * Every lookup pushes its key/prefix predicate BELOW the compaction: the
  * parquet scan prunes row groups on `key` before any aggregation, so a
  * point lookup touches O(matching row groups), not the whole family — the
  * Spark analog of the reference's storage-side key lookup.
  */
final class RandomAccessReader(family: AttributeLogFamily) {

  private def compactFor(pred: org.apache.spark.sql.Column,
      asOf: Long = Long.MaxValue): Dataset[StreamElement] = {
    graft.core.Metrics.inc("graft.randomaccess.lookups")
    SnapshotCompact.snapshot(family.batchUpdates().filter(pred), asOf)
  }

  /** Wildcard-delete tombstones are stored as `prefix.*` rows, so a lookup
    * predicate on the exact attribute must ALSO admit the covering tombstone
    * or the compaction never sees it and returns a stale value
    * (reference RandomAccessReader honors wildcard deletes on point reads;
    * GroovyEnvTest.testWildcardDelete:286).
    */
  private def attributeOrTombstone(attribute: String): org.apache.spark.sql.Column = {
    val i = attribute.indexOf('.')
    val exact = col("attribute") === attribute
    if (i < 0) exact
    else exact ||
      (col("deleteWildcard") &&
        col("attribute") === attribute.substring(0, i + 1) + "*")
  }

  /** A bucketed store family serves point reads from its pre-compacted
    * bucket-pruned layout — no per-lookup compaction (the access-path
    * routing the reference does per family type).
    */
  private def bucketed: Option[graft.randomaccess.BucketedSnapshotStore] =
    family match {
      case b: graft.streaming.BucketedStoreFamily => Some(b.store)
      case _ => None
    }

  /** Latest value at-or-before `stamp` (get:121). */
  def get(key: String, attribute: String,
      stamp: Long = Long.MaxValue): Option[StreamElement] =
    bucketed match {
      case Some(store) if stamp == Long.MaxValue =>
        graft.core.Metrics.inc("graft.randomaccess.lookups")
        store.get(key, attribute)
      case Some(_) =>
        // falling back to compactFor would SILENTLY answer from
        // latest-only state (overwritten history is gone) — refuse
        throw new UnsupportedOperationException(
          "stamped get over a bucketed store: the store holds only the " +
            "latest element per cell; serve time travel from a " +
            "batch-updates family")
      case None =>
        compactFor(col("key") === key && attributeOrTombstone(attribute), stamp)
          .filter(col("attribute") === attribute)
          .collect().headOption
    }

  /** Batched point lookups (multiFetch:181) — one scan, broadcast semi-join
    * on the key set.
    */
  def multiFetch(keys: Seq[String], attribute: String): Map[String, StreamElement] =
    bucketed match {
      case Some(store) =>
        graft.core.Metrics.inc("graft.randomaccess.lookups")
        store.multiFetch(keys, attribute)
      case None =>
        compactFor(col("key").isin(keys: _*) && attributeOrTombstone(attribute))
          .filter(col("attribute") === attribute)
          .collect().map(e => e.key -> e).toMap
    }

  /** Wildcard suffix listing with paging (scanWildcard:260). Admits covering
    * tombstones even when `wildcardPrefix` is deeper than the wildcard root
    * (e.g. prefix "device.ab" must still see the "device.*" tombstone).
    */
  def scanWildcard(key: String, wildcardPrefix: String, offset: Int = 0,
      limit: Int = Int.MaxValue): Seq[StreamElement] = {
    val i = wildcardPrefix.indexOf('.')
    val pred = col("attribute").startsWith(wildcardPrefix) ||
      (if (i < 0) lit(false)
       else col("deleteWildcard") &&
         col("attribute") === wildcardPrefix.substring(0, i + 1) + "*")
    compactFor(col("key") === key && pred)
      .filter(col("attribute").startsWith(wildcardPrefix))
      .orderBy(col("attribute"))
      .collect().toSeq.slice(offset,
        // Long-safe page end: offset + limit overflows Int for large
        // non-MaxValue limits (slice(offset, negative) returned an EMPTY
        // page for a key with live suffixes) — saturate instead
        math.min(offset.toLong + limit.toLong, Int.MaxValue.toLong).toInt)
  }

  /** All attributes of a key (scanWildcardAll:207). */
  def scanWildcardAll(key: String, stamp: Long = Long.MaxValue): Seq[StreamElement] = {
    if (stamp != Long.MaxValue && bucketed.isDefined)
      throw new UnsupportedOperationException(
        "stamped scan over a bucketed store holds only latest state; " +
          "serve time travel from a batch-updates family")
    compactFor(col("key") === key, stamp).orderBy(col("attribute")).collect().toSeq
  }

  /** Paged key listing (listEntities:325). */
  def listEntities(offset: Int, limit: Int): Seq[String] =
    family.batchUpdates().select(col("key")).distinct()
      .orderBy(col("key")).offset(offset).limit(limit)
      .as[String](org.apache.spark.sql.Encoders.STRING).collect().toSeq
}
