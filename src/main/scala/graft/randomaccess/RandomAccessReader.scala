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
object RandomAccessReader {
  /** Session conf: hard cap on rows an UNPAGED scan collects to the
    * driver. A careless 100 TB caller pointing [[RandomAccessReader.scanWildcardAll]]
    * (or the shell's `list`) at a hot key with millions of live wildcard
    * suffixes would otherwise OOM the driver; the reference pages every
    * scan through offset/limit (RandomAccessReader.java:260). Hitting
    * the cap truncates LOUDLY: a WARN log, a
    * `graft.randomaccess.truncated` metric tick, and (in the shell) a
    * visible truncation line — never a silent partial answer.
    */
  val MaxScanRowsKey = "spark.graft.randomaccess.maxScanRows"
  val DefaultMaxScanRows = 100000

  def maxScanRows(spark: org.apache.spark.sql.SparkSession): Int =
    spark.conf.get(MaxScanRowsKey, DefaultMaxScanRows.toString).toInt

  private val log = org.slf4j.LoggerFactory.getLogger(classOf[RandomAccessReader])
}

final class RandomAccessReader(family: AttributeLogFamily) {

  private def compactFor(pred: org.apache.spark.sql.Column,
      asOf: Long = Long.MaxValue): Dataset[StreamElement] = {
    graft.core.Metrics.inc("graft.randomaccess.lookups")
    SnapshotCompact.snapshot(family.batchUpdates().filter(pred), asOf)
  }

  /** Collect at most the session cap (+1 probe row to detect overflow);
    * on overflow, warn + tick the truncation metric and return exactly
    * `cap` rows. The LIMIT rides the plan, so the overflowing tail is
    * never shipped to the driver at all.
    */
  private def collectCapped(ds: Dataset[StreamElement],
      what: String): Seq[StreamElement] = {
    val cap = math.min(RandomAccessReader.maxScanRows(family.spark),
      Int.MaxValue - 1)
    val rows = ds.limit(cap + 1).collect()
    if (rows.length > cap) {
      graft.core.Metrics.inc("graft.randomaccess.truncated")
      RandomAccessReader.log.warn(
        "TRUNCATED {}: more than {} rows; returning the first {} -- page " +
          "with offset/limit or raise {}",
        what, cap.toString, cap.toString, RandomAccessReader.MaxScanRowsKey)
      rows.take(cap).toSeq
    } else rows.toSeq
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
    val page = compactFor(col("key") === key && pred)
      .filter(col("attribute").startsWith(wildcardPrefix))
      .orderBy(col("attribute"))
    if (limit != Int.MaxValue)
      // caller-paged: offset/limit ride the PLAN (the reference pages
      // storage-side, scanWildcard:260) — the driver receives one page,
      // not the whole suffix set sliced after a full collect
      page.offset(offset).limit(limit).collect().toSeq
    else
      collectCapped(if (offset == 0) page else page.offset(offset),
        s"scanWildcard($key, $wildcardPrefix)")
  }

  /** All attributes of a key (scanWildcardAll:207), capped at the
    * session's [[RandomAccessReader.MaxScanRowsKey]] with loud truncation.
    */
  def scanWildcardAll(key: String, stamp: Long = Long.MaxValue): Seq[StreamElement] = {
    if (stamp != Long.MaxValue && bucketed.isDefined)
      throw new UnsupportedOperationException(
        "stamped scan over a bucketed store holds only latest state; " +
          "serve time travel from a batch-updates family")
    collectCapped(
      compactFor(col("key") === key, stamp).orderBy(col("attribute")),
      s"scanWildcardAll($key)")
  }

  /** Paged key listing (listEntities:325). */
  def listEntities(offset: Int, limit: Int): Seq[String] =
    family.batchUpdates().select(col("key")).distinct()
      .orderBy(col("key")).offset(offset).limit(limit)
      .as[String](org.apache.spark.sql.Encoders.STRING).collect().toSeq
}
