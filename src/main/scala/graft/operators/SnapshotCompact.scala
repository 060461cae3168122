package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.core.StreamElement

/** Changelog → snapshot compaction: per (key, attribute) the latest element
  * wins, delete tombstones remove, and wildcard-delete tombstones remove
  * every suffix of a wildcard attribute written at-or-before the tombstone.
  *
  * This is THE stream-table-duality operator of the reference
  * (reference: beam/core/.../PCollectionTools.reduceAsSnapshot:42-66;
  * semantics docs/src/content/book/datamodel.md:120-149, wildcard deletes
  * datamodel.md:111-118 + StreamElement.java:145).
  *
  * Spark-first plan, two aggregations instead of an imperative per-key fold:
  *
  *  1. per (key, attribute): `max_by(element, (stamp, seqId, uuid))` — a
  *     partial-aggregable hash aggregate (map-side combine shrinks the
  *     shuffle to one row per live attribute, which is what makes this run
  *     at 100 TB: shuffle volume is O(distinct keys), not O(events));
  *  2. per (key, wildcardPrefix): max tombstone position among
  *     wildcard-deletes — a tiny aggregate of tombstones only — joined back
  *     on the same (key, prefix) hash partitioning.
  *
  * Survivors: latest element is not a delete AND is strictly newer than any
  * covering wildcard tombstone.
  */
object SnapshotCompact {

  /** Ordering position of an element in the changelog: stamp, then seqId,
    * then uuid as the deterministic tiebreak (reference orders replays by
    * stamp with sequential-id tiebreak, StreamElement.java:44).
    */
  private def pos(stamp: Column, seqId: Column, uuid: Column): Column =
    struct(stamp.as("stamp"), seqId.as("seqId"), uuid.as("uuid"))

  private val prefixCol: Column = {
    val a = col("attribute")
    val dot = instr(a, ".")
    when(dot > 0, concat(substring_index(a, ".", 1), lit("."))).otherwise(a)
  }

  /** Element-newness ordering shared with [[LatestWithTombstones]]:
    * (stamp, seqId, uuid) under Scala's tuple ordering. uuids are ASCII
    * here, where UTF-16 compareTo and SQL's UTF-8 binary collation agree
    * (SnapshotLaws pins the typed and relational plans against each
    * other, so a divergence would surface there).
    */
  private val posOrd = StreamElement.positionOrdering

  /** Snapshot at `asOf` (epoch micros/millis — same unit as `stamp`);
    * `Long.MaxValue` = current snapshot.
    *
    * Plan shape: the per-cell "latest wins" reduce is a TYPED
    * `reduceGroups` — state is ONE element per (key, attribute), and
    * Spark plans typed aggregates as ObjectHashAggregate (hash-based).
    * The declarative alternative, `max_by(struct(...))`, plans a
    * SortAggregate (struct aggregation buffers are not hash-mutable),
    * which sorts the full changelog on BOTH sides of the shuffle —
    * measured ~40% slower end-to-end on the wildcard-changelog bench.
    * The wildcard-tombstone table aggregates ONLY tombstone rows (the
    * `deleteWildcard` filter pushes into the scan) and joins back tiny —
    * AQE broadcasts it, so survivors never reshuffle. Per-cell state on
    * the big side + tombstones-only on the small side is what holds at
    * a 100k-live-suffix hot wildcard key; contrast
    * [[LatestWithTombstones]], whose one-shuffle aggregator buffers
    * every live suffix of a (key, prefix) in one task's map.
    */
  def snapshot(ds: Dataset[StreamElement], asOf: Long = Long.MaxValue): Dataset[StreamElement] = {
    import ds.sparkSession.implicits._
    implicit val se: org.apache.spark.sql.Encoder[StreamElement] =
      StreamElement.encoder

    // relational bound, not a typed lambda: col("stamp") <= asOf pushes
    // into the parquet scan (row-group pruning); a TypedFilter is an
    // object barrier Catalyst cannot push through, so a bounded
    // snapshot would deserialize the FULL post-horizon history
    val bounded =
      if (asOf == Long.MaxValue) ds
      else ds.toDF().filter(col("stamp") <= asOf).as[StreamElement]

    // 1. latest element per (key, attribute) — hash-aggregated typed
    //    reduce, one element of state per cell
    val latest = bounded
      .groupByKey(e => (e.key, e.attribute))
      .reduceGroups { (a: StreamElement, b: StreamElement) =>
        if (posOrd.gteq((a.stamp, a.seqId, a.uuid),
          (b.stamp, b.seqId, b.uuid))) a
        else b
      }
      .map(_._2)
      .toDF()
      .withColumn("_prefix", prefixCol)

    // 2. newest wildcard tombstone per (key, wildcard prefix) — a tiny
    //    aggregate over tombstone rows only
    val tombstones = bounded.toDF()
      .filter(col("deleteWildcard"))
      .withColumn("_prefix", prefixCol)
      .groupBy(col("key"), col("_prefix"))
      .agg(max(pos(col("stamp"), col("seqId"), col("uuid"))).as("_wc"))

    latest
      .join(tombstones, Seq("key", "_prefix"), "left_outer")
      .filter(!col("delete") &&
        (col("_wc").isNull ||
          pos(col("stamp"), col("seqId"), col("uuid")) > col("_wc")))
      .drop("_prefix", "_wc")
      .as[StreamElement]
  }

  /** Wildcard-free fast path: a family whose DECLARED attribute set
    * contains no wildcard attribute can never carry a deleteWildcard
    * tombstone, so the snapshot is just latest-per-cell minus deletes —
    * no tombstone scan, no join, one hash-aggregated shuffle (scalar
    * cells are (key, attribute)-granular already, so there is no skew
    * exposure to trade against). Routed by
    * [[graft.streaming.AttributeLogFamily.batchSnapshot]] when the
    * binder proves the declaration
    * ([[graft.core.GraftOperator]] resolves the family's attributes
    * against the entity). A misdeclared wildcard tombstone in the data
    * fails LOUDLY here rather than silently losing its suffix-deletion
    * semantics.
    */
  def snapshotScalar(ds: Dataset[StreamElement], asOf: Long = Long.MaxValue): Dataset[StreamElement] = {
    import org.apache.spark.sql.Encoders
    implicit val se: org.apache.spark.sql.Encoder[StreamElement] =
      StreamElement.encoder
    implicit val ke: org.apache.spark.sql.Encoder[(String, String)] =
      Encoders.tuple(Encoders.STRING, Encoders.STRING)
    // relational bound, not a typed lambda: col("stamp") <= asOf pushes
    // into the parquet scan (row-group pruning); a TypedFilter is an
    // object barrier Catalyst cannot push through, so a bounded
    // snapshot would deserialize the FULL post-horizon history
    val bounded =
      if (asOf == Long.MaxValue) ds
      else ds.toDF().filter(col("stamp") <= asOf).as[StreamElement]
    bounded
      .map { e =>
        if (e.deleteWildcard) throw new IllegalStateException(
          s"wildcard tombstone ${e.key}/${e.attribute} in a family " +
            "declared wildcard-free — fix the declaration, not the data")
        e
      }
      .groupByKey(e => (e.key, e.attribute))
      .reduceGroups { (a: StreamElement, b: StreamElement) =>
        if (posOrd.gteq((a.stamp, a.seqId, a.uuid),
          (b.stamp, b.seqId, b.uuid))) a
        else b
      }
      .map(_._2)
      .filter(e => !e.isDelete)
  }

  /** Latest-or-tombstone view (no delete filtering) — the `batch-updates`
    * reduce used when a downstream consumer needs to see retractions.
    */
  def latestPerAttribute(ds: Dataset[StreamElement]): Dataset[StreamElement] = {
    import ds.sparkSession.implicits._
    val df = ds.toDF()
    df.groupBy(col("key"), col("attribute"))
      .agg(max_by(struct(df.columns.toIndexedSeq.map(col): _*),
        pos(col("stamp"), col("seqId"), col("uuid"))).as("e"))
      .select(col("e.*"))
      .as[StreamElement]
  }
}
