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

  /** Snapshot at `asOf` (epoch micros/millis — same unit as `stamp`);
    * `Long.MaxValue` = current snapshot.
    */
  def snapshot(ds: Dataset[StreamElement], asOf: Long = Long.MaxValue): Dataset[StreamElement] = {
    import ds.sparkSession.implicits._

    val bounded = if (asOf == Long.MaxValue) ds.toDF() else ds.filter(col("stamp") <= asOf).toDF()
    val withPrefix = bounded.withColumn("_prefix", prefixCol)

    // 1. latest element per (key, attribute) — one combinable max_by pass
    val latest = withPrefix
      .groupBy(col("key"), col("attribute"))
      .agg(max_by(
        struct(withPrefix.columns.toIndexedSeq.map(col): _*),
        pos(col("stamp"), col("seqId"), col("uuid"))).as("e"))
      .select(col("e.*"))

    // 2. newest wildcard tombstone per (key, wildcard prefix)
    val tombstones = withPrefix
      .filter(col("deleteWildcard"))
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
