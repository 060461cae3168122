package graft.randomaccess

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.core.StreamElement

/** Secondary index over an attribute's VALUE: a derived wildcard family
  * mapping each indexed value to the keys currently holding it —
  * `key = "<attribute>=<value>"`, wildcard cell `ref.<entity key>`. The
  * reference builds exactly this shape with a declared transformation
  * feeding an index family and serves it through scanWildcard
  * (reference: transformations in ConfigRepository.readTransformations:2003;
  * wildcard listing RandomAccessReader.scanWildcard:260); here both the
  * rebuild and the MAINTENANCE path are explicit operators.
  *
  * - [[fromSnapshot]]: index of a compacted snapshot — one map-only pass
  *   (no shuffle; the index store's write shuffles once on its own key).
  * - [[diff]]: incremental maintenance from an OLD and NEW snapshot of
  *   the indexed attribute: a retraction (delete of the old index cell)
  *   for every changed/removed key + an upsert for every changed/added
  *   key. One full-outer join co-partitioned on the entity key. The law
  *   (SecondaryIndexSpec): applying diff over the old index's changelog
  *   compacts to exactly [[fromSnapshot]] of the new snapshot — so a
  *   nightly index job ships O(changed keys) elements, not O(corpus).
  *
  * Index elements are themselves StreamElements, so they persist through
  * any family ([[BucketedSnapshotStore]] included: value lookups then
  * prune to one bucket directory) and replay through the standard
  * compaction.
  */
object SecondaryIndex {

  private def indexKey(attribute: String, value: Column): Column =
    concat(lit(attribute + "="), value)

  private def elements(snap: DataFrame, attribute: String,
      stampCol: Column, deleteCol: Column): Dataset[StreamElement] = {
    snap.select(
      lit("index").as("entity"),
      indexKey(attribute, col("value").cast("string")).as("key"),
      concat(lit("ref."), col("key")).as("attribute"),
      // identity must separate a retraction from an assertion at the
      // same (entity key, stamp) — they live under DIFFERENT index keys,
      // so the index key (attribute=value) goes into the uuid, plus an
      // -r/-a discriminator: a retraction and a later re-assertion of
      // the SAME (attribute=value, entity key) at an identical stamp
      // (two diff calls given the same newStamp, replayed diffs) must
      // not collide into one position with opposite delete flags, or
      // compaction keeps whichever the fold meets first
      concat(lit("ix-"), indexKey(attribute, col("value").cast("string")),
        lit("@"), col("key"), lit("-"), stampCol,
        when(deleteCol, lit("-r")).otherwise(lit("-a"))).as("uuid"),
      // ties at (stamp, uuid-prefix) resolve deterministically via seqId:
      // the assertion (1) outranks the retraction (0) — a replayed
      // retract+assert pair compacts to the asserted cell on any
      // partition order
      when(deleteCol, lit(0L)).otherwise(lit(1L)).as("seqId"),
      stampCol.as("stamp"),
      when(deleteCol, lit(null)).otherwise(encode(col("key"), "UTF-8"))
        .as("value"),
      deleteCol.as("delete"),
      lit(false).as("deleteWildcard"))
      .as[StreamElement](StreamElement.encoder)
  }

  /** Full index rebuild from a compacted snapshot restricted to the
    * indexed attribute. Map-only.
    */
  def fromSnapshot(snapshot: Dataset[StreamElement],
      attribute: String): Dataset[StreamElement] =
    elements(
      snapshot.filter(col("attribute") === attribute && !col("delete")).toDF(),
      attribute, col("stamp"), lit(false))

  /** Incremental index changelog between two snapshots of the indexed
    * attribute: retractions for vanished/changed (key → value) pairs,
    * upserts for appeared/changed ones. Retraction stamps sit at
    * `newStamp` (the new snapshot's authority) so they supersede the old
    * index cells; upserts carry the new cell's own stamp when newer.
    */
  def diff(oldSnap: Dataset[StreamElement], newSnap: Dataset[StreamElement],
      attribute: String, newStamp: Long): Dataset[StreamElement] = {
    val o = oldSnap.filter(col("attribute") === attribute && !col("delete"))
      .toDF().select(col("key"), col("value").cast("string").as("old_v"))
    val n = newSnap.filter(col("attribute") === attribute && !col("delete"))
      .toDF().select(col("key"), col("value").cast("string").as("new_v"),
        col("stamp").as("new_stamp"))
    // ONE full-outer join; both the retraction and the assertion explode
    // out of the same joined row (a two-branch union would re-run the
    // join — two snapshot scans instead of one)
    val changed = o.join(n, Seq("key"), "full_outer")
      .filter(!(col("old_v") <=> col("new_v")))
      .select(col("key"), explode(array(
        when(col("old_v").isNotNull, struct(
          col("old_v").as("value"), lit(newStamp).as("stamp"),
          lit(true).as("retract"))),
        when(col("new_v").isNotNull, struct(
          col("new_v").as("value"),
          greatest(col("new_stamp"), lit(newStamp)).as("stamp"),
          lit(false).as("retract"))))).as("x"))
      .filter(col("x").isNotNull)
      .select(col("key"), col("x.value").as("value"),
        col("x.stamp").as("stamp"), col("x.retract").as("retract"))
    elements(changed, attribute, col("stamp"), col("retract"))
  }

  /** Keys currently holding `value` — a wildcard scan of the index
    * family's compacted state for the `attribute=value` key.
    */
  def lookup(index: Dataset[StreamElement], attribute: String,
      value: String): DataFrame =
    index.filter(col("key") === s"$attribute=$value" && !col("delete"))
      .toDF()
      .select(decode(col("value"), "UTF-8").as("entity_key"))
}
