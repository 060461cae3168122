package graft.streaming

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.{Dataset, SparkSession}

import graft.core.StreamElement

/** Embedded wide-row random-access store — the `cassandra://` seam double
  * (reference: direct/io-cassandra/.../CassandraDBAC.java wide-row layout:
  * partition key = entity key, clustering column = attribute; the same
  * shape serves HBase/Bigtable bindings). No database driver jars exist in
  * this build; the double implements the storage's OBSERVABLE contract —
  * last-writer-wins cells with tombstone semantics — behind
  * [[AttributeLogFamily]], where the production binding would seat the
  * real connector.
  *
  * Semantics (matching SnapshotCompact exactly):
  *  - a cell (key, attribute) holds the element with the highest
  *    (stamp, seqId, uuid) position;
  *  - delete tombstones win like writes and hide the cell;
  *  - wildcard-delete tombstones record a per-(key, prefix) floor: cells
  *    at-or-below the floor are dead, later writes resurrect.
  *
  * Random-access storages serve NO commit log (the reference routes
  * commit-log access to Kafka families); [[WideRowFamily.streamFromOldest]]
  * throws accordingly and the repository's access flags keep such reads
  * away from wide-row families.
  */
object EmbeddedWideRow {

  private val stores = TrieMap.empty[String, Store]

  def store(cluster: String, table: String): Store =
    stores.getOrElseUpdate(s"$cluster/$table", new Store)

  def reset(): Unit = stores.clear()

  /** Drop ONE store (scratch tables of repeatedly-run queries must not
    * accumulate in a long session).
    */
  def drop(cluster: String, table: String): Unit = {
    stores.remove(s"$cluster/$table"); ()
  }

  private type Pos = (Long, Long, String)
  private def pos(e: StreamElement): Pos = e.position
  private val posOrd = StreamElement.positionOrdering

  final class Store {
    private val cells = TrieMap.empty[(String, String), StreamElement]
    private val wcFloor = TrieMap.empty[(String, String), Pos]

    private def floorOf(key: String, attribute: String): Option[Pos] =
      wcFloor.get((key, StreamElement.prefixOf(attribute)))

    def put(e: StreamElement): Unit = synchronized {
      if (e.deleteWildcard) {
        val prefix = e.attributePrefix
        val p = pos(e)
        wcFloor.updateWith((e.key, prefix)) {
          case Some(old) if posOrd.gteq(old, p) => Some(old)
          case _ => Some(p)
        }
        // physically drop covered cells (the range tombstone compaction)
        cells.keys
          .filter { case (k, a) => k == e.key && a.startsWith(prefix) }
          .foreach { ka =>
            cells.get(ka).filter(c => posOrd.lteq(pos(c), p)).foreach(_ =>
              cells.remove(ka))
          }
      } else {
        cells.updateWith((e.key, e.attribute)) {
          case Some(old) if posOrd.gteq(pos(old), pos(e)) => Some(old)
          case _ => Some(e)
        }
      }
    }

    /** Live cell: latest element beats tombstones and the wildcard floor. */
    def get(key: String, attribute: String): Option[StreamElement] =
      cells.get((key, attribute))
        .filterNot(_.delete)
        .filter(e => floorOf(key, attribute).forall(f => posOrd.gt(pos(e), f)))

    def scan(key: String, prefix: String = ""): Seq[StreamElement] =
      cells.iterator
        .collect { case ((k, a), e) if k == key && a.startsWith(prefix) => e }
        .filterNot(_.delete)
        .filter(e => floorOf(key, e.attribute).forall(f => posOrd.gt(pos(e), f)))
        .toSeq.sortBy(_.attribute)

    def all: Seq[StreamElement] =
      cells.values
        .filterNot(_.delete)
        .filter(e => floorOf(e.key, e.attribute).forall(f => posOrd.gt(pos(e), f)))
        .toSeq
  }
}

/** `cassandra://` attribute family over the embedded wide-row store.
  * Batch reads return the CURRENT cells (a random-access store has no
  * update history — its batch access is snapshot-shaped, which is exactly
  * how the reference flags cassandra families).
  */
final class WideRowFamily(val spark: SparkSession,
    val store: EmbeddedWideRow.Store) extends AttributeLogFamily {
  import graft.core.StreamElement.encoder

  /** Dataset appends COLLECT TO THE DRIVER by design: the embedded store
    * is an in-JVM TrieMap living in the driver process, so there is no
    * executor-side surface to write to — unlike the kafka double, whose
    * DataSourceV2 writer appends from executor tasks. A real Cassandra
    * binding would write per-partition from executors (the reference's
    * CassandraWriter runs in each worker); this collect is the double's
    * seam, not the production write shape.
    */
  def append(elems: Dataset[StreamElement]): Unit =
    elems.collect().foreach(store.put)

  override def append(elems: Seq[StreamElement]): Unit = {
    graft.core.Metrics.inc("graft.elements.appended", elems.size.toLong)
    elems.foreach(store.put)
  }

  def batchUpdates(from: Long = Long.MinValue,
      until: Long = Long.MaxValue): Dataset[StreamElement] =
    spark.createDataset(
      store.all.filter(e => e.stamp >= from && e.stamp < until))

  /** Already compacted at the storage layer. Historical `asOf` snapshots
    * are REJECTED rather than silently wrong: the store keeps only current
    * cells, so replaying LatestWithTombstones over them would make any cell
    * overwritten after `asOf` disappear instead of reporting its pre-asOf
    * version (which no longer exists here). Route time-travel snapshots to
    * a commit-log family.
    */
  override def batchSnapshot(asOf: Long = Long.MaxValue): Dataset[StreamElement] =
    if (asOf == Long.MaxValue) batchUpdates()
    else throw new UnsupportedOperationException(
      "wide-row storage holds no update history; a snapshot asOf " +
        s"$asOf cannot be reconstructed (use a commit-log family)")

  def streamFromOldest(): Dataset[StreamElement] =
    throw new UnsupportedOperationException(
      "random-access storage serves no commit log (route commit-log access " +
        "to a kafka:// or file family)")

  /** Commits serialize per embedded store (in-process — single JVM). */
  override def commitLockToken: String =
    s"widerow:${System.identityHashCode(store)}"

  /** Direct point read — the storage-native get, no Spark job. */
  def directGet(key: String, attribute: String): Option[StreamElement] =
    store.get(key, attribute)

  /** Direct wide-row scan — the storage-native clustering-range read. */
  def directScan(key: String, prefix: String = ""): Seq[StreamElement] =
    store.scan(key, prefix)
}
