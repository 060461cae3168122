package graft.randomaccess

import graft.SparkSpec
import graft.core.StreamElement
import graft.operators.LatestWithTombstones

class SecondaryIndexSpec extends SparkSpec {

  private def up(key: String, v: String, stamp: Long) =
    StreamElement("e", key, "status", s"u-$key-$stamp", 0, stamp,
      v.getBytes("UTF-8"), delete = false, deleteWildcard = false)

  private def del(key: String, stamp: Long) =
    StreamElement("e", key, "status", s"d-$key-$stamp", 0, stamp,
      null, delete = true, deleteWildcard = false)

  private def snap(xs: Seq[StreamElement]) =
    LatestWithTombstones.snapshot(
      spark.createDataset(xs)(StreamElement.encoder))

  private def live(ix: org.apache.spark.sql.Dataset[StreamElement]) =
    LatestWithTombstones.snapshot(ix).collect()
      .map(e => (e.key, e.attribute)).toSet

  test("rebuild indexes keys by current value; lookup lists them") {
    val s = snap(Seq(up("k1", "gold", 1), up("k2", "gold", 2),
      up("k3", "silver", 3), up("k1", "silver", 5)))
    val ix = SecondaryIndex.fromSnapshot(s, "status")
    assert(SecondaryIndex.lookup(ix, "status", "gold")
      .collect().map(_.getString(0)).toSet == Set("k2"))
    assert(SecondaryIndex.lookup(ix, "status", "silver")
      .collect().map(_.getString(0)).toSet == Set("k1", "k3"))
  }

  test("diff law: old index + diff compacts to the new index") {
    val oldLog = Seq(up("a", "x", 1), up("b", "x", 2), up("c", "y", 3),
      up("d", "z", 4))
    // b changes value, c is deleted, e appears, a and d unchanged
    val newLog = oldLog ++ Seq(up("b", "y", 10), del("c", 11), up("e", "x", 12))
    val (o, n) = (snap(oldLog), snap(newLog))
    val patched = SecondaryIndex.fromSnapshot(o, "status")
      .unionByName(SecondaryIndex.diff(o, n, "status", newStamp = 5))
    assert(live(patched) == live(SecondaryIndex.fromSnapshot(n, "status")))
    // and the lookups reflect the new world
    val compacted = LatestWithTombstones.snapshot(patched)
    assert(SecondaryIndex.lookup(compacted, "status", "x")
      .collect().map(_.getString(0)).toSet == Set("a", "e"))
    assert(SecondaryIndex.lookup(compacted, "status", "y")
      .collect().map(_.getString(0)).toSet == Set("b"))
  }

  test("diff ships O(changed keys): unchanged keys emit nothing") {
    val oldLog = (1 to 100).map(i => up(s"k$i", s"v${i % 5}", i.toLong))
    val newLog = oldLog ++ Seq(up("k1", "vX", 200))
    val d = SecondaryIndex.diff(snap(oldLog), snap(newLog), "status",
      newStamp = 150)
    val rows = d.collect()
    assert(rows.length == 2) // one retraction + one assertion, for k1 only
    assert(rows.forall(_.attribute == "ref.k1"))
    assert(rows.count(_.delete) == 1)
  }
}
