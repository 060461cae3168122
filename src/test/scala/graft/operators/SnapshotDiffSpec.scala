package graft.operators

import graft.SparkSpec
import graft.core.StreamElement

/** SnapshotDiff semantics: added / removed / updated classification with
  * tombstone and wildcard-tombstone removals, silence on unchanged
  * cells, and agreement with the brute-force two-snapshot diff (the
  * touched-keys restriction must be invisible).
  */
class SnapshotDiffSpec extends SparkSpec {

  private def up(key: String, attr: String, stamp: Long, seq: Long) =
    StreamElement("e", key, attr, s"u-$key-$attr-$stamp", seq, stamp,
      "v".getBytes("UTF-8"), delete = false, deleteWildcard = false)

  private def del(key: String, attr: String, stamp: Long, seq: Long) =
    StreamElement("e", key, attr, s"d-$key-$attr-$stamp", seq, stamp,
      null, delete = true, deleteWildcard = false)

  private def delWc(key: String, prefix: String, stamp: Long, seq: Long) =
    StreamElement("e", key, prefix + "*", s"w-$key-$stamp", seq, stamp,
      null, delete = true, deleteWildcard = true)

  private val log = Seq(
    up("k1", "a", 1, 1),        // unchanged across the diff window
    up("k2", "a", 2, 2),        // updated at stamp 15
    up("k2", "a", 15, 3),
    up("k3", "a", 16, 4),       // added in the window
    up("k4", "a", 3, 5),        // removed: exact delete at 17
    del("k4", "a", 17, 6),
    up("k5", "device.1", 4, 7), // removed: wildcard tombstone at 18
    up("k5", "device.2", 5, 8),
    delWc("k5", "device.", 18, 9),
    up("k5", "device.3", 19, 10), // added after the tombstone
    up("k6", "a", 30, 11))      // outside the window entirely

  private def diffRows(t1: Long, t2: Long): Set[(String, String, String)] = {
    val ds = spark.createDataset(log)(StreamElement.encoder)
    SnapshotDiff.diff(ds, t1, t2).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
  }

  test("added / removed / updated classified; unchanged cells silent") {
    val d = diffRows(10, 25)
    assert(d == Set(
      ("k2", "a", "updated"),
      ("k3", "a", "added"),
      ("k4", "a", "removed"),
      ("k5", "device.1", "removed"),
      ("k5", "device.2", "removed"),
      ("k5", "device.3", "added")))
  }

  test("matches the brute-force two-snapshot diff (restriction invisible)") {
    val ds = spark.createDataset(log)(StreamElement.encoder)
    def cells(asOf: Long): Map[(String, String), Long] =
      SnapshotCompact.snapshot(ds, asOf).collect()
        .map(e => (e.key, e.attribute) -> e.seqId).toMap
    val (s1, s2) = (cells(10), cells(25))
    val expect =
      (s2.keySet -- s1.keySet).map(k => (k._1, k._2, "added")) ++
        (s1.keySet -- s2.keySet).map(k => (k._1, k._2, "removed")) ++
        (s1.keySet & s2.keySet).filter(k => s1(k) != s2(k))
          .map(k => (k._1, k._2, "updated"))
    assert(diffRows(10, 25) == expect)
  }

  test("empty delta window diffs to nothing") {
    assert(diffRows(20, 29).isEmpty)
  }
}
