package graft.operators

import graft.SparkSpec
import graft.core.StreamElement

/** Snapshot-compaction semantics, mirroring the reference's wildcard-delete
  * test (reference: tools/.../GroovyEnvTest.testWildcardDelete:286) and the
  * stream-table-duality rules (docs datamodel.md:120-149).
  */
class SnapshotCompactSpec extends SparkSpec {

  private def up(key: String, attr: String, stamp: Long, v: String = "v",
      seq: Long = 0) =
    StreamElement("e", key, attr, s"u-$key-$attr-$stamp-$seq", seq, stamp,
      v.getBytes("UTF-8"), delete = false, deleteWildcard = false)

  private def del(key: String, attr: String, stamp: Long, seq: Long = 0) =
    StreamElement("e", key, attr, s"d-$key-$attr-$stamp-$seq", seq, stamp,
      null, delete = true, deleteWildcard = false)

  private def delWc(key: String, prefix: String, stamp: Long, seq: Long = 0) =
    StreamElement("e", key, prefix + "*", s"w-$key-$stamp-$seq", seq, stamp,
      null, delete = true, deleteWildcard = true)

  private def snap(xs: StreamElement*): Set[(String, String, Long)] = {
    val ds = spark.createDataset(xs)(StreamElement.encoder)
    SnapshotCompact.snapshot(ds).collect()
      .map(e => (e.key, e.attribute, e.stamp)).toSet
  }

  test("latest upsert wins per (key, attribute)") {
    assert(snap(up("k", "a", 1), up("k", "a", 5), up("k", "a", 3)) ==
      Set(("k", "a", 5)))
  }

  test("delete tombstone removes when newest") {
    assert(snap(up("k", "a", 1), del("k", "a", 2)) == Set.empty)
    assert(snap(del("k", "a", 1), up("k", "a", 2)) == Set(("k", "a", 2)))
  }

  test("wildcard delete wipes all older suffixes (testWildcardDelete:286)") {
    val r = snap(
      up("k", "device.1", 1), up("k", "device.2", 2),
      delWc("k", "device.", 5),
      up("k", "device.3", 7))
    assert(r == Set(("k", "device.3", 7)))
  }

  test("wildcard delete does not touch other keys, prefixes, or scalars") {
    val r = snap(
      up("k", "device.1", 1), up("k", "rule.1", 1), up("k", "status", 1),
      up("k2", "device.9", 1),
      delWc("k", "device.", 5))
    assert(r == Set(("k", "rule.1", 1), ("k", "status", 1), ("k2", "device.9", 1)))
  }

  test("replay order does not matter (out-of-order commit log)") {
    val elems = Seq(
      up("k", "device.1", 1), delWc("k", "device.", 5), up("k", "device.2", 8),
      del("k", "device.2", 9), up("k", "device.4", 6))
    val expected = Set(("k", "device.4", 6))
    elems.permutations.take(24).foreach { p =>
      assert(snap(p: _*) == expected, s"order: $p")
    }
  }

  test("same stamp resolved by seqId then uuid (deterministic ties)") {
    assert(snap(up("k", "a", 5, "x", seq = 1), up("k", "a", 5, "y", seq = 2)) ==
      Set(("k", "a", 5)))
    val ds = spark.createDataset(Seq(
      up("k", "a", 5, "x", seq = 1), up("k", "a", 5, "y", seq = 2)))(
      StreamElement.encoder)
    val v = SnapshotCompact.snapshot(ds).collect().head.value
    assert(new String(v, "UTF-8") == "y")
  }

  test("snapshot asOf ignores later elements") {
    val ds = spark.createDataset(Seq(
      up("k", "a", 1), up("k", "a", 10)))(StreamElement.encoder)
    val r = SnapshotCompact.snapshot(ds, asOf = 5).collect()
    assert(r.map(_.stamp).toSeq == Seq(1))
  }

  test("incremental merge folds deletes and wildcard deletes from the delta") {
    val hist = Seq(up("k", "device.1", 1), up("k", "device.2", 2),
      up("k", "status", 3), up("k2", "device.1", 4))
    val delta = Seq(delWc("k", "device.", 10), up("k", "device.3", 11),
      del("k2", "device.1", 12))
    val prev = LatestWithTombstones.snapshot(
      spark.createDataset(hist)(StreamElement.encoder))
    val inc = IncrementalSnapshot.merge(prev,
        spark.createDataset(delta)(StreamElement.encoder))
      .collect().map(e => (e.key, e.attribute, e.stamp)).toSet
    // k's device.* wiped then re-filled, scalar untouched; k2 deleted
    assert(inc == Set(("k", "device.3", 11L), ("k", "status", 3L)))
  }

  test("precondition is NOT optional: an interleaved delta diverges " +
      "(documented counterexample) and mergeChecked refuses it") {
    // history: upsert @1 then delete @3 — full compaction of history ∪
    // {upsert @2} keeps NOTHING (the @3 tombstone is latest). But the
    // compacted snapshot dropped the tombstone, so a delta element
    // positioned before it would wrongly survive an unchecked merge.
    val hist = Seq(up("k", "a", 1), del("k", "a", 3))
    val delta = Seq(up("k", "a", 2, "late"))
    val full = snap(hist ++ delta: _*)
    assert(full == Set.empty)
    val prev = LatestWithTombstones.snapshot(
      spark.createDataset(hist)(StreamElement.encoder))
    val deltaDs = spark.createDataset(delta)(StreamElement.encoder)
    assert(IncrementalSnapshot.merge(prev, deltaDs).collect()
      .map(_.stamp).toSeq == Seq(2)) // the documented divergence
    intercept[IllegalArgumentException] {
      // history was compacted up to T=3; the delta's @2 is not after it
      IncrementalSnapshot.mergeChecked(prev, deltaDs, watermark = 3)
    }
  }

  test("hot wildcard key: 1e5 live suffixes compact through the default " +
      "per-cell plan, no single-task suffix-count buffer") {
    // One key holding 100k live `event.*` suffixes — the wide-row shape
    // the one-pass typed aggregator would concentrate into a single Acc
    // map on one task. The DEFAULT batchSnapshot must route through the
    // relational two-pass plan (per-(key,attribute) aggregation state).
    val n = 100000
    val hot = spark.range(1, n.toLong + 1).selectExpr(
      "'e' AS entity", "'hot' AS key",
      "concat('event.', id) AS attribute",
      "concat('u', id) AS uuid", "0L AS seqId", "id AS stamp",
      "CAST(NULL AS BINARY) AS value",
      "false AS delete", "false AS deleteWildcard")
      .as[StreamElement](StreamElement.encoder)
    val extra = spark.createDataset(Seq(
      delWc("hot", "old.", 1), up("hot", "old.1", 0), // wiped
      up("cold", "event.1", 5)))(StreamElement.encoder)
    val fam = graft.streaming.AttributeLogFamily.batchView(hot.union(extra))
    val snap = fam.batchSnapshot()
    val plan = snap.queryExecution.executedPlan.toString
    // the hazard is PER-GROUP STATE WIDTH, not typed aggregation per se:
    // LatestWithTombstones' Acc buffers every live suffix of a
    // (key, prefix) in one task's map, while the default plan's typed
    // reduce groups by (key, attribute) with one element of state. Gate
    // on the wide-Acc buffer class and on the big side staying
    // hash-aggregated (a SortAggregate here would mean the compaction
    // sorts the full changelog both sides of the shuffle)
    assert(!plan.contains("LatestWithTombstones"),
      s"default snapshot must not route to the wide-Acc aggregator:\n$plan")
    assert(plan.contains("ObjectHashAggregate"),
      s"per-cell reduce must plan as a hash aggregate:\n$plan")
    assert(snap.count() === n + 1L) // 100k hot suffixes + cold's one
  }

  test("scalar fast path: snapshotScalar == snapshot on wildcard-free data") {
    val xs = Seq(
      up("k", "a", 1), up("k", "a", 5), up("k", "b", 2), del("k", "b", 3),
      del("k2", "a", 1), up("k2", "a", 4), up("k3", "c", 7, seq = 1),
      up("k3", "c", 7, seq = 2), del("k3", "d", 9))
    val ds = spark.createDataset(xs)(StreamElement.encoder)
    val fast = SnapshotCompact.snapshotScalar(ds).collect()
      .map(e => (e.key, e.attribute, e.stamp, e.seqId)).toSet
    val full = SnapshotCompact.snapshot(ds).collect()
      .map(e => (e.key, e.attribute, e.stamp, e.seqId)).toSet
    assert(fast == full)
    assert(fast == Set(("k", "a", 5L, 0L), ("k2", "a", 4L, 0L),
      ("k3", "c", 7L, 2L)))
    // no tombstone branch: single aggregation, no join in the plan
    val plan = SnapshotCompact.snapshotScalar(ds)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"scalar path must not join:\n$plan")
  }

  test("scalar fast path refuses a misdeclared wildcard tombstone loudly") {
    val ds = spark.createDataset(Seq(
      up("k", "device.1", 1), delWc("k", "device.", 5)))(StreamElement.encoder)
    val e = intercept[org.apache.spark.SparkException] {
      SnapshotCompact.snapshotScalar(ds).collect()
    }
    assert(e.getMessage.contains("wildcard-free") ||
      Option(e.getCause).exists(_.getMessage.contains("wildcard-free")))
  }

  test("repository binder declares wildcard-free from scalar attribute " +
    "declarations, and only then") {
    import graft.core.{GraftOperator, Repository}
    val repo = Repository.parse(
      """entities {
        |  gw {
        |    attributes {
        |      "status" { scheme: string }
        |      "device.*" { scheme: string }
        |    }
        |  }
        |}
        |attributeFamilies {
        |  gw-scalar {
        |    entity: gw
        |    attributes: [ "status" ]
        |    storage: "inmem://snapfast-scalar"
        |    type: primary
        |    access: [ commit-log, batch-updates, batch-snapshot ]
        |  }
        |  gw-wild {
        |    entity: gw
        |    attributes: [ "device.*" ]
        |    storage: "inmem://snapfast-wild"
        |    type: primary
        |    access: [ commit-log, batch-updates, batch-snapshot ]
        |  }
        |  gw-star {
        |    entity: gw
        |    attributes: [ "*" ]
        |    storage: "inmem://snapfast-star"
        |    type: replica
        |    access: [ batch-updates, batch-snapshot ]
        |  }
        |}""".stripMargin)
    val op = new GraftOperator(spark, repo)
    assert(op.family("gw-scalar").wildcardFree,
      "scalar-only declaration must enable the fast path")
    assert(!op.family("gw-wild").wildcardFree,
      "a wildcard declaration must keep the tombstone branch")
    assert(!op.family("gw-star").wildcardFree,
      "'*' over an entity WITH a wildcard attribute is not wildcard-free")
    val plan = op.family("gw-scalar").batchSnapshot()
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"),
      s"wildcard-free batchSnapshot must skip the tombstone join:\n$plan")
  }

  test("mergeChecked accepts a watermark-clean split and matches full") {
    val all = Seq(up("k", "device.1", 1), up("k", "b", 2),
      delWc("k", "device.", 3),
      up("k", "device.1", 5), del("k", "b", 6), up("k2", "a", 7))
    val (hist, delta) = all.partition(_.stamp <= 4)
    val prev = LatestWithTombstones.snapshot(
      spark.createDataset(hist)(StreamElement.encoder))
    val inc = IncrementalSnapshot.mergeChecked(prev,
        spark.createDataset(delta)(StreamElement.encoder), watermark = 4)
      .collect().map(e => (e.key, e.attribute, e.stamp)).toSet
    assert(inc == snap(all: _*))
  }
}
