package graft.streaming

import graft.SparkSpec
import graft.core.{GraftOperator, Repository, StreamElement}

/** Wide-row (cassandra-shaped) random-access storage semantics: LWW cells,
  * tombstones, wildcard floors with resurrection, out-of-order writes, and
  * routing through the repository (reference: io-cassandra wide-row
  * layout; the access-flag model that keeps commit-log reads away from
  * random-access storages).
  */
class WideRowSpec extends SparkSpec {

  private def up(key: String, attr: String, stamp: Long, v: String, seq: Long = 0) =
    StreamElement("dev", key, attr, s"u-$key-$attr-$stamp-$seq", seq, stamp,
      v.getBytes("UTF-8"), delete = false, deleteWildcard = false)

  private def del(key: String, attr: String, stamp: Long) =
    StreamElement("dev", key, attr, s"d-$key-$attr-$stamp", 0, stamp, null,
      delete = true, deleteWildcard = false)

  private def delWc(key: String, prefix: String, stamp: Long) =
    StreamElement("dev", key, prefix + "*", s"w-$key-$stamp", 0, stamp, null,
      delete = true, deleteWildcard = true)

  test("last-writer-wins cells with out-of-order protection") {
    val s = new EmbeddedWideRow.Store
    s.put(up("k1", "a", 5, "new"))
    s.put(up("k1", "a", 3, "stale")) // late arrival must not win
    assert(s.get("k1", "a").map(e => new String(e.value, "UTF-8")).contains("new"))
    s.put(up("k1", "a", 9, "newest"))
    assert(s.get("k1", "a").map(e => new String(e.value, "UTF-8")).contains("newest"))
  }

  test("tombstones hide cells; wildcard floor kills and resurrects") {
    val s = new EmbeddedWideRow.Store
    s.put(up("k1", "device.1", 1, "d1"))
    s.put(up("k1", "device.2", 2, "d2"))
    s.put(up("k1", "status", 3, "on"))
    s.put(del("k1", "status", 4))
    assert(s.get("k1", "status").isEmpty)
    s.put(delWc("k1", "device.", 5))
    assert(s.scan("k1", "device.").isEmpty)
    // a LATE write below the floor stays dead
    s.put(up("k1", "device.3", 4, "late"))
    assert(s.get("k1", "device.3").isEmpty)
    // a write after the floor resurrects
    s.put(up("k1", "device.1", 7, "revived"))
    assert(s.scan("k1", "device.").map(_.attribute) == Seq("device.1"))
  }

  test("cassandra:// routing: write through operator, read via random access") {
    val repo = Repository.parse(
      """entities { dev { attributes {
        |  "status" { scheme: string }
        |  "device.*" { scheme: bytes }
        |} } }
        |attributeFamilies {
        |  dev-wide {
        |    entity: dev
        |    attributes: [ "*" ]
        |    storage: "cassandra://cluster-1/dev_table"
        |    type: primary
        |    access: [ random-access, batch-snapshot, batch-updates ]
        |  }
        |}""".stripMargin)
    val op = new GraftOperator(spark, repo)
    assert(op.family("dev-wide").isInstanceOf[WideRowFamily])
    op.write(up("d1", "status", 1, "on"))
    op.write(up("d1", "device.a", 2, "x"))
    op.write(up("d2", "status", 3, "off"))
    // standard random-access surface over the wide-row family
    val ra = op.getRandomAccess("dev", "status")
    assert(ra.get("d1", "status").map(e => new String(e.value, "UTF-8")).contains("on"))
    assert(ra.listEntities(0, 10) == Seq("d1", "d2"))
    // snapshot read is the storage's current cells
    assert(op.getBatchSnapshot("dev").count() == 3)
    // storage-native direct reads need no Spark job
    val wf = op.family("dev-wide").asInstanceOf[WideRowFamily]
    assert(wf.directGet("d2", "status").nonEmpty)
    assert(wf.directScan("d1").map(_.attribute) == Seq("device.a", "status"))
    // commit-log access is refused by the storage
    intercept[UnsupportedOperationException](wf.streamFromOldest())
  }
}
