package graft.service

import java.nio.file.Files

import graft.SparkSpec
import graft.core.{GraftOperator, Repository}
import graft.sources.JdbcFamily

class ServiceSpec extends SparkSpec {

  private def newOp(): GraftOperator = {
    val repo = Repository.parse(
      """
        |entities {
        |  gateway {
        |    attributes {
        |      status: { scheme: string }
        |      "device.*": { scheme: bytes }
        |    }
        |  }
        |}
        |attributeFamilies {
        |  gateway-primary { entity: gateway, attributes: ["*"],
        |    storage: "inmem:///gw", type: primary,
        |    access: [commit-log, batch-updates, batch-snapshot, random-access] }
        |}
        |""".stripMargin)
    new GraftOperator(spark, repo,
      Files.createTempDirectory("graft-svc-").toString)
  }

  test("ingest/retrieve service surface (rpc.proto semantics)") {
    val op = newOp()
    val ingest = new IngestService(op)
    val retrieve = new RetrieveService(op)

    val s1 = ingest.ingest("gateway", "g1", "status", 1, "UP".getBytes)
    assert(s1.ok && s1.uuid.nonEmpty)
    assert(!ingest.ingest("nope", "k", "a", 1, Array[Byte]()).ok)
    assert(!ingest.ingest("gateway", "g1", "missing", 1, Array[Byte]()).ok)

    val bulk = ingest.ingestBulk(Seq(
      ("gateway", "g1", "device.a", 2L, "da".getBytes),
      ("gateway", "g1", "device.b", 3L, "db".getBytes),
      ("gateway", "g2", "status", 4L, "DOWN".getBytes)))
    assert(bulk.forall(_.ok))

    assert(retrieve.get("gateway", "g1", "status").map(new String(_))
      .contains("UP"))
    assert(retrieve.listAttributes("gateway", "g1") ==
      Seq("device.a", "device.b", "status"))
    assert(retrieve.listAttributes("gateway", "g1", prefix = "device.",
      offset = 1, limit = 1) == Seq("device.b"))
    assert(retrieve.multifetch("gateway", "status", Seq("g1", "g2")).keySet ==
      Set("g1", "g2"))
    assert(retrieve.scan("gateway").count() == 4)

    // delete through ingest: tombstone hides the value
    assert(ingest.ingest("gateway", "g1", "status", 9, null, delete = true).ok)
    assert(retrieve.get("gateway", "g1", "status").isEmpty)
    // wildcard delete wipes the relation
    assert(ingest.ingest("gateway", "g1", "device.*", 10, null, delete = true).ok)
    assert(retrieve.listAttributes("gateway", "g1", prefix = "device.").isEmpty)
  }

  test("jdbc family (embedded derby) roundtrip with stamp pushdown") {
    val db = Files.createTempDirectory("graft-derby-").toString + "/db"
    val fam = new JdbcFamily(spark, s"jdbc:derby:$db;create=true", "els")
    def up(key: String, stamp: Long, v: String) =
      graft.core.StreamElement("e", key, "a", s"$key-$stamp", 0, stamp,
        v.getBytes, delete = false, deleteWildcard = false)
    fam.append(Seq(up("k1", 1, "x"), up("k1", 5, "y")))
    fam.append(Seq(up("k2", 3, "z")))
    assert(fam.batchUpdates().count() == 3)
    assert(fam.batchUpdates(from = 2, until = 5).count() == 1)
    // stamp-range splits: the scan must fan out over >1 input partition
    assert(fam.batchUpdates().rdd.getNumPartitions > 1)
    val snap = fam.batchSnapshot().collect()
      .map(e => e.key -> new String(e.value)).toMap
    assert(snap == Map("k1" -> "y", "k2" -> "z"))
  }
}
