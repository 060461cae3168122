package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Repository/config parsing on the canonical test config shape
  * (reference: core/src/test/resources/test-reference.conf:54-110,
  * parsing ConfigRepository.java:507,1145).
  */
class RepositorySpec extends AnyFunSuite {

  private val config =
    """
      |entities {
      |  event   { attributes { data: { scheme: "bytes" } } }
      |  gateway {
      |    attributes {
      |      armed:  { scheme: bytes }
      |      status: { scheme: bytes }
      |      "device.*": { scheme: bytes }   # wildcard attr (map-like)
      |      "rule.*":   { scheme: bytes }
      |      metric: { scheme: float }
      |    }
      |  }
      |}
      |attributeFamilies {
      |  event-storage-stream { entity: event, attributes: ["data"],
      |    storage: "inmem:///proxima_events", type: primary, access: commit-log }
      |  gateway-storage-stream { entity: gateway, attributes: ["*"],
      |    storage: "inmem:///proxima_gateway", type: primary,
      |    access: [commit-log, random-access, batch-updates, batch-snapshot] }
      |}
      |transformations {
      |  event-to-history { entity: event, attributes: ["data"], using: "X" }
      |}
      |""".stripMargin

  private val repo = Repository.parse(config)

  test("entities and attributes parsed") {
    assert(repo.entities.keySet == Set("event", "gateway"))
    val gw = repo.entity("gateway")
    assert(gw.attributes.map(_.name).toSet ==
      Set("armed", "status", "device.*", "rule.*", "metric"))
    assert(gw.attribute("metric").get.scheme == "float")
  }

  test("wildcard attribute resolution") {
    val gw = repo.entity("gateway")
    assert(gw.resolve("device.abc123").map(_.name).contains("device.*"))
    assert(gw.resolve("status").map(_.name).contains("status"))
    assert(gw.resolve("unknown").isEmpty)
    assert(gw.attribute("device.*").get.isWildcard)
    assert(gw.attribute("device.*").get.prefix == "device.")
  }

  test("families with access flags") {
    val f = repo.families("gateway-storage-stream")
    assert(f.entity == "gateway")
    assert(f.canReadCommitLog && f.canRandomAccess && f.canReadBatchSnapshot)
    assert(f.storageUri == "inmem:///proxima_gateway")
    val ev = repo.families("event-storage-stream")
    assert(ev.access == Set("commit-log"))
    assert(ev.attributes == Seq("data"))
  }

  test("access-path routing (findSuitableAccessors analog)") {
    assert(repo.familyFor("gateway", "device.x", Access.RandomAccess)
      .map(_.name).contains("gateway-storage-stream"))
    assert(repo.familyFor("event", "data", Access.CommitLog)
      .map(_.name).contains("event-storage-stream"))
    assert(repo.familyFor("event", "data", Access.RandomAccess).isEmpty)
  }

  test("transformations parsed") {
    assert(repo.transformations("event-to-history").transformClass == "X")
  }

  test("value serializers round-trip") {
    import ValueSerializer._
    assert(LongSerializer.deserialize(LongSerializer.serialize(42L)).contains(42L))
    assert(IntSerializer.deserialize(IntSerializer.serialize(-7)).contains(-7))
    assert(DoubleSerializer.deserialize(DoubleSerializer.serialize(1.5)).contains(1.5))
    assert(FloatSerializer.deserialize(FloatSerializer.serialize(2.5f)).contains(2.5f))
    assert(StringSerializer.deserialize(StringSerializer.serialize("héllo"))
      .contains("héllo"))
    intercept[IllegalArgumentException](ValueSerializer.of("nope"))
  }
}
