package graft.core

import java.nio.file.Files

import graft.SparkSpec
import graft.streaming.Transformations

/** Config-class transform for the controller test: the reference's
  * EventDataToUserHistory scenario — event.data writes become wildcard
  * history entries on the `user` entity (example/model
  * EventDataToUserHistory.java:51, reference.conf:155-162).
  * Must be a top-level class so Class.forName + reflective construction
  * works exactly like the reference's config loading.
  */
class EventToUserHistory extends Transformations.ElementWise {
  def apply(e: StreamElement): Seq[StreamElement] =
    Seq(e.copy(entity = "user", key = s"user-${e.key}",
      attribute = s"event.${e.stamp}"))
}

/** Config-driven continuous transformations end-to-end: declared in HOCON,
  * class loaded reflectively, output routed to the target entity's primary
  * family by the distributed batch writer.
  */
class TransformationControllerSpec extends SparkSpec {

  test("declared transformation runs continuously and routes cross-entity") {
    val repo = Repository.parse(
      """entities {
        |  event { attributes { "data" { scheme: bytes } } }
        |  user  { attributes { "event.*" { scheme: bytes } } }
        |}
        |attributeFamilies {
        |  event-commit {
        |    entity: event
        |    attributes: [ "data" ]
        |    storage: "inmem://event-commit"
        |    type: primary
        |    access: [ commit-log, batch-updates ]
        |  }
        |  user-history {
        |    entity: user
        |    attributes: [ "event.*" ]
        |    storage: "inmem://user-history"
        |    type: primary
        |    access: [ commit-log, batch-updates, batch-snapshot, random-access ]
        |  }
        |}
        |transformations {
        |  event-to-history {
        |    entity: event
        |    attributes: [ "data" ]
        |    using: "graft.core.EventToUserHistory"
        |  }
        |}""".stripMargin)
    val op = new GraftOperator(spark, repo)
    assert(repo.transformations.contains("event-to-history"))

    def ev(key: String, stamp: Long, v: String) =
      StreamElement("event", key, "data", s"u-$key-$stamp", 0, stamp,
        v.getBytes("UTF-8"), delete = false, deleteWildcard = false)

    op.write(ev("e1", 100, "click"))
    val queries = op.startTransformations(
      Files.createTempDirectory("graft-trafo-").toString)
    try {
      assert(queries.size == 1)
      queries.foreach(_.processAllAvailable())
      // derived history landed on the user entity's primary family
      val hist = op.getBatchUpdates("user").collect()
      assert(hist.map(e => (e.key, e.attribute)).toSeq == Seq(("user-e1", "event.100")))
      // continuous: later writes flow through the running query
      op.write(ev("e2", 200, "view"))
      queries.foreach(_.processAllAvailable())
      val hist2 = op.getBatchUpdates("user").collect()
      assert(hist2.map(_.attribute).sorted.toSeq == Seq("event.100", "event.200"))
      // random access works over the derived wildcard relation
      assert(op.getRandomAccess("user", "event.*")
        .scanWildcard("user-e1", "event.").map(_.attribute) == Seq("event.100"))
    } finally queries.foreach(_.stop())
  }
}
