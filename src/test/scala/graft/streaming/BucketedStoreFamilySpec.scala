package graft.streaming

import java.nio.file.Files

import graft.SparkSpec
import graft.core.{GraftOperator, Repository, StreamElement}
import graft.randomaccess.RandomAccessReader

class BucketedStoreFamilySpec extends SparkSpec {

  private def up(key: String, attr: String, stamp: Long, v: String) =
    StreamElement("user", key, attr, s"u-$key-$attr-$stamp", 0, stamp,
      v.getBytes("UTF-8"), delete = false, deleteWildcard = false)

  private def del(key: String, attr: String, stamp: Long) =
    StreamElement("user", key, attr, s"d-$key-$attr-$stamp", 0, stamp,
      null, delete = true, deleteWildcard = false)

  private def operator() = {
    val dir = Files.createTempDirectory("graft-bsf-").toString
    val repo = Repository.parse(
      s"""entities { user { attributes { status { scheme: string } } } }
         |attributeFamilies {
         |  state-store {
         |    entity: user
         |    attributes: [ status ]
         |    storage: "bucketed://file://$dir/store?buckets=8"
         |    access: [ random-access, batch-snapshot ]
         |  }
         |}""".stripMargin)
    new GraftOperator(spark, repo)
  }

  test("bucketed:// binds through config; reader serves the fast path") {
    val op = operator()
    val fam = op.family("state-store")
    assert(fam.isInstanceOf[BucketedStoreFamily])
    fam.append(Seq(up("k1", "status", 1, "a"), up("k2", "status", 2, "b")))
    fam.append(Seq(up("k1", "status", 5, "newer"), del("k2", "status", 6)))

    val reader = new RandomAccessReader(fam)
    assert(reader.get("k1", "status").map(e => new String(e.value))
      == Some("newer"))
    assert(reader.get("k2", "status").isEmpty) // deleted
    assert(reader.multiFetch(Seq("k1", "k2", "zz"), "status")
      .view.mapValues(e => new String(e.value)).toMap == Map("k1" -> "newer"))
  }

  test("batchSnapshot is the store itself; appends fold latest-wins") {
    val op = operator()
    val fam = op.family("state-store")
    fam.append(Seq(up("a", "status", 1, "v1"), up("b", "status", 2, "v2")))
    fam.append(Seq(up("a", "status", 0, "late-loser"))) // older, must lose
    val snap = fam.batchSnapshot().collect()
      .map(e => e.key -> new String(e.value)).toMap
    assert(snap == Map("a" -> "v1", "b" -> "v2"))
  }

  test("the retrieve service routes point reads through the store path") {
    val op = operator()
    op.family("state-store").append(Seq(
      up("k1", "status", 1, "hello"), del("k1", "status", 2),
      up("k1", "status", 3, "resurrected"), up("k2", "status", 4, "x")))
    val svc = new graft.service.RetrieveService(op)
    assert(svc.get("user", "k1", "status").map(new String(_))
      == Some("resurrected"))
    assert(svc.multifetch("user", "status", Seq("k1", "k2", "nope"))
      .view.mapValues(new String(_)).toMap ==
      Map("k1" -> "resurrected", "k2" -> "x"))
  }

  test("commit-log access is refused (state, not history)") {
    val op = operator()
    intercept[UnsupportedOperationException] {
      op.family("state-store").streamFromOldest()
    }
  }
}
