package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.FileSourceScanExec

import graft.SparkSpec
import graft.core.{GraftOperator, Repository, StreamElement}

/** Time-sliced blob storage: roll-period hive partitions play the
  * reference's yyyy/MM blob prefixes, and a stamp-range read must PRUNE
  * whole period directories (reference BlobLogReader partitions by the
  * name-embedded stamp range; DefaultNamingConvention.prefixesOf).
  */
class BlobLogFamilySpec extends SparkSpec {

  private def el(key: String, stamp: Long, v: String, delete: Boolean = false) =
    StreamElement("e", key, "a", s"$key-$stamp", 0L, stamp,
      if (delete) null else v.getBytes("UTF-8"), delete, deleteWildcard = false)

  test("append rolls into period partitions; range reads prune directories") {
    val dir = Files.createTempDirectory("graft-blob").toString
    val fam = new BlobLogFamily(spark, s"$dir/blob", rollSpan = 1000L)
    // three roll periods: [0, 1000), [1000, 2000), [2000, 3000)
    fam.append(Seq(el("a", 100, "p0"), el("b", 900, "p0b"),
      el("a", 1500, "p1"), el("c", 2500, "p2")))

    // layout: one partition directory per period
    val root = new java.io.File(s"$dir/blob")
    val rolls = root.listFiles().map(_.getName).filter(_.startsWith("roll="))
    assert(rolls.toSet == Set("roll=0", "roll=1000", "roll=2000"), rolls.toSeq)

    // full read sees everything
    assert(fam.batchUpdates().count() == 4)

    // stamp-range read: correct rows AND only one partition scanned
    val ranged = fam.batchUpdates(1000L, 2000L)
    assert(ranged.collect().map(e => new String(e.value, "UTF-8")).toSeq == Seq("p1"))
    val scans = ranged.queryExecution.executedPlan.collect {
      case f: FileSourceScanExec => f
    }
    assert(scans.nonEmpty)
    val partitionsRead = scans.map(_.selectedPartitions.partitionCount).sum
    assert(partitionsRead == 1,
      s"range [1000, 2000) must prune to ONE roll directory, read $partitionsRead")

    // boundary: a range ending inside a period still reads that period,
    // and the row filter trims within it
    val partial = fam.batchUpdates(0L, 901L)
    assert(partial.count() == 2)

    // snapshot semantics ride the inherited compaction (tombstones honored)
    fam.append(Seq(el("a", 2600, null, delete = true)))
    val live = fam.batchSnapshot().collect().map(_.key).toSet
    assert(live == Set("b", "c"), "the delete must evict key a")
  }

  test("expirePeriods drops whole expired period directories, keeps the rest") {
    val dir = Files.createTempDirectory("graft-blob-exp").toString
    val fam = new BlobLogFamily(spark, s"$dir/blob", rollSpan = 1000L)
    fam.append(Seq(el("a", 100, "p0"), el("b", 1500, "p1"),
      el("c", 2500, "p2"), el("d", 2900, "p2b")))
    // horizon 2100: periods ending <= 2100 ([0,1000) and [1000,2000)) go
    val dropped = fam.expirePeriods(keepFromUs = 2100)
    assert(dropped == Seq(0L, 1000L))
    val left = fam.batchUpdates().collect().map(_.key).toSet
    assert(left == Set("c", "d"))
    // the surviving period keeps ALL its elements, pre-horizon included
    // (whole-prefix granularity; boundary-exactness is the flat-log pass)
    assert(fam.expirePeriods(keepFromUs = 2100).isEmpty) // idempotent
    val root = new java.io.File(s"$dir/blob")
    val rolls = root.listFiles().map(_.getName).filter(_.startsWith("roll="))
    assert(rolls.toSeq == Seq("roll=2000"))
  }

  test("blob:// scheme binds through the operator and serves reads/writes") {
    val repo = Repository.parse(
      """entities { doc { attributes { "body" { scheme: string } } } }
        |attributeFamilies {
        |  doc-blob { entity: doc, attributes: [ "*" ],
        |             storage: "blob://docblob?rollSpan=1000",
        |             type: primary,
        |             access: [ commit-log, batch-updates, batch-snapshot, random-access ] }
        |}""".stripMargin)
    val op = new GraftOperator(spark, repo)
    op.write(StreamElement("doc", "d1", "body", "u1", 0L, 1500L,
      "hello".getBytes("UTF-8"), delete = false, deleteWildcard = false))
    val got = op.getRandomAccess("doc", "body").get("d1", "body")
    assert(got.exists(e => new String(e.value, "UTF-8") == "hello"))
    assert(op.getBatchUpdates("doc").count() == 1)
  }
}
