package graft.operators

import java.nio.file.Files

import graft.SparkSpec
import graft.core.{GraftOperator, Repository, StreamElement}

class MaintenanceSpec extends SparkSpec {

  private def up(key: String, stamp: Long) =
    StreamElement("user", key, "status", s"u-$key-$stamp", 0, stamp,
      "v".getBytes("UTF-8"), delete = false, deleteWildcard = false)

  test("declared retention + target applies per binding in one run") {
    val dir = Files.createTempDirectory("graft-maint-").toString
    val repo = Repository.parse(
      s"""entities { user { attributes { status { scheme: string } } } }
         |attributeFamilies {
         |  flat-log {
         |    entity: user
         |    attributes: [ status ]
         |    storage: "file://$dir/flat"
         |    access: [ commit-log, batch-updates ]
         |    retention: 1h
         |    compact-target-mb: 512
         |  }
         |  blob-log {
         |    entity: user
         |    attributes: [ status ]
         |    storage: "blob://file://$dir/blob?rollSpan=3600000000"
         |    access: [ batch-updates ]
         |    retention: 1h
         |  }
         |  untouched {
         |    entity: user
         |    attributes: [ status ]
         |    storage: "file://$dir/untouched"
         |    access: [ batch-updates ]
         |  }
         |}""".stripMargin)
    val op = new GraftOperator(spark, repo)
    val hourUs = 3600000000L
    val nowUs = 10L * hourUs
    // flat: 3 appends (small files), half the data older than 1h
    val flat = op.family("flat-log")
    (0 until 3).foreach { b =>
      flat.asInstanceOf[graft.streaming.CommitLogFamily].append(
        spark.createDataset(Seq(
          up(s"old$b", (b + 1) * hourUs), up(s"new$b", nowUs - 60000000L)
        ))(StreamElement.encoder))
    }
    // blob: two roll periods, one fully expired
    op.family("blob-log").asInstanceOf[graft.streaming.BlobLogFamily]
      .append(spark.createDataset(Seq(
        up("b-old", 2L * hourUs), up("b-new", nowUs - 60000000L)
      ))(StreamElement.encoder))

    val report = Maintenance.run(op, nowUs)
    assert(report.map(a => (a.family, a.kind)).toSet ==
      Set(("flat-log", "compact"), ("blob-log", "expire-periods")))

    val flatLeft = flat.batchUpdates().collect()
    assert(flatLeft.length == 3 && flatLeft.forall(_.key.startsWith("new")))
    val blobLeft = op.family("blob-log").batchUpdates().collect()
    assert(blobLeft.map(_.key).toSeq == Seq("b-new"))
  }

  test("durations parse exactly; bad units refuse") {
    assert(Maintenance.durationUs("30s") == 30000000L)
    assert(Maintenance.durationUs("10d") == 864000000000L)
    intercept[IllegalArgumentException](Maintenance.durationUs("10w"))
    intercept[IllegalArgumentException](Maintenance.durationUs("h"))
  }
}
