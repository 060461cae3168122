package graft.queries

import java.nio.file.Files

import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec
import graft.core.StreamElement
import graft.streaming.CommitLogFamily

/** The staged-log replay-order contract several oracle rows verify
  * results THROUGH (the dedup gate's first-occupant, the pane ledger's
  * running counts): segments appended via `StagedLogs.appendOrdered`
  * must replay one-per-micro-batch in append order. The file streaming
  * source orders files by modification time, so the helper stamps
  * strictly increasing mtimes — equal mtimes from sub-second appends on
  * a coarse-granularity filesystem would otherwise make batch order
  * nondeterministic.
  */
class StagedLogsSpec extends SparkSpec {
  import SparkSpec.spark.implicits._

  private def elem(id: Long): StreamElement =
    StreamElement("e", s"k$id", "a", s"u$id", id, id,
      Array[Byte](1), delete = false, deleteWildcard = false)

  test("appendOrdered stamps strictly increasing per-segment mtimes") {
    val tmp = Files.createTempDirectory("graft-ordered-").toString
    val fam = new CommitLogFamily(spark, s"$tmp/log")
    try {
      StagedLogs.appendOrdered(fam, Seq(
        Seq(elem(0)).toDS(), Seq(elem(1)).toDS(), Seq(elem(2)).toDS()))
      val parts = new java.io.File(fam.path).listFiles()
        .filter(f => f.isFile && f.getName.startsWith("part-"))
      assert(parts.length == 3)
      // each part file carries the id of its only element in its row
      // group; pair (mtime, id) and demand mtime order == append order
      val byTime = parts.sortBy(_.lastModified()).map { f =>
        spark.read.schema(StreamElement.encoder.schema)
          .parquet(f.getPath).as[StreamElement].head().seqId
      }
      assert(parts.map(_.lastModified()).distinct.length == 3,
        "segment mtimes must be distinct")
      assert(byTime.toSeq == Seq(0L, 1L, 2L))
    } finally StagedLogs.deleteRecursively(tmp)
  }

  test("throttled replay delivers one staged segment per micro-batch, in order") {
    val tmp = Files.createTempDirectory("graft-ordered-").toString
    val fam = new CommitLogFamily(spark, s"$tmp/log")
    try {
      StagedLogs.appendOrdered(fam, Seq(
        Seq(elem(10), elem(11)).toDS(), Seq(elem(20)).toDS(),
        Seq(elem(30), elem(31)).toDS()))
      val batches = scala.collection.mutable.ArrayBuffer.empty[Seq[Long]]
      val q = fam.streamFromOldestThrottled(maxFilesPerTrigger = 1)
        .writeStream
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (b: org.apache.spark.sql.Dataset[StreamElement], _: Long) =>
          val ids = b.collect().map(_.seqId).toSeq.sorted
          batches.synchronized { batches += ids }
          ()
        }
        .start()
      q.awaitTermination(60000)
      assert(batches.toSeq == Seq(Seq(10L, 11L), Seq(20L), Seq(30L, 31L)),
        s"got $batches")
    } finally StagedLogs.deleteRecursively(tmp)
  }

  test("a failed staging deletes its scratch dir and is not cached") {
    val boom = intercept[RuntimeException] {
      StagedLogs.getOrStage(spark, "/nonexistent-sf", "spec-fail") { _ =>
        throw new RuntimeException("staging failed")
      }
    }
    assert(boom.getMessage == "staging failed")
    // a retry re-runs the stager (the failed attempt was not cached) —
    // and this time succeeds
    val fam = StagedLogs.getOrStage(spark, "/nonexistent-sf", "spec-fail") {
      f => StagedLogs.appendOrdered(f, Seq(Seq(elem(1)).toDS()))
    }
    try assert(fam.batchUpdates().count() == 1)
    finally StagedLogs.deleteRecursively(
      new java.io.File(fam.path).getParent)
  }
}
