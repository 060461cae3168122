package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec
import graft.SparkSpec.spark.implicits._
import graft.functions.MinHashLsh

/** Streaming near-dup gate: the per-row signature must be bit-identical
  * to the batch columnar signature, and documents arriving in later
  * micro-batches must be flagged against state built by earlier ones.
  */
class StreamingDedupSpec extends SparkSpec {

  private val textA = "the quick brown fox jumps over the lazy dog again"
  private val textB = "completely different content about something else entirely here"
  private val textC = "third unique document body with its own words inside"

  test("per-row signature is bit-identical to the batch columnar one") {
    val docs = Seq((1L, textA), (2L, textB), (3L, textC)).toDF("doc_id", "text")
    val batch = MinHashLsh.signature(docs, "text", 3, 8).collect()
      .map(r => r.getLong(0) -> (1 to 8).map(i => r.getLong(i)).toSeq).toMap
    Seq((1L, textA), (2L, textB), (3L, textC)).foreach { case (id, t) =>
      assert(StreamingDedup.signature(t, 3, 8).toSeq == batch(id),
        s"doc $id signature diverged from the columnar lowering")
    }
  }

  test("later batches are flagged against earlier state; uniques pass") {
    implicit val sq = spark.sqlContext
    val in = MemoryStream[(Long, String)]
    val q = StreamingDedup.bandHits(in.toDS())
      .writeStream.format("memory").queryName("dedup_gate")
      .outputMode("update").start()
    try {
      // batch 1: one unique doc + two identical docs
      in.addData((1L, textA), (2L, textB), (3L, textB))
      q.processAllAvailable()
      def dups(): Map[Long, Set[Long]] = spark.table("dedup_gate")
        .collect()
        .groupBy(_.getLong(0))
        .view.mapValues(_.flatMap(r =>
          Option(r.get(3)).map(_.toString.toLong)).toSet).toMap
      val d1 = dups()
      assert(d1(1L).isEmpty, "unique doc must not be flagged")
      assert(d1(2L).isEmpty, "bucket owner must not be flagged")
      assert(d1(3L) == Set(2L), "in-batch twin flags against the owner")
      // batch 2: a dup of doc 1 (from the PREVIOUS batch) + a fresh unique
      in.addData((10L, textA), (11L, textC))
      q.processAllAvailable()
      val d2 = dups()
      assert(d2(10L) == Set(1L), "cross-batch dup must flag against stored state")
      assert(d2(11L).isEmpty, "fresh unique content passes the gate")
    } finally q.stop()
  }
}
