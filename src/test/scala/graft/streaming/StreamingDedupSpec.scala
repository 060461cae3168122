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

  test("firstClaim: cross-batch claims by key, within-batch min wins") {
    implicit val sq = spark.sqlContext
    val in = MemoryStream[(Long, Long)] // (doc_id, key_h)
    val q = StreamingDedup.firstClaim(in.toDS())
      .writeStream.format("memory").queryName("url_gate")
      .outputMode("update").start()
    try {
      // batch 1: key 100 arrives twice OUT OF ORDER — the smaller id
      // must claim; key 200 is unique
      in.addData((7L, 100L), (3L, 100L), (5L, 200L))
      q.processAllAvailable()
      def claims(): Map[Long, Option[Long]] = spark.table("url_gate")
        .collect()
        .map(r => r.getLong(0) ->
          Option(r.get(2)).map(_.toString.toLong)).toMap
      val c1 = claims()
      assert(c1(3L).isEmpty, "smaller id claims the key")
      assert(c1(7L) == Some(3L))
      assert(c1(5L).isEmpty)
      // batch 2: key 100 again (defers to stored claimant), key 300 fresh
      in.addData((1L, 100L), (9L, 300L))
      q.processAllAvailable()
      val c2 = claims()
      assert(c2(1L) == Some(3L),
        "a later-batch smaller id still defers to the stored claimant")
      assert(c2(9L).isEmpty)
    } finally q.stop()
  }

  test("horizon gate: an idle bucket is evicted and its next occupant claims it fresh") {
    import scala.concurrent.duration._
    implicit val sq = spark.sqlContext
    val in = MemoryStream[(Long, String, Long)]
    val q = StreamingDedup.bandHitsWithHorizon(in.toDS(), horizon = 5000.millis)
      .writeStream.format("memory").queryName("dedup_horizon")
      .outputMode("update").start()
    try {
      def dupsOf(id: Long): Set[Long] = spark.table("dedup_horizon")
        .collect().filter(_.getLong(0) == id)
        .flatMap(r => Option(r.get(3)).map(_.toString.toLong)).toSet
      // doc 1 claims textA's buckets at t=10000
      in.addData((1L, textA, 10000L))
      q.processAllAvailable()
      // inside the horizon a twin is flagged against the stored owner
      in.addData((2L, textA, 12000L))
      q.processAllAvailable()
      assert(dupsOf(2L) == Set(1L), "within-horizon dup flags against the owner")
      // unrelated docs push the lagged watermark (max stamp − 5000) past
      // the bucket's last arrival (12000); the poke batch services the
      // eviction
      in.addData((50L, textB, 25000L))
      q.processAllAvailable()
      in.addData((51L, textC, 25500L))
      q.processAllAvailable()
      // the bucket was evicted: the same text now claims it fresh — no
      // flag, the gate remembers only the horizon window
      in.addData((3L, textA, 26000L))
      q.processAllAvailable()
      assert(dupsOf(3L).isEmpty,
        "post-horizon occupant must claim the bucket fresh")
      // and a NEW twin inside the new window flags against the new owner
      in.addData((4L, textA, 27000L))
      q.processAllAvailable()
      assert(dupsOf(4L) == Set(3L), "new window, new owner")
    } finally q.stop()
  }

  test("documents too short to shingle are never candidates (batch " +
      "parity: zero signature rows, zero bands) — the all-MaxValue " +
      "sentinel must not collide every short doc with every other") {
    implicit val sq = spark.sqlContext
    val in = MemoryStream[(Long, String)]
    val q = StreamingDedup.bandHits(in.toDS())
      .writeStream.format("memory").queryName("dedup_short")
      .outputMode("update").start()
    try {
      // two UNRELATED sub-n-token docs + one real dup pair as control
      in.addData((1L, "hello world"), (2L, "totally unrelated"),
        (3L, textA), (4L, textA))
      q.processAllAvailable()
      val rows = spark.table("dedup_short").collect()
      val byDoc = rows.groupBy(_.getLong(0))
      assert(!byDoc.contains(1L) && !byDoc.contains(2L),
        "shingle-less docs band nowhere — the batch side emits no " +
          s"signature row for them (got ${rows.mkString(", ")})")
      assert(byDoc(4L).flatMap(r => Option(r.get(3)).map(_.toString.toLong))
        .toSet == Set(3L), "the control dup pair still flags")
    } finally q.stop()
  }
}
