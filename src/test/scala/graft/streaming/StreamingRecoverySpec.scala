package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec
import graft.SparkSpec.spark.implicits._
import graft.core.StreamElement

/** Kill-and-restart recovery for the stateful streaming operators that
  * lacked one (VERDICT r10 item #6; RetractJoinRecoverySpec and the Kafka
  * seam established the pattern): a query restarted from its checkpoint
  * must continue from the PRE-restart state — dedup claims made before
  * the kill stay claimed, first-claim winners stay the winners, and the
  * snapshot state's version ordering survives so a stale post-restart
  * arrival cannot downgrade a recovered cell.
  */
class StreamingRecoverySpec extends SparkSpec {

  private def tmp(): String =
    Files.createTempDirectory("graft-recovery-").toString

  private def up(key: String, attr: String, stamp: Long, v: String) =
    StreamElement("e", key, attr, s"$key-$attr-$stamp", 0L, stamp,
      v.getBytes("UTF-8"), delete = false, deleteWildcard = false)

  test("bandHits (q_dedup_stream): pre-restart bucket claims survive the restart") {
    implicit val sq = spark.sqlContext
    val cp = tmp() + "/cp"
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[StreamingDedup.BandHit]()
    val input = MemoryStream[(Long, String)]
    val hits = StreamingDedup.bandHits(input.toDS())
    def start() = hits.writeStream
      .option("checkpointLocation", cp)
      .outputMode("update")
      .foreachBatch { (b: org.apache.spark.sql.Dataset[StreamingDedup.BandHit], _: Long) =>
        b.collect().foreach(seen.add)
      }
      .start()

    val text = "the quick brown fox jumps over the lazy dog again and again"
    // run 1: doc 1 claims every band bucket
    val q1 = start()
    try {
      input.addData((1L, text))
      q1.processAllAvailable()
    } finally q1.stop()
    val run1 = seen.toArray(Array.empty[StreamingDedup.BandHit])
    assert(run1.nonEmpty && run1.forall(_.dup_of.isEmpty),
      s"doc 1 must claim fresh buckets: ${run1.toSeq}")
    seen.clear()

    // run 2, SAME checkpoint: an identical doc must be flagged against
    // the PRE-restart claimant — possible only if the bucket state
    // survived the restart (a lost store would let doc 2 claim fresh)
    input.addData((2L, text))
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()
    val run2 = seen.toArray(Array.empty[StreamingDedup.BandHit])
    assert(run2.nonEmpty && run2.forall(_.dup_of.contains(1L)),
      s"doc 2 must be flagged dup_of=1 on every band: ${run2.toSeq}")
  }

  test("firstClaim (q_url_dedup_stream): the claimant survives the restart") {
    implicit val sq = spark.sqlContext
    val cp = tmp() + "/cp"
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[StreamingDedup.KeyClaim]()
    val input = MemoryStream[(Long, Long)] // (doc_id, key_h)
    val claims = StreamingDedup.firstClaim(input.toDS())
    def start() = claims.writeStream
      .option("checkpointLocation", cp)
      .outputMode("update")
      .foreachBatch { (b: org.apache.spark.sql.Dataset[StreamingDedup.KeyClaim], _: Long) =>
        b.collect().foreach(seen.add)
      }
      .start()

    val q1 = start()
    try {
      input.addData((7L, 42L), (9L, 43L))
      q1.processAllAvailable()
    } finally q1.stop()
    assert(seen.toArray(Array.empty[StreamingDedup.KeyClaim])
      .forall(_.dup_of.isEmpty))
    seen.clear()

    // restart: a later doc on a PRE-restart key must lose to the
    // recovered claimant; a fresh key claims normally
    input.addData((8L, 42L), (11L, 44L))
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()
    val run2 = seen.toArray(Array.empty[StreamingDedup.KeyClaim])
      .map(c => c.doc_id -> c.dup_of).toMap
    assert(run2 == Map(8L -> Some(7L), 11L -> None), run2.toString)
  }

  test("snapshotUpdates (CachedView maintenance): recovered version order " +
      "rejects a stale post-restart arrival") {
    implicit val sq = spark.sqlContext
    implicit val enc = StreamElement.encoder
    val cp = tmp() + "/cp"
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[StreamElement]()
    val input = MemoryStream[StreamElement]
    val updates = StateOps.snapshotUpdates(input.toDS())
    def start() = updates.writeStream
      .option("checkpointLocation", cp)
      .outputMode("update")
      .foreachBatch { (b: org.apache.spark.sql.Dataset[StreamElement], _: Long) =>
        b.collect().foreach(seen.add)
      }
      .start()

    // run 1: k.a = v1 @10 becomes the latest
    val q1 = start()
    try {
      input.addData(up("k", "a", 10, "v1"))
      q1.processAllAvailable()
    } finally q1.stop()
    assert(seen.toArray(Array.empty[StreamElement]).map(e =>
      new String(e.value, "UTF-8")).toSeq == Seq("v1"))
    seen.clear()

    // run 2, same checkpoint: an OLDER k.a arrives (stamp 5 < 10) plus a
    // fresh attribute. With the state recovered, the stale value loses
    // and k.a emits NOTHING; a lost store would emit v0 as the "latest"
    // — the downgrade a restarted CachedView must never serve
    input.addData(up("k", "a", 5, "v0"), up("k", "b", 20, "w1"))
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()
    val run2 = seen.toArray(Array.empty[StreamElement])
    assert(run2.map(_.attribute).toSeq == Seq("b"),
      s"only k.b may emit after the restart: ${run2.toSeq}")
  }

  test("CachedView re-assign on the same checkpoint: cache continuity, " +
      "no double-fold, stale arrivals rejected") {
    val fam = new CommitLogFamily(spark, tmp() + "/log")
    val cp = tmp() + "/ckpt"
    fam.append(Seq(up("k", "a", 10, "v1")))
    val view = new CachedView(fam).assign(cp)
    try {
      view.processAllAvailable()
      assert(view.get("k", "a").map(e => new String(e.value, "UTF-8"))
        .contains("v1"))
      // simulate the maintenance query dying: stop, then RE-assign the
      // same view on the same checkpoint (the documented re-assign path)
      view.stop()
      fam.append(Seq(up("k", "a", 5, "v0"), up("k2", "a", 20, "w1")))
      view.assign(cp)
      view.processAllAvailable()
      // pre-restart cache entry intact (checkpoint resume: batch 1 is
      // NOT replayed, so no double-fold), the stale v0 is rejected by
      // the recovered snapshot state, the new key arrives
      assert(view.get("k", "a").map(e => new String(e.value, "UTF-8"))
        .contains("v1"), "restart must not downgrade k.a to the stale v0")
      assert(view.get("k2", "a").map(e => new String(e.value, "UTF-8"))
        .contains("w1"))
    } finally view.stop()
  }

  test("CachedView re-assign of a DIFFERENT key range is a rebuild: the " +
      "same checkpoint refuses (it would skip the new range's history), " +
      "a fresh checkpoint drops the old range's cells and folds the new " +
      "range from oldest") {
    val fam = new CommitLogFamily(spark, tmp() + "/log-ranges")
    // partition of "a"/"b" under pmod(hash(key), 2): compute live so the
    // test never depends on hash internals
    val parts = Seq("a", "b").map { k =>
      k -> spark.range(1).select(
        org.apache.spark.sql.functions.pmod(org.apache.spark.sql.functions
          .hash(org.apache.spark.sql.functions.lit(k)),
          org.apache.spark.sql.functions.lit(2)))
        .collect().head.getInt(0)
    }.toMap
    assume(parts("a") != parts("b"), "need keys in distinct partitions")
    fam.append(Seq(up("a", "x", 10, "va"), up("b", "x", 10, "vb")))
    val view = new CachedView(fam)
    val cp1 = tmp() + "/ckpt1"
    try {
      view.assignPartitions(cp1, Set(parts("a")), 2)
      view.processAllAvailable()
      assert(view.get("a", "x").isDefined && view.get("b", "x").isEmpty)
      // same checkpoint + different range = refusal with guidance
      val e = intercept[IllegalArgumentException] {
        view.assignPartitions(cp1, Set(parts("b")), 2)
      }
      assert(e.getMessage.contains("fresh checkpoint"))
      // fresh checkpoint: rebuild — b's HISTORY (appended before this
      // assign) folds in, a's stale cells are gone
      view.assignPartitions(tmp() + "/ckpt2", Set(parts("b")), 2)
      view.processAllAvailable()
      assert(view.get("b", "x").map(e2 => new String(e2.value, "UTF-8"))
        .contains("vb"), "the new range's past elements must be folded")
      assert(view.get("a", "x").isEmpty,
        "the abandoned range must not serve stale cells")
    } finally view.stop()
  }

  test("a COLD view refuses to resume an existing checkpoint: empty " +
      "cache + committed offsets would silently serve an incomplete view") {
    val fam = new CommitLogFamily(spark, tmp() + "/log-cold")
    val cp = tmp() + "/ckpt-cold"
    fam.append(Seq(up("k", "a", 10, "v1")))
    val warm = new CachedView(fam).assign(cp)
    try {
      warm.processAllAvailable()
      assert(warm.get("k", "a").isDefined)
    } finally warm.stop()
    val cold = new CachedView(fam)
    val e = intercept[IllegalStateException] { cold.assign(cp) }
    assert(e.getMessage.contains("FRESH checkpoint"))
  }
}
