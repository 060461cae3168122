package graft.core

import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.storage.StorageLevel

import graft.SparkSpec
import graft.SparkSpec.spark.implicits._

/** The swap-pin registry after the r11 session scoping: keys are scoped by
  * the pinned frame's SparkSession, so two sessions sharing a call-site
  * key can no longer release each other's pins mid-plan (the r11 ADVICE
  * finding); release/releaseAll still cover every session.
  */
class CachePinsSpec extends SparkSpec {

  private def pinned(df: org.apache.spark.sql.DataFrame): Boolean =
    df.storageLevel != StorageLevel.NONE

  test("same key in two sessions: pins coexist; swap releases only its session's") {
    val other = GraftSqlBridge.cloneSession(spark)
    val a = Seq(1, 2, 3).toDF("x")
    val b = GraftSqlBridge.rebind(Seq(4, 5).toDF("x"), other)
    try {
      val pa = CachePins.swap("spec.shared", a)
      val pb = CachePins.swap("spec.shared", b)
      assert(pinned(pa), "session A's pin must survive session B's swap")
      assert(pinned(pb))
      // a re-swap in B releases B's previous pin, never A's
      val pb2 = CachePins.swap("spec.shared",
        GraftSqlBridge.rebind(Seq(6).toDF("x"), other))
      assert(!pinned(pb), "B's old pin must be released by B's swap")
      assert(pinned(pa), "A's pin must still be live")
      assert(pinned(pb2))
    } finally CachePins.release("spec.shared")
    ()
  }

  test("release(key) and releaseAll cover every session holding the key") {
    val other = GraftSqlBridge.cloneSession(spark)
    val pa = CachePins.swap("spec.rel", Seq(1).toDF("x"))
    val pb = CachePins.swap("spec.rel",
      GraftSqlBridge.rebind(Seq(2).toDF("x"), other))
    CachePins.release("spec.rel")
    assert(!pinned(pa) && !pinned(pb),
      "release(key) must unpin the key in BOTH sessions")
    val pc = CachePins.swap("spec.rel2", Seq(3).toDF("x"))
    CachePins.releaseAll()
    assert(!pinned(pc))
  }

  test("swap keeps the pin alive across the returned frame's actions") {
    val p = CachePins.swap("spec.live", Seq(1, 2).toDF("x"))
    try {
      assert(p.count() == 2)
      assert(pinned(p), "the pin must survive the action (not finally-released)")
    } finally CachePins.release("spec.live")
    ()
  }
}
