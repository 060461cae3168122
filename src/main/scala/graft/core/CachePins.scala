package graft.core

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.DataFrame

/** Keyed swap-pins for internally-persisted DataFrames.
  *
  * Several operators persist a DERIVED frame their callers never hold a
  * reference to (a deduped fingerprint index, a bigram-count table, the
  * distinct eval-gram set): the pin is essential for the plan — the frame
  * feeds two or three branches of the same query — but a per-call
  * `persist()` with no release path leaks one storage-memory entry per
  * invocation in a long-lived session.
  *
  * The registry bounds that leak to ONE live pin per call-site key:
  * [[swap]] persists the new frame and releases whatever the same key
  * pinned before, so an application calling the operator per batch holds
  * a single warm index at a time instead of an unbounded trail. The pin
  * stays alive across the RETURNED lazy frame's actions (the whole point
  * — the prior art here unpersisted in a `finally` before the caller
  * ever ran the plan) and is released on the next call or an explicit
  * [[release]]/[[releaseAll]].
  *
  * Concurrency note: keys are scoped PER SESSION (the pinned frame's
  * session UUID joins the map key), so two sessions scoring
  * through the same call-site never release each other's pins. Two
  * corpora scored concurrently through the same call-site IN ONE session
  * still share a key, so the second swap releases the first corpus's pin
  * mid-flight — the plan still computes correctly (Spark recomputes
  * evicted cache from lineage), it just loses the reuse. Sequential
  * per-batch use — the shape the leak finding targeted — is the design
  * point. Harnesses that call `spark.catalog.clearCache()` should call
  * [[releaseAll]] alongside it, or the registry retains handles to
  * frames whose cache was dropped behind its back (harmless — the next
  * swap releases them — but the plans stay referenced until then).
  */
object CachePins {

  /** Identity-equality session token. A bare `identityHashCode` is NOT
    * unique (two live sessions can collide, re-enabling exactly the
    * cross-session release the scoping exists to prevent); `eq`-based
    * equality is. Holding the session reference here retains nothing the
    * map's DataFrame values don't already retain through their own
    * `sparkSession` field.
    */
  private final class SessionRef(val session: AnyRef) {
    override def hashCode: Int = System.identityHashCode(session)
    override def equals(o: Any): Boolean = o match {
      case r: SessionRef => r.session eq session
      case _             => false
    }
  }

  private val pins = new ConcurrentHashMap[(SessionRef, String), DataFrame]()

  private def scoped(key: String, df: DataFrame): (SessionRef, String) =
    (new SessionRef(df.sparkSession), key)

  /** Persist `df` under `key`, releasing the key's previous pin (within
    * `df`'s session only).
    */
  def swap(key: String, df: DataFrame): DataFrame = {
    val pinned = df.persist()
    val prev = pins.put(scoped(key, df), pinned)
    if (prev != null && (prev ne pinned)) prev.unpersist(blocking = false)
    pinned
  }

  /** Persist at a caller-chosen storage level (e.g. MEMORY_AND_DISK). */
  def swap(key: String, df: DataFrame,
      level: org.apache.spark.storage.StorageLevel): DataFrame = {
    val pinned = df.persist(level)
    val prev = pins.put(scoped(key, df), pinned)
    if (prev != null && (prev ne pinned)) prev.unpersist(blocking = false)
    pinned
  }

  /** Release the pin under `key` in every session holding one. */
  def release(key: String): Unit = {
    val it = pins.keySet().iterator()
    while (it.hasNext) {
      val k = it.next()
      if (k._2 == key) {
        val prev = pins.remove(k)
        if (prev != null) { prev.unpersist(blocking = false); () }
      }
    }
  }

  /** Release every registered pin (harness/shutdown hook — Verify and
    * Bench call this at teardown; pair with any `clearCache()`).
    */
  def releaseAll(): Unit = {
    val it = pins.keySet().iterator()
    while (it.hasNext) {
      val prev = pins.remove(it.next())
      if (prev != null) { prev.unpersist(blocking = false); () }
    }
  }
}
