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
  * Concurrency note: two corpora scored concurrently through the same
  * call-site share a key, so the second swap releases the first corpus's
  * pin mid-flight — the plan still computes correctly (Spark recomputes
  * evicted cache from lineage), it just loses the reuse. Sequential
  * per-batch use — the shape the leak finding targeted — is the design
  * point.
  */
object CachePins {
  private val pins = new ConcurrentHashMap[String, DataFrame]()

  /** Persist `df` under `key`, releasing the key's previous pin. */
  def swap(key: String, df: DataFrame): DataFrame = {
    val pinned = df.persist()
    val prev = pins.put(key, pinned)
    if (prev != null && (prev ne pinned)) prev.unpersist(blocking = false)
    pinned
  }

  /** Persist at a caller-chosen storage level (e.g. MEMORY_AND_DISK). */
  def swap(key: String, df: DataFrame,
      level: org.apache.spark.storage.StorageLevel): DataFrame = {
    val pinned = df.persist(level)
    val prev = pins.put(key, pinned)
    if (prev != null && (prev ne pinned)) prev.unpersist(blocking = false)
    pinned
  }

  /** Release the pin under `key`, if any. */
  def release(key: String): Unit = {
    val prev = pins.remove(key)
    if (prev != null) { prev.unpersist(blocking = false); () }
  }

  /** Release every registered pin (harness/shutdown hook). */
  def releaseAll(): Unit = {
    val it = pins.keySet().iterator()
    while (it.hasNext) { release(it.next()) }
  }
}
