package graft

import graft.core.StreamElement
import graft.operators.SnapshotCompact

package object api {

  /** StreamElement-specific operators (reference: WindowedStream
    * .reduceToLatest, WindowedStream.java:108 — THE snapshot op of
    * stream-table duality).
    */
  implicit class ElementStreamOps(private val s: GStream[StreamElement])
      extends AnyVal {
    /** Compact to the latest element per (key, attribute), honoring delete
      * and wildcard-delete tombstones.
      */
    def reduceToLatest(): GStream[StreamElement] =
      GStream.ofElements(SnapshotCompact.snapshot(s.ds))

    /** Latest element per (key, attribute) keeping tombstones visible. */
    def latestPerAttribute(): GStream[StreamElement] =
      GStream.ofElements(SnapshotCompact.latestPerAttribute(s.ds))
  }
}
