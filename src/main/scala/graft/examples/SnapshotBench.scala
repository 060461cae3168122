package graft.examples

import graft.GraftSession
import graft.operators.{LatestWithTombstones, SnapshotCompact}
import graft.sources.Tables

/** Micro-benchmark: two-pass (max_by + tombstone join) vs single-pass
  * (custom Aggregator) snapshot compaction.
  */
object SnapshotBench {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local()
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    val log = Tables.eventsAsChangelog(spark, sf)
    // warm-up
    SnapshotCompact.snapshot(log).count()
    LatestWithTombstones.snapshot(log).count()
    Seq.tabulate(3) { _ =>
      val t0 = System.nanoTime()
      val c1 = SnapshotCompact.snapshot(log).count()
      val t1 = System.nanoTime()
      val c2 = LatestWithTombstones.snapshot(log).count()
      val t2 = System.nanoTime()
      println(f"two-pass: ${(t1 - t0) / 1e9}%.2fs ($c1 rows)  " +
        f"single-pass: ${(t2 - t1) / 1e9}%.2fs ($c2 rows)")
    }
    spark.stop()
  }
}
