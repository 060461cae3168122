package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

import graft.streaming.CommitLogFamily

/** Small-files maintenance for append-only parquet commit logs. Every
  * `append` is one atomic parquet commit, so a family ingesting from many
  * sources accumulates files far smaller than a sane scan unit — at
  * 100 TB the listing + footer + task-scheduling overhead of millions of
  * small files dominates the read path long before the bytes do
  * (the reference's bulk families roll files by period for the same
  * reason: direct/io-bulkfs roll intervals). [[compact]] rewrites a log
  * directory into files of ~`targetBytes` WITHOUT changing a single
  * element: read → coalesce to ceil(bytes/target) partitions →
  * stamp-sorted rewrite (so stamp-range reads prune row groups) →
  * directory swap under the family's own commit lock, so concurrent
  * APPENDS serialize against the swap and none is lost.
  *
  * Reader isolation contract: a reader whose scan races the swap can
  * observe a partially-swapped directory — plain parquet directories
  * have no manifest to version reads against (that transaction log is
  * exactly what table formats add, and is out of scope per SURVEY §7).
  * Run maintenance in the family's quiet window, as the reference's
  * bulk compactions do; writers need no window (the lock covers them).
  */
object FileCompaction {

  final case class Stats(filesBefore: Long, filesAfter: Long,
      bytes: Long, rows: Long)

  private def listDataFiles(spark: SparkSession, dir: String): Seq[(String, Long)] = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toSeq
      .filter(s => s.isFile && !s.getPath.getName.startsWith("_")
        && !s.getPath.getName.startsWith("."))
      .map(s => (s.getPath.toString, s.getLen))
  }

  /** Rewrite `family`'s log into ~`targetBytes` files; returns stats.
    * Data-preserving by construction (same elements, any order — the log
    * is an unordered multiset; consumers order by position columns).
    */
  def compact(family: CommitLogFamily, targetBytes: Long = 128L << 20): Stats =
    compactRetaining(family, Long.MinValue, targetBytes)

  /** [[compact]] that ALSO enforces a retention horizon: elements with
    * `stamp < keepFromUs` are dropped during the rewrite — one pass does
    * both maintenance jobs (the reference's bulk families age out whole
    * roll-period files; this is the element-precise form for flat logs).
    * Readers see the cutoff atomically with the swap.
    */
  def compactRetaining(family: CommitLogFamily, keepFromUs: Long,
      targetBytes: Long = 128L << 20): Stats =
    graft.core.CommitArbiter.withCommitLock(family) {
      val before = listDataFiles(family.spark, family.path)
      if (before.isEmpty) Stats(0, 0, 0, 0)
      else compactListed(family, before, keepFromUs, targetBytes)
    }

  private def compactListed(family: CommitLogFamily,
      before: Seq[(String, Long)], keepFromUs: Long,
      targetBytes: Long): Stats = {
      val spark = family.spark
      val bytes = before.map(_._2).sum
      val parts = math.max(1L, (bytes + targetBytes - 1) / targetBytes).toInt
      val staging = family.path + "_compacting"
      val trash = family.path + "/_compact_trash"
      val fs = new Path(family.path).getFileSystem(
        spark.sparkContext.hadoopConfiguration)
      // CRASH SAFETY: a previous run that died mid-swap leaves its bytes
      // in staging/trash — refuse to run (and to overwrite them) until an
      // operator resolves; silent data loss is the one unacceptable
      // outcome of a maintenance job
      require(!fs.exists(new Path(staging)) && !fs.exists(new Path(trash)),
        s"interrupted compaction detected: resolve $staging / $trash " +
          "before compacting again (all committed bytes are preserved there)")
      val kept = family.batchUpdates(from = keepFromUs)
      kept
        .repartition(parts)
        .sortWithinPartitions("stamp", "key", "attribute")
        .write.mode("overwrite").parquet(staging)
      // row count from the STAGED files, not a second full-log scan: a
      // count() on freshly-written parquet reads zero columns (row-group
      // metadata speed), while counting `kept` re-ran the whole read +
      // shuffle with the commit lock held, doubling every maintenance run
      val rows = spark.read.parquet(staging).count()
      // swap, never destroying the only copy: old files MOVE to an
      // underscore-prefixed trash dir (invisible to Spark's file index,
      // atomic per file), staged files move in, trash deleted LAST —
      // a crash at any point leaves every element on disk and the next
      // run fails loudly via the guard above
      fs.mkdirs(new Path(trash))
      before.foreach { case (f, _) =>
        val p = new Path(f)
        fs.rename(p, new Path(trash, p.getName))
      }
      listDataFiles(spark, staging).foreach { case (f, _) =>
        val src = new Path(f)
        fs.rename(src, new Path(family.path, src.getName))
      }
      fs.delete(new Path(staging), true)
      fs.delete(new Path(trash), true)
      Stats(before.size, listDataFiles(spark, family.path).size, bytes, rows)
  }
}
