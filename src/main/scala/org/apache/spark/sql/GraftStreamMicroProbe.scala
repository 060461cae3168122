package org.apache.spark.sql

import org.apache.hadoop.fs.Path

import org.apache.spark.sql.execution.streaming.checkpointing.{CommitLog, CommitMetadata, OffsetSeq, OffsetSeqLog}
import org.apache.spark.sql.execution.streaming.runtime.LongOffset

/** Measurement-only scratch main: times the exact metadata-log writes a
  * micro-batch pays (offset WAL + commit log) against a local checkpoint
  * dir, to attribute the fixed per-batch cost observed in
  * [[graft.tools.StreamBatchProbe]]. Lives in the spark.sql package only
  * to reach the private[sql] streaming internals; never in any query or
  * bench path.
  */
object GraftStreamMicroProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local()
    Seq("spark.sql.streaming.checkpoint.fileChecksum.enabled",
      "spark.sql.streaming.checkpointFileManagerClass",
      "spark.sql.streaming.asyncLogPurge.enabled").foreach { k =>
      println(s"$k = ${spark.conf.getOption(k).getOrElse("<default/unreadable>")}")
    }
    val dir = java.nio.file.Files.createTempDirectory("cfm-probe").toString
    val offsets = new OffsetSeqLog(spark, s"$dir/offsets")
    val commits = new CommitLog(spark, s"$dir/commits")
    def time[A](label: String, n: Int)(f: Int => A): Unit = {
      val per = (0 until n).map { i =>
        val t0 = System.nanoTime(); f(i); (System.nanoTime() - t0) / 1e6
      }.sorted
      println(f"$label%-28s median ${per(n / 2)}%8.2f ms/op  p90 ${per(n * 9 / 10)}%8.2f  max ${per.last}%8.2f")
    }
    // warm-up JIT + FS caches
    (0 until 3).foreach(i => offsets.add(i, OffsetSeq.fill(LongOffset(i))))
    (0 until 3).foreach(i => commits.add(i, CommitMetadata()))
    time("offsetLog.add", 20)(i => offsets.add(100 + i, OffsetSeq.fill(LongOffset(i))))
    time("commitLog.add", 20)(i => commits.add(100 + i, CommitMetadata()))
    // the same two logs with file checksums off (fresh dirs, same JVM)
    spark.conf.set("spark.sql.streaming.checkpoint.fileChecksum.enabled", "false")
    val dir2 = java.nio.file.Files.createTempDirectory("cfm-probe2").toString
    val offsets2 = new OffsetSeqLog(spark, s"$dir2/offsets")
    val commits2 = new CommitLog(spark, s"$dir2/commits")
    (0 until 3).foreach(i => offsets2.add(i, OffsetSeq.fill(LongOffset(i))))
    (0 until 3).foreach(i => commits2.add(i, CommitMetadata()))
    time("offsetLog.add (no cksum)", 20)(i => offsets2.add(100 + i, OffsetSeq.fill(LongOffset(i))))
    time("commitLog.add (no cksum)", 20)(i => commits2.add(100 + i, CommitMetadata()))
    // raw Hadoop FS create+rename for comparison
    val p = new Path(dir)
    val hconf = spark.sessionState.newHadoopConf()
    val fs = p.getFileSystem(hconf)
    time("fs.create+close+rename", 20) { i =>
      val tmp = new Path(s"$dir/raw$i.tmp")
      val out = fs.create(tmp, true)
      out.write(("x" * 200).getBytes); out.close()
      fs.rename(tmp, new Path(s"$dir/raw$i"))
    }
    // the bare CheckpointFileManager createAtomic path (no metadata-log
    // bookkeeping), checksum wrapper off
    val dir3 = java.nio.file.Files.createTempDirectory("cfm-probe3").toString
    val cfm = org.apache.spark.sql.execution.streaming.checkpointing
      .CheckpointFileManager.create(new Path(dir3), hconf)
    time("cfm.createAtomic+close", 20) { i =>
      val out = cfm.createAtomic(new Path(s"$dir3/m$i"), overwriteIfPossible = true)
      out.write(("x" * 200).getBytes); out.close()
    }
    // metadata logs through the FileSystem-based manager (checksum still
    // off from above), then with checksum back on
    spark.conf.set("spark.sql.streaming.checkpointFileManagerClass",
      "org.apache.spark.sql.execution.streaming.checkpointing.FileSystemBasedCheckpointFileManager")
    val dir4 = java.nio.file.Files.createTempDirectory("cfm-probe4").toString
    val offsets4 = new OffsetSeqLog(spark, s"$dir4/offsets")
    val commits4 = new CommitLog(spark, s"$dir4/commits")
    (0 until 3).foreach(i => offsets4.add(i, OffsetSeq.fill(LongOffset(i))))
    (0 until 3).foreach(i => commits4.add(i, CommitMetadata()))
    time("offsetLog.add (fsMgr,noCk)", 20)(i => offsets4.add(100 + i, OffsetSeq.fill(LongOffset(i))))
    time("commitLog.add (fsMgr,noCk)", 20)(i => commits4.add(100 + i, CommitMetadata()))
    spark.conf.set("spark.sql.streaming.checkpoint.fileChecksum.enabled", "true")
    val dir5 = java.nio.file.Files.createTempDirectory("cfm-probe5").toString
    val offsets5 = new OffsetSeqLog(spark, s"$dir5/offsets")
    (0 until 3).foreach(i => offsets5.add(i, OffsetSeq.fill(LongOffset(i))))
    time("offsetLog.add (fsMgr,ck)", 20)(i => offsets5.add(100 + i, OffsetSeq.fill(LongOffset(i))))
    spark.stop()
  }
}
