package graft.operators

import java.nio.file.Files

import graft.SparkSpec
import graft.core.StreamElement
import graft.streaming.CommitLogFamily

class FileCompactionSpec extends SparkSpec {

  private def up(i: Int) =
    StreamElement("e", s"k$i", "status", s"u$i", 0, i.toLong,
      s"v$i".getBytes("UTF-8"), delete = false, deleteWildcard = false)

  private def fam() = new CommitLogFamily(spark,
    Files.createTempDirectory("graft-compact-").toString + "/log")

  test("compaction reduces file count without changing a single element") {
    val f = fam()
    // 20 separate appends = 20+ small parquet files
    (0 until 20).foreach { b =>
      f.append(spark.createDataset(
        (b * 5 until b * 5 + 5).map(up))(StreamElement.encoder))
    }
    val before = f.batchUpdates().collect()
      .map(e => (e.key, e.stamp, new String(e.value))).toSet
    val stats = FileCompaction.compact(f, targetBytes = 1L << 30)
    assert(stats.filesBefore >= 20)
    assert(stats.filesAfter == 1, s"$stats")
    assert(stats.rows == 100)
    val after = f.batchUpdates().collect()
      .map(e => (e.key, e.stamp, new String(e.value))).toSet
    assert(after == before)
  }

  test("target size controls the output file count") {
    val f = fam()
    f.append(spark.createDataset((0 until 2000).map(up))(StreamElement.encoder))
    val one = FileCompaction.compact(f, targetBytes = 1L << 30)
    val total = one.bytes
    // recompact to ~quarter-size targets → ~4 files
    val quartered = FileCompaction.compact(f, targetBytes = math.max(1, total / 4))
    assert(quartered.filesAfter >= 3 && quartered.filesAfter <= 6,
      s"$quartered")
    assert(f.batchUpdates().count() == 2000)
  }

  test("appends after compaction keep working (streaming source included)") {
    val f = fam()
    f.append(spark.createDataset((0 until 10).map(up))(StreamElement.encoder))
    FileCompaction.compact(f)
    f.append(spark.createDataset((10 until 15).map(up))(StreamElement.encoder))
    assert(f.batchUpdates().count() == 15)
    // stamp-range pushdown still correct over compacted files
    assert(f.batchUpdates(from = 5, until = 12).count() == 7)
  }

  test("retention compaction drops pre-horizon elements atomically") {
    val f = fam()
    f.append(spark.createDataset((0 until 100).map(up))(StreamElement.encoder))
    val st = FileCompaction.compactRetaining(f, keepFromUs = 40)
    assert(st.rows == 60)
    val back = f.batchUpdates().collect()
    assert(back.length == 60 && back.forall(_.stamp >= 40))
  }

  test("an interrupted previous swap is detected, not destroyed") {
    val f = fam()
    f.append(spark.createDataset((0 until 10).map(up))(StreamElement.encoder))
    // simulate a crash that left staging behind
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(f.path + "_compacting"))
    val e = intercept[IllegalArgumentException] {
      FileCompaction.compact(f)
    }
    assert(e.getMessage.contains("interrupted compaction"))
    // resolving the leftover lets maintenance proceed
    new scala.reflect.io.Directory(new java.io.File(f.path + "_compacting"))
      .deleteRecursively()
    assert(FileCompaction.compact(f).rows == 10)
  }

  test("empty family compacts to empty stats") {
    assert(FileCompaction.compact(fam()) ==
      FileCompaction.Stats(0, 0, 0, 0))
  }
}
