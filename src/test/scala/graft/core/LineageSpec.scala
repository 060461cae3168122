package graft.core

import java.nio.file.Files

import graft.SparkSpec

class LineageSpec extends SparkSpec {

  private def withConf[A](value: Option[String])(body: => A): A = {
    val prev = spark.conf.getOption(Lineage.ConfKey)
    value match {
      case Some(v) => spark.conf.set(Lineage.ConfKey, v)
      case None => spark.conf.unset(Lineage.ConfKey)
    }
    try body
    finally prev match {
      case Some(v) => spark.conf.set(Lineage.ConfKey, v)
      case None => spark.conf.unset(Lineage.ConfKey)
    }
  }

  test("cut without the conf is a local checkpoint (lineage truncated)") {
    withConf(None) {
      val cut = Lineage.cut(spark.range(10).toDF().filter("id >= 0"))
      // the returned plan must be a materialized leaf (LogicalRDD), not
      // the original filter lineage — this is what would regress if cut
      // silently stopped checkpointing
      assert(cut.queryExecution.analyzed.getClass.getSimpleName
        == "LogicalRDD", cut.queryExecution.analyzed)
      assert(cut.count() === 10)
    }
  }

  test("cut with spark.graft.checkpoint.dir writes reliable checkpoints") {
    val dir = Files.createTempDirectory("graft-ckpt-").toString
    withConf(Some(dir)) {
      val cut = Lineage.cut(spark.range(100).toDF())
      assert(cut.count() === 100)
      // reliable checkpoint files landed under the configured dir
      def files(f: java.io.File): Seq[java.io.File] = {
        val kids = Option(f.listFiles()).map(_.toSeq).getOrElse(Seq.empty)
        kids ++ kids.filter(_.isDirectory).flatMap(files)
      }
      assert(files(new java.io.File(dir)).exists(_.isFile),
        s"no checkpoint files under $dir")
    }
  }

  test("cut(eager=false) with the conf set is deliberately eager + correct") {
    // the reliable path ignores the laziness hint (lazy reliable
    // checkpoints would double-compute — see the Lineage.cut scaladoc);
    // this pins the contract: conf + eager=false still yields a reliably
    // checkpointed, correct leaf, and the temporary pin is released
    val dir = Files.createTempDirectory("graft-ckpt-lazy-").toString
    withConf(Some(dir)) {
      // the context's checkpoint dir is first-one-wins for the app's
      // lifetime (a prior test may own it) — count files in the ACTUAL dir
      def files(f: java.io.File): Seq[java.io.File] = {
        val kids = Option(f.listFiles()).map(_.toSeq).getOrElse(Seq.empty)
        kids ++ kids.filter(_.isDirectory).flatMap(files)
      }
      def ckptFiles(): Int =
        spark.sparkContext.getCheckpointDir.map(d => files(new java.io.File(
          new java.net.URI(d).getPath)).count(_.isFile)).getOrElse(0)
      val in = spark.range(50).toDF().filter("id % 2 = 0")
      val before = ckptFiles()
      val cut = Lineage.cut(in, eager = false)
      // eager on this path: checkpoint files exist BEFORE any caller
      // action, and the returned plan is already a leaf
      assert(ckptFiles() > before,
        "reliable cut must be eager: no new checkpoint files before an action")
      assert(cut.queryExecution.analyzed.getClass.getSimpleName == "LogicalRDD",
        cut.queryExecution.analyzed)
      assert(cut.count() === 25)
      // the internal pin was released (caller did not persist `in`)
      assert(in.storageLevel == org.apache.spark.storage.StorageLevel.NONE)
    }
  }

  test("iterative loops survive and stay correct with the flag set") {
    // the real consumer: connected components over a 2-component graph,
    // every round cutting lineage through the reliable path
    val s = spark; import s.implicits._
    val dir = Files.createTempDirectory("graft-ckpt-cc-").toString
    withConf(Some(dir)) {
      val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("a_id", "b_id")
      val got = graft.functions.Clusters.connectedComponents(pairs)
        .as[(Long, Long)].collect().toMap
      assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
    }
  }
}
