package graft.functions

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The staged cell-directory swap shared by the ANN serving stores
  * ([[IvfStore]], [[PqStore]]) — one implementation of the
  * [[graft.randomaccess.BucketedSnapshotStore]] discipline: Spark
  * refuses to overwrite a path it is reading from, and `localCheckpoint`
  * would make maintenance non-fault-tolerant (its blocks die with an
  * executor), so a rewrite lands in a sibling staging directory via the
  * normal committer and moves in by atomic per-directory rename. Old
  * directories move to an underscore-prefixed trash (invisible to
  * scans) deleted LAST, so an interruption at any point preserves every
  * row on disk and the next read or mutation refuses loudly until
  * resolved.
  */
private[functions] object CellSwap {

  private def fsOf(spark: SparkSession, path: String) =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** A crashed swap must fail the next READ loudly, not silently serve a
    * store with whole cells missing.
    */
  def requireClean(spark: SparkSession, path: String): Unit = {
    val f = fsOf(spark, path)
    require(!f.exists(new Path(path + "_staging")) &&
        !f.exists(new Path(path + "/_swap_trash")),
      s"interrupted cell swap detected: resolve ${path}_staging / " +
        s"$path/_swap_trash before using this store (all rows are " +
        "preserved there)")
  }

  /** Stage `replacement` (cells restricted to `affected`) and swap each
    * affected `cell=N` directory; a cell with no staged contents is
    * legitimately empty and just gets removed.
    */
  def swap(spark: SparkSession, path: String, replacement: DataFrame,
      affected: Seq[Int]): Unit = {
    val staging = path + "_staging"
    val trash = path + "/_swap_trash"
    val f = fsOf(spark, path)
    requireClean(spark, path)
    replacement.repartition(col("cell"))
      .sortWithinPartitions(col("cell"), col("vec_id"))
      .write.partitionBy("cell").mode("overwrite").parquet(staging)
    f.mkdirs(new Path(trash))
    affected.foreach { c =>
      val live = new Path(s"$path/cell=$c")
      val staged = new Path(s"$staging/cell=$c")
      if (f.exists(live)) f.rename(live, new Path(s"$trash/cell=$c"))
      if (f.exists(staged)) f.rename(staged, live)
    }
    f.delete(new Path(staging), true)
    f.delete(new Path(trash), true)
  }
}
