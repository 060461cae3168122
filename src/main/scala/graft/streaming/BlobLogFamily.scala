package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructType}

import graft.core.StreamElement

/** Time-sliced bulk blob storage — the reference's object-store family
  * shape (reference: direct/io-blob/.../BlobLogReader.java:53 partitions
  * blobs by the stamp range their NAME carries;
  * direct/io-bulkfs/.../DefaultNamingConvention.java:44 rolls elements
  * into `yyyy/MM/` prefixes so a stamp-range read lists only matching
  * prefixes; bindings io-gcloud-storage / io-s3 put the same layout on
  * gs:// and s3://).
  *
  * Spark-first lowering: the roll period is a HIVE PARTITION COLUMN
  * (`roll=<periodStartStamp>`), so the reference's prefix arithmetic
  * becomes Catalyst partition pruning — `batchUpdates(from, until)`
  * carries a `roll` range predicate and the scan LISTS only the matching
  * period directories, exactly like `NamingConvention.prefixesOf`, but
  * enforced by the engine and visible in the plan (`PartitionFilters`).
  * A numeric roll value keeps the pruning arithmetic exact where the
  * reference's `yyyy/MM` string prefixes need calendar parsing; the
  * layout works unchanged on any Hadoop filesystem (file://, hdfs://,
  * s3a://, gs://).
  *
  * `rollSpan` is in the same unit as `StreamElement.stamp` (default one
  * day in micros — the unit every events-derived changelog here uses).
  */
final class BlobLogFamily(val spark: SparkSession, val path: String,
    val rollSpan: Long = 86400000000L) extends AttributeLogFamily {
  import StreamElement.encoder

  require(rollSpan > 0, s"rollSpan must be positive, got $rollSpan")

  /** One atomic commit per append, serialized per root directory (same
    * rationale as [[CommitLogFamily.append]]); elements land in their
    * roll period's partition directory.
    */
  def append(elems: Dataset[StreamElement]): Unit =
    graft.core.CommitArbiter.withCommitLock(this) {
      elems
        .withColumn("roll", expr(s"stamp - pmod(stamp, ${rollSpan}L)"))
        .write.mode("append").partitionBy("roll").parquet(path)
    }

  override def commitLockToken: String = s"blob:$path"
  override def commitLockPath: Option[String] = Some(s"$path/_commit.lock")

  /** Retention by ROLL PERIOD: drop every period directory that ends
    * at-or-before `keepFromUs` — whole-prefix deletion with zero data
    * read/rewrite, the way object-store bulk families age out (the
    * reference's bulk layouts delete by name prefix; io-bulkfs roll
    * files carry their stamp range for exactly this). Element-precise
    * retention belongs to flat logs
    * ([[graft.operators.FileCompaction.compactRetaining]]); here the
    * period containing the horizon SURVIVES whole — readers see the
    * cutoff floored to the previous period boundary. Returns the dropped
    * period starts.
    */
  def expirePeriods(keepFromUs: Long): Seq[Long] =
    graft.core.CommitArbiter.withCommitLock(this) {
      val p = new org.apache.hadoop.fs.Path(path)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (!fs.exists(p)) Seq.empty
      else {
        val dropped = fs.listStatus(p).toSeq
          .filter(_.getPath.getName.startsWith("roll="))
          .map(s => s.getPath -> s.getPath.getName.stripPrefix("roll=").toLong)
          .filter { case (_, start) => start + rollSpan <= keepFromUs }
          .sortBy(_._2)
        dropped.foreach { case (dir, _) => fs.delete(dir, true) }
        dropped.map(_._2)
      }
    }

  private def schemaWithRoll: StructType =
    encoder.schema.add("roll", LongType)

  private def nonEmpty: Boolean = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = org.apache.hadoop.fs.FileSystem.get(p.toUri,
      spark.sparkContext.hadoopConfiguration)
    fs.exists(p) && fs.listStatus(p).exists(_.getPath.getName.startsWith("roll="))
  }

  /** Stamp-range read with PARTITION pruning: the roll predicate floors
    * the range to period starts, so only overlapping period directories
    * are listed/read (BlobLogReader's name-range partition filter).
    */
  override def batchUpdates(from: Long = Long.MinValue,
      until: Long = Long.MaxValue): Dataset[StreamElement] = {
    if (!nonEmpty) StreamElement.emptyDs(spark)
    else {
      var df = spark.read.schema(schemaWithRoll)
        .option("basePath", path).parquet(path)
      if (from != Long.MinValue) {
        df = df.filter(col("roll") >= (from - floorMod(from)) &&
          col("stamp") >= from)
      }
      if (until != Long.MaxValue) {
        // a period containing until-1 must still be read; later ones not
        df = df.filter(col("roll") <= ((until - 1) - floorMod(until - 1)) &&
          col("stamp") < until)
      }
      df.drop("roll").as[StreamElement]
    }
  }

  private def floorMod(v: Long): Long = {
    val m = v % rollSpan
    if (m < 0) m + rollSpan else m
  }

  private def ensureDir(): Unit = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = org.apache.hadoop.fs.FileSystem.get(p.toUri,
      spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) fs.mkdirs(p)
  }

  override def streamFromOldest(): Dataset[StreamElement] = {
    ensureDir()
    spark.readStream.schema(schemaWithRoll)
      .option("basePath", path).parquet(path)
      .drop("roll").as[StreamElement]
  }
}
