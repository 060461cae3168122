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
  *
  * Deployment note (verified under `local-cluster[2,2,2048]`, see
  * [[graft.tools.LocalClusterSmoke]]): the EMBEDDED Derby test double is
  * single-JVM by Derby's architecture — an executor process opening the
  * same database directory fails LOUDLY with XSDB6 ("another instance
  * of Derby may have already booted"), a task failure, never silent
  * wrong data. On a multi-process cluster this binding needs what it
  * would have in production anyway: a NETWORKED database URL (the Spark
  * JDBC source then opens per-partition connections from executors,
  * which is the scan this class already plans). Only the test double is
  * driver-local, not the engine path.
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

  /** One cheap min/max probe sizes the `stamp` range split; the scan then
    * issues `numPartitions` parallel range queries (Spark's JDBC
    * partitioned read). Falls back to a single partition when the table is
    * empty or all stamps are equal.
    */
  def batchUpdates(from: Long = Long.MinValue,
      until: Long = Long.MaxValue): Dataset[StreamElement] = {
    val probe = spark.read.format("jdbc")
      .option("url", url).option("driver", driver)
      .option("dbtable",
        s"""(SELECT MIN("stamp") AS lo, MAX("stamp") AS hi FROM $table) probe""")
      .load().head()
    var reader = spark.read.format("jdbc")
      .option("url", url).option("dbtable", table).option("driver", driver)
    if (!probe.isNullAt(0) && probe.getLong(0) < probe.getLong(1))
      reader = reader
        .option("partitionColumn", "stamp")
        .option("lowerBound", probe.getLong(0))
        .option("upperBound", probe.getLong(1) + 1)
        .option("numPartitions", numPartitions)
    var df = reader.load()
    if (from != Long.MinValue) df = df.filter(col("stamp") >= from)
    if (until != Long.MaxValue) df = df.filter(col("stamp") < until)
    df.as[StreamElement](StreamElement.encoder)
  }

  def batchSnapshot(asOf: Long = Long.MaxValue): Dataset[StreamElement] =
    SnapshotCompact.snapshot(batchUpdates(), asOf)
}
