package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.core.StreamElement
import graft.operators.LatestWithTombstones
import graft.streaming.{EventTimeWindows, StateOps}

/** The reference's signature test pattern: ONE abstract operator-semantics
  * suite instantiated per engine mode (reference: tools/.../GroovyEnvTest
  * .java:41 abstract suite run by BeamGroovyEnvTest and per-runner
  * BeamWindowedStream{Direct,Flink}Test). Here the two "engines" are the
  * batch lowering and the Structured Streaming lowering of the same
  * operators — both must produce identical results for identical inputs.
  */
abstract class DualModeSemantics extends SparkSpec {

  /** Engine under test. */
  def modeName: String
  def windowedCounts(elems: Seq[StreamElement], sizeMs: Long): Map[(Long, String), Long]
  def snapshot(elems: Seq[StreamElement]): Set[(String, String)]
  def integrate(elems: Seq[StreamElement]): Map[String, Double]

  protected def up(key: String, attr: String, stampUs: Long, v: String = "v",
      seq: Long = 0) =
    StreamElement("e", key, attr, s"u-$key-$attr-$stampUs-$seq", seq, stampUs,
      v.getBytes("UTF-8"), delete = false, deleteWildcard = false)

  protected def delWc(key: String, prefix: String, stampUs: Long) =
    StreamElement("e", key, prefix + "*", s"w-$key-$stampUs", 0, stampUs, null,
      delete = true, deleteWildcard = true)

  test(s"[$modeName] tumbling windowed counts per key") {
    // 10ms windows (stamps in micros): k has 2 in [0,10ms) and 1 in [10,20)
    val elems = Seq(up("k", "a", 1000), up("k", "a", 9000), up("k", "a", 12000),
      up("j", "a", 500))
    assert(windowedCounts(elems, 10) ==
      Map((0L, "k") -> 2L, (10000L, "k") -> 1L, (0L, "j") -> 1L))
  }

  test(s"[$modeName] snapshot honors delete + wildcard-delete tombstones") {
    val elems = Seq(
      up("k", "device.1", 1), up("k", "device.2", 2),
      delWc("k", "device.", 5),
      up("k", "device.3", 7), up("k", "status", 3))
    assert(snapshot(elems) == Set(("k", "device.3"), ("k", "status")))
  }

  test(s"[$modeName] integratePerKey accumulates in event-time order") {
    val elems = Seq(up("k", "a", 3, "100"), up("k", "a", 1, "1"),
      up("k", "a", 2, "10"), up("j", "a", 1, "5"))
    assert(integrate(elems) == Map("k" -> 111.0, "j" -> 5.0))
  }
}

/** Batch engine: the Dataset lowerings. */
class BatchSemantics extends DualModeSemantics {
  def modeName = "batch"

  def windowedCounts(elems: Seq[StreamElement], sizeMs: Long): Map[(Long, String), Long] = {
    import org.apache.spark.sql.functions._
    spark.createDataset(elems)(StreamElement.encoder)
      .withColumn("eventTime", timestamp_micros(col("stamp")))
      .groupBy(window(col("eventTime"), s"$sizeMs milliseconds"), col("key"))
      .count()
      .select(unix_micros(col("window.start")), col("key"), col("count"))
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
  }

  def snapshot(elems: Seq[StreamElement]): Set[(String, String)] =
    LatestWithTombstones.snapshot(
      spark.createDataset(elems)(StreamElement.encoder))
      .collect().map(e => (e.key, e.attribute)).toSet

  def integrate(elems: Seq[StreamElement]): Map[String, Double] = {
    import graft.api._
    GStream.ofElements(spark.createDataset(elems)(StreamElement.encoder))
      .integratePerKey[String, Double](_.key,
        e => new String(e.value, "UTF-8").toDouble, 0.0, _ + _)(
        org.apache.spark.sql.Encoders.STRING,
        org.apache.spark.sql.Encoders.tuple(
          org.apache.spark.sql.Encoders.STRING,
          org.apache.spark.sql.Encoders.scalaLong,
          org.apache.spark.sql.Encoders.scalaDouble),
        org.apache.spark.sql.Encoders.tuple(
          org.apache.spark.sql.Encoders.STRING,
          org.apache.spark.sql.Encoders.scalaDouble))
      .collect().groupBy(_._1).map { case (k, xs) => k -> xs.map(_._2).max }
  }
}

/** Streaming engine: MemoryStream + stateful operators, update-mode memory
  * sink, latest emission per group wins.
  */
class StreamingSemantics extends DualModeSemantics {
  def modeName = "streaming"
  private var n = 0
  private def nextName(): String = { n += 1; s"dualmode_$n" }

  private def runStream[A](elems: Seq[StreamElement])(
      build: org.apache.spark.sql.Dataset[StreamElement] => org.apache.spark.sql.DataFrame)(
      read: String => A): A = {
    implicit val sq = spark.sqlContext
    implicit val enc = StreamElement.encoder
    val input = MemoryStream[StreamElement]
    val name = nextName()
    val q = build(input.toDS()).writeStream.format("memory")
      .queryName(name).outputMode("update").start()
    try {
      // feed in two batches to exercise cross-batch state
      val (a, b) = elems.splitAt(elems.size / 2)
      input.addData(a: _*)
      q.processAllAvailable()
      input.addData(b: _*)
      q.processAllAvailable()
      read(name)
    } finally q.stop()
  }

  def windowedCounts(elems: Seq[StreamElement], sizeMs: Long): Map[(Long, String), Long] =
    runStream(elems) { ds =>
      import org.apache.spark.sql.functions._
      EventTimeWindows.withEventTime(ds, allowedLatenessMs = 60000)
        .groupBy(window(col("eventTime"), s"$sizeMs milliseconds"), col("key"))
        .count()
        .select(unix_micros(col("window.start")).as("w"), col("key"), col("count"))
    } { name =>
      // update mode re-emits a group on change; last emission wins
      spark.sql(s"SELECT * FROM $name").collect()
        .map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    }

  def snapshot(elems: Seq[StreamElement]): Set[(String, String)] =
    runStream(elems)(ds => StateOps.snapshotUpdates(ds).toDF()) { name =>
      val rows = spark.sql(
        s"SELECT key, attribute, delete FROM $name").collect()
      info(s"emissions: ${rows.map(r => (r.getString(0), r.getString(1), r.getBoolean(2))).mkString(", ")}")
      // fold the emission changelog: last change per (key, attr) wins
      val folded = rows.zipWithIndex
        .groupBy(r => (r._1.getString(0), r._1.getString(1)))
        .map { case (k, rs) => k -> rs.maxBy(_._2)._1.getBoolean(2) }
      // NB: .collect on a Map producing pairs would rebuild a Map and
      // collapse entries sharing ._1 — use filter + keySet
      folded.filterNot(_._2).keySet
    }

  def integrate(elems: Seq[StreamElement]): Map[String, Double] =
    runStream(elems) { ds =>
      StateOps.integratePerKey(ds, 0.0,
        e => new String(e.value, "UTF-8").toDouble, _ + _).toDF("key", "stamp", "run")
    } { name =>
      spark.sql(s"SELECT key, max(run) AS r FROM $name GROUP BY key")
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    }
}
