package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.SparkSpec.spark.implicits._
import graft.functions.Curation

/** Stream/batch parity for the stateless curation stages: the quality
  * gate and PII redaction are pure per-row column expressions, so the
  * SAME code runs unchanged over a streaming DataFrame and yields the
  * rows the batch pass yields — the ingestion-time half of a curation
  * pipeline (the stateful near-dup gate is `StreamingDedup`).
  */
class StreamingCurationSpec extends SparkSpec {

  private val docs = Seq(
    (1L, "mail me at a@b.org " + Seq.fill(40)("tok").zipWithIndex
      .map { case (t, i) => s"$t$i" }.mkString(" ")),
    (2L, "too short"),
    (3L, "spam " * 50 + "from 10.1.2.3"), // repetitious: fails the gate
    (4L, (1 to 60).map(i => s"w$i").mkString(" ") + " call +42077712345")
  ).toDF("doc_id", "text")

  private def gate(df: org.apache.spark.sql.DataFrame) = {
    val t = split(trim(col("text")), "\\s+")
    Curation.redactPii(
      df.filter(size(t) >= 30 && size(array_distinct(t)) * 100 >= size(t) * 35),
      "text")
  }

  test("streaming quality gate + redaction equals the batch pass") {
    val expected = gate(docs).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet
    assert(expected.map(_._1) == Set(1L, 4L))
    assert(expected.forall { case (_, red, _, _, _) =>
      !red.contains("@") && !red.contains("10.1.2.3") && !red.contains("+420") })

    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(Long, String)]
    val q = gate(in.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("cur_gate")
      .outputMode("append").start()
    try {
      in.addData(docs.collect().map(r => (r.getLong(0), r.getString(1))).toSeq: _*)
      q.processAllAvailable()
      val got = spark.table("cur_gate").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
          r.getLong(4))).toSet
      assert(got == expected)
    } finally q.stop()
  }
}
