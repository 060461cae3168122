package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Fixed-n per-stratum sampling: exact stratum counts, agreement with
  * the window spelling (the oracle's definition), and invariance to
  * partitioning — the property classic order-dependent reservoir
  * sampling lacks.
  */
class ReservoirSpec extends SparkSpec {
  import SparkSpec.spark.implicits._

  // 3 strata of sizes 50, 7, 1 — n=5 exercises cap, undersized, singleton
  private def corpus = (
    (1L to 50L).map(i => ("a", i)) ++
    (101L to 107L).map(i => ("b", i)) ++
    Seq(("c", 201L))
  ).toDF("lang", "doc_id")

  private def windowSpelling(n: Int) = {
    import org.apache.spark.sql.expressions.Window
    val h = MinHashLsh.hash60(concat(lit("res:"), col("doc_id").cast("string")))
    corpus.select(col("lang"), col("doc_id"), h.as("h"))
      .withColumn("pos", row_number()
        .over(Window.partitionBy(col("lang")).orderBy(col("h"), col("doc_id")))
        .cast("long"))
      .filter(col("pos") <= n)
      .select(col("lang"), col("pos"), col("doc_id"))
  }

  test("exactly min(n, |stratum|) rows per stratum") {
    val counts = Reservoir.sampleByKey(corpus, "lang", "doc_id", 5, "res")
      .groupBy("lang").count().as[(String, Long)].collect().toMap
    assert(counts == Map("a" -> 5L, "b" -> 5L, "c" -> 1L))
  }

  test("sample equals the window spelling (the oracle definition)") {
    val agg = Reservoir.sampleByKey(corpus, "lang", "doc_id", 5, "res")
      .orderBy("lang", "pos").collect().toSeq
    val win = windowSpelling(5).orderBy("lang", "pos").collect().toSeq
    assert(agg == win)
  }

  test("partitioning-invariant: 1 vs 13 partitions, same sample") {
    val one = Reservoir
      .sampleByKey(corpus.repartition(1), "lang", "doc_id", 5, "res")
      .orderBy("lang", "pos").collect().toSeq
    val many = Reservoir
      .sampleByKey(corpus.repartition(13), "lang", "doc_id", 5, "res")
      .orderBy("lang", "pos").collect().toSeq
    assert(one == many && one.nonEmpty)
  }

  test("a different salt draws a different sample") {
    val a = Reservoir.sampleByKey(corpus, "lang", "doc_id", 5, "res")
      .select("doc_id").as[Long].collect().toSet
    val b = Reservoir.sampleByKey(corpus, "lang", "doc_id", 5, "res2")
      .select("doc_id").as[Long].collect().toSet
    assert(a != b, "independent salts must decorrelate the draw")
  }

  test("bounded buffer: reduce never holds more than n candidates") {
    val agg = new Reservoir.Agg(3)
    val buf = (1L to 100L).foldLeft(agg.zero) { (b, i) =>
      val nb = agg.reduce(b, Reservoir.Cand(h = 1000L - i, id = i))
      assert(nb.size <= 3, s"buffer grew past n: ${nb.size}")
      nb
    }
    // smallest three hashes are 900..902 (ids 100..98)
    assert(buf.map(_.h) == Seq(900L, 901L, 902L))
    // merge of two full buffers stays bounded and re-selects globally
    val other = (1L to 100L).foldLeft(agg.zero) { (b, i) =>
      agg.reduce(b, Reservoir.Cand(h = 500L + i, id = 1000L + i))
    }
    val merged = agg.merge(buf, other)
    assert(merged.size == 3 && merged.map(_.h) == Seq(501L, 502L, 503L))
  }

  test("n must be positive") {
    intercept[IllegalArgumentException] { new Reservoir.Agg(0) }
  }
}
