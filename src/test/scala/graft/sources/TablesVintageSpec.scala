package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Testdata-vintage hardening for the two LLM-pipeline tables (the same
  * defense EventsVintageSpec gives `events.ts`): the driver regenerates
  * `/root/testdata` between rounds and has silently changed physical
  * encodings before. `Tables.documents`/`Tables.embeddings` must accept
  * exactly the encodings whose engine-vs-oracle semantics are verified
  * (STRING text + integral doc_id; FLOAT[]/DOUBLE[] embeddings) and
  * refuse anything else loudly at the read point — and the typed vector
  * kernels must produce IDENTICAL doubles from a float vintage and its
  * exact-widened double re-encoding.
  */
class TablesVintageSpec extends SparkSpec {
  import SparkSpec.spark.implicits._

  private def dir(): String =
    Files.createTempDirectory("graft-tvintage-").toString + "/sf"

  private val vecs: Seq[(Long, Seq[Float], Int)] = (0L until 12L).map { i =>
    (i, (0 until 8).map(j => ((i * 31 + j * 7) % 13).toFloat / 13.0f - 0.4f),
      (i % 3).toInt)
  }

  test("FLOAT[] and exact-widened DOUBLE[] embeddings read identically") {
    val fd = dir()
    vecs.toDF("vec_id", "embedding", "label")
      .write.parquet(fd + "/embeddings.parquet")
    val dd = dir()
    vecs.map { case (i, v, l) => (i, v.map(_.toDouble), l) }
      .toDF("vec_id", "embedding", "label")
      .write.parquet(dd + "/embeddings.parquet")

    def readAll(d: String): Map[Long, Seq[Double]] =
      graft.functions.Similarity.vecRows(Tables.embeddings(spark, d))
        .collect().map { case (id, v) => id -> v.toSeq }.toMap

    val f = readAll(fd)
    val w = readAll(dd)
    assert(f == w, "float→double widening must be exact (same doubles)")

    // the quantization probe (the q_embed_* basis) agrees bit-for-bit too
    def quant(d: String): Set[(Long, Long, Long)] =
      graft.functions.Pca.quantProbe(Tables.embeddings(spark, d),
        "vec_id", "embedding")
        .as[(Long, Long, Long)].collect().toSet
    assert(quant(fd) == quant(dd))
  }

  test("a non-float embedding element type fails loudly at the read point") {
    val d = dir()
    vecs.map { case (i, v, l) => (i, v.map(_.toString), l) }
      .toDF("vec_id", "embedding", "label")
      .write.parquet(d + "/embeddings.parquet")
    val e = intercept[IllegalStateException] { Tables.embeddings(spark, d) }
    assert(e.getMessage.contains("unknown testdata vintage"))
  }

  test("a non-integral vec_id fails loudly at the read point") {
    val d = dir()
    vecs.map { case (i, v, l) => (i.toString, v, l) }
      .toDF("vec_id", "embedding", "label")
      .write.parquet(d + "/embeddings.parquet")
    val e = intercept[IllegalStateException] { Tables.embeddings(spark, d) }
    assert(e.getMessage.contains("unknown testdata vintage"))
  }

  test("documents: STRING text + integral doc_id pass, others refuse") {
    val ok = dir()
    Seq((1L, "hello world", "en", "web", 11L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(ok + "/documents.parquet")
    assert(Tables.documents(spark, ok).count() == 1)

    val binText = dir()
    Seq((1L, "hello".getBytes("UTF-8"), "en"))
      .toDF("doc_id", "text", "lang")
      .write.parquet(binText + "/documents.parquet")
    val e1 = intercept[IllegalStateException] { Tables.documents(spark, binText) }
    assert(e1.getMessage.contains("documents.text"))

    val strId = dir()
    Seq(("1", "hello", "en")).toDF("doc_id", "text", "lang")
      .write.parquet(strId + "/documents.parquet")
    val e2 = intercept[IllegalStateException] { Tables.documents(spark, strId) }
    assert(e2.getMessage.contains("documents.doc_id"))
  }

  test("ANN kernels are vintage-agnostic: brute-force top-k identical " +
    "across float and double encodings") {
    val fd = dir()
    vecs.toDF("vec_id", "embedding", "label")
      .write.parquet(fd + "/embeddings.parquet")
    val dd = dir()
    vecs.map { case (i, v, l) => (i, v.map(_.toDouble), l) }
      .toDF("vec_id", "embedding", "label")
      .write.parquet(dd + "/embeddings.parquet")
    def topk(d: String): Set[(Long, Int, Long, Double)] =
      graft.functions.Similarity
        .bruteForceTopK(Tables.embeddings(spark, d), col("vec_id") < 3, 4)
        .select(col("q_id").cast("long"), col("rk").cast("int"),
          col("neighbor_id").cast("long"), col("cos"))
        .as[(Long, Int, Long, Double)].collect().toSet
    assert(topk(fd) == topk(dd))
  }
}
