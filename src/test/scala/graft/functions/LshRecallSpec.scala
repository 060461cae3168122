package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** LSH-cell ANN + recall evaluation laws on the real sf0.001 embeddings:
  * cell restriction is honored, recall arithmetic is the exact
  * intersection, zero-hit queries still appear, and full-cell
  * degeneration (nPlanes low) recovers brute-force recall 1.0.
  */
class LshRecallSpec extends SparkSpec {
  import SparkSpec.spark.implicits._

  private val dir = "/root/testdata/sf0.001"
  private def emb = graft.sources.Tables.embeddings(spark, dir)
  private val pred = col("vec_id") < 10

  test("approx neighbors share the query's LSH cell") {
    val cells = Similarity.lshCells(emb, nPlanes = 4)
    val approx = Similarity.lshCellTopK(emb, pred, k = 5, nPlanes = 4)
    val offCell = approx
      .join(cells.withColumnRenamed("vec_id", "q_id")
        .withColumnRenamed("cell", "qc"), "q_id")
      .join(cells.withColumnRenamed("vec_id", "neighbor_id")
        .withColumnRenamed("cell", "nc"), "neighbor_id")
      .filter(col("qc") =!= col("nc"))
    assert(offCell.count() == 0)
  }

  test("hits is exactly |brute ∩ approx| and every query appears") {
    val truth = Similarity.bruteForceTopK(emb, pred, 5)
      .select(col("q_id"), col("neighbor_id"))
    val approx = Similarity.lshCellTopK(emb, pred, 5, nPlanes = 4)
      .select(col("q_id"), col("neighbor_id"))
    val expected = truth.intersect(approx)
      .groupBy("q_id").count().as[(Long, Long)].collect().toMap
    val out = Similarity.lshRecall(emb, pred, 5, nPlanes = 4)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(out.keySet == (0L until 10L).toSet, s"got ${out.keySet}")
    out.foreach { case (q, (hits, bp)) =>
      assert(hits == expected.getOrElse(q, 0L), s"q=$q")
      assert(bp == hits * 2000L, s"q=$q")
      assert(hits >= 0L && hits <= 5L)
    }
  }

  test("1 plane = 2 giant cells → near-brute recall; sanity ordering") {
    // with a single hyperplane half the corpus shares each cell, so
    // recall@5 should dominate the 4-plane (16-cell) variant in total
    def total(nPlanes: Int) =
      Similarity.lshRecall(emb, pred, 5, nPlanes)
        .agg(sum("hits")).as[Long].collect()(0)
    assert(total(1) >= total(4))
    assert(total(1) >= 0L)
  }
}
