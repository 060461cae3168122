package graft.functions

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

class IvfStoreSpec extends SparkSpec {
  import SparkSpec.spark.implicits._

  // 4 well-separated clusters in 8-d so cells are meaningful
  private def corpus = (0L until 200L).map { i =>
    val c = (i % 4).toInt
    val v = Array.tabulate(8)(j =>
      (if (j == c * 2) 10f else 0f) + ((i * 7 + j) % 5) * 0.1f)
    (i, v)
  }.toDF("vec_id", "embedding")

  private def newStore() = {
    val emb = corpus
    val centroids = Ivf.train(emb, nCentroids = 4, maxIter = 10)
    val s = new IvfStore(spark,
      Files.createTempDirectory("graft-ivfstore-").toString + "/v", centroids)
    s.write(emb)
    (s, emb)
  }

  test("full probe over the store == brute force (exactness anchor)") {
    val (s, emb) = newStore()
    val queries = emb.filter($"vec_id" < 6)
    val got = s.searchTopK(queries, k = 5, nProbe = 4)
      .select("q_id", "rk", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val brute = Similarity.bruteForceTopK(emb, $"vec_id" < 6, 5)
      .select("q_id", "rk", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(got == brute && got.nonEmpty)
  }

  test("partial probe prunes cell directories at the storage layer") {
    val (s, emb) = newStore()
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val probed = s.probedCorpus(Set(0))
      probed.collect()
      val plan = probed.queryExecution.executedPlan
      assert(plan.toString.contains("PartitionFilters") &&
        plan.toString.contains("cell"), plan.toString.take(1500))
      val scan = plan.collect {
        case sc: org.apache.spark.sql.execution.FileSourceScanExec => sc
      }.head
      val total = spark.read.parquet(s.path).inputFiles.length
      assert(scan.metrics("numFiles").value < total,
        s"${scan.metrics("numFiles").value}/$total files")
    } finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
  }

  test("partial probe finds in-cluster neighbors (subset relaxation)") {
    val (s, emb) = newStore()
    val queries = emb.filter($"vec_id" === 0L) // cluster 0
    val got = s.searchTopK(queries, k = 3, nProbe = 1)
      .select("neighbor_id").as[Long].collect()
    assert(got.length == 3)
    // nearest neighbors of a cluster-0 point are cluster-0 points
    got.foreach(n => assert(n % 4 == 0, s"neighbor $n not in cluster 0"))
    // and the 1-probe answer is contained in the full-probe answer's cells
    val full = s.searchTopK(queries, k = 3, nProbe = 4)
      .select("neighbor_id").as[Long].collect()
    assert(got.toSet == full.toSet, "separated clusters: 1 probe suffices")
  }
}
