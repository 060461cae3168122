package graft.functions

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

class PqStoreSpec extends SparkSpec {
  import SparkSpec.spark.implicits._

  // 4 well-separated clusters in 8-d (the IvfStoreSpec corpus)
  private def corpus = (0L until 200L).map { i =>
    val c = (i % 4).toInt
    val v = Array.tabulate(8)(j =>
      (if (j == c * 2) 10f else 0f) + ((i * 7 + j) % 5) * 0.1f)
    (i, v)
  }.toDF("vec_id", "embedding")

  private def quantizers(emb: org.apache.spark.sql.DataFrame) = (
    Pq.train(emb, m = 4, k = 16, maxIter = 20),
    Ivf.train(emb, nCentroids = 4, maxIter = 10))

  private def topk(df: org.apache.spark.sql.DataFrame): Set[(Long, Int, Long)] =
    df.select("q_id", "rk", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet

  test("full probe over the persisted store == in-memory IVF-PQ") {
    val emb = corpus
    val (cb, coarse) = quantizers(emb)
    val s = new PqStore(spark,
      Files.createTempDirectory("pqstore-").toString + "/v", cb, coarse)
    s.write(emb)
    val got = topk(s.searchTopK(emb.filter($"vec_id" < 6), 5, nProbe = 4))
    val mem = topk(Pq.searchTopKIvf(emb, $"vec_id" < 6, 5, cb, coarse,
      nProbe = 4))
    assert(got == mem && got.nonEmpty)
  }

  test("partial probe prunes cell directories at the storage layer") {
    val emb = corpus
    val (cb, coarse) = quantizers(emb)
    val s = new PqStore(spark,
      Files.createTempDirectory("pqstore-prune-").toString + "/v", cb, coarse)
    s.write(emb)
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val probed = s.probedCodes(Set(0))
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

  test("removeMatching rewrites only matched cells; removed codes leave " +
      "the serving layout") {
    val emb = corpus
    val (cb, coarse) = quantizers(emb)
    val s = new PqStore(spark,
      Files.createTempDirectory("pqstore-rm-").toString + "/v", cb, coarse)
    s.write(emb)
    // take down cluster-2's vectors (ids with i % 4 == 2)
    val takedown = emb.filter($"vec_id" % 4 === 2).select("vec_id")
    s.removeMatching(takedown)
    val left = spark.read.parquet(s.path).select("vec_id").as[Long].collect()
    assert(!left.exists(_ % 4 == 2) && left.length == 150)
    // searches can never return a removed vector again
    val got = s.searchTopK(emb.filter($"vec_id" === 2L), 10, nProbe = 4)
      .select("neighbor_id").as[Long].collect()
    assert(got.nonEmpty && !got.exists(_ % 4 == 2))
    // equal to a store rebuilt without them
    val rebuilt = new PqStore(spark,
      Files.createTempDirectory("pqstore-rm-rebuilt-").toString + "/v",
      cb, coarse)
    rebuilt.write(emb.filter($"vec_id" % 4 =!= 2))
    assert(topk(s.searchTopK(emb.filter($"vec_id" < 6), 5, nProbe = 4)) ==
      topk(rebuilt.searchTopK(emb.filter($"vec_id" < 6), 5, nProbe = 4)))
  }

  test("corrupt persisted quantizer files refuse loudly with provenance") {
    val emb = corpus
    val (cb, coarse) = quantizers(emb)
    val s = new PqStore(spark,
      Files.createTempDirectory("pqstore-corrupt-").toString + "/v", cb, coarse)
    s.write(emb)
    def corrupt(name: String, body: String): Unit = {
      java.nio.file.Files.write(java.nio.file.Paths.get(s.path, name),
        body.getBytes("UTF-8"))
      // the out-of-band write leaves a stale Hadoop checksum sidecar; the
      // scenario under test is a corrupt FILE, not a torn write
      java.nio.file.Files.deleteIfExists(
        java.nio.file.Paths.get(s.path, s".$name.crc"))
    }
    corrupt("_codebooks", "not a codebook\ngarbage;;;")
    val e1 = intercept[IllegalStateException] { PqStore.open(spark, s.path) }
    assert(e1.getMessage.contains("corrupt persisted codebooks"), e1.getMessage)
    corrupt("_quantizer", "zzzz,not-hex")
    val e2 = intercept[IllegalStateException] { PqStore.open(spark, s.path) }
    assert(e2.getMessage.contains("corrupt persisted quantizer"), e2.getMessage)
    // ragged centroid rows are corruption too, not a shorter quantizer
    corrupt("_quantizer", "3ff0000000000000,3ff0000000000000\n3ff0000000000000")
    val e3 = intercept[IllegalArgumentException] { IvfStore.open(spark, s.path) }
    assert(e3.getMessage.contains("ragged"), e3.getMessage)
  }

  test("open round-trips both quantizers; append == full rebuild; " +
      "drifted handles refused") {
    val emb = corpus
    val (cb, coarse) = quantizers(emb)
    val maintained = new PqStore(spark,
      Files.createTempDirectory("pqstore-maint-").toString + "/v", cb, coarse)
    maintained.write(emb.filter($"vec_id" % 2 === 0))
    val handle = PqStore.open(spark, maintained.path)
    handle.append(emb.filter($"vec_id" % 2 === 1))

    val rebuilt = new PqStore(spark,
      Files.createTempDirectory("pqstore-rebuilt-").toString + "/v", cb, coarse)
    rebuilt.write(emb)
    val q = emb.filter($"vec_id" < 6)
    val got = topk(handle.searchTopK(q, 5, nProbe = 4))
    assert(got == topk(rebuilt.searchTopK(q, 5, nProbe = 4)) && got.nonEmpty)

    // a retrained codebook is a different meaning for every stored byte
    val (cb2, _) = quantizers(emb.filter($"vec_id" < 64))
    val bad = new PqStore(spark, maintained.path, cb2, coarse)
    val e = intercept[IllegalArgumentException] { bad.append(emb.limit(1)) }
    assert(e.getMessage.contains("persisted"))
  }
}
