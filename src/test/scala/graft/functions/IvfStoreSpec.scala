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

  private def topk(s: IvfStore, emb: org.apache.spark.sql.DataFrame,
      pred: org.apache.spark.sql.Column): Set[(Long, Int, Long)] =
    s.searchTopK(emb.filter(pred), k = 5, nProbe = 4)
      .select("q_id", "rk", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet

  test("append files a delta into touched cells; search == full rebuild") {
    val emb = corpus
    val centroids = Ivf.train(emb, nCentroids = 4, maxIter = 10)
    val base = emb.filter($"vec_id" % 3 =!= 0)
    val delta = emb.filter($"vec_id" % 3 === 0)

    val maintained = new IvfStore(spark,
      Files.createTempDirectory("ivf-maint-").toString + "/v", centroids)
    maintained.write(base)
    // maintenance goes through the persisted-quantizer handle
    val handle = IvfStore.open(spark, maintained.path)
    handle.append(delta)

    val rebuilt = new IvfStore(spark,
      Files.createTempDirectory("ivf-rebuilt-").toString + "/v", centroids)
    rebuilt.write(emb)

    val got = topk(handle, emb, $"vec_id" < 6)
    assert(got == topk(rebuilt, emb, $"vec_id" < 6) && got.nonEmpty)
  }

  test("open round-trips the persisted quantizer bit-exactly; append " +
      "refuses a drifted handle") {
    val (s, emb) = newStore()
    val reopened = IvfStore.open(spark, s.path)
    // exercise the reopened handle end-to-end
    assert(topk(reopened, emb, $"vec_id" < 6) == topk(s, emb, $"vec_id" < 6))
    // a retrained quantizer is a DIFFERENT layout: mutating through it
    // would file vectors into cells the stored layout never probes
    val drifted = Ivf.train(emb.filter($"vec_id" % 2 === 0L),
      nCentroids = 4, maxIter = 3)
    val bad = new IvfStore(spark, s.path, drifted)
    val e = intercept[IllegalArgumentException] {
      bad.append(emb.limit(1))
    }
    assert(e.getMessage.contains("persisted quantizer"))
  }

  test("removeWhere rewrites only touched cells and drops emptied cells") {
    val (s, emb) = newStore()
    val handle = IvfStore.open(spark, s.path)
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sparkContext.hadoopConfiguration)
    def cellFiles(c: Int): Set[String] = {
      val p = new org.apache.hadoop.fs.Path(s"${s.path}/cell=$c")
      if (!fs.exists(p)) Set.empty
      else fs.listStatus(p).map(_.getPath.getName)
        .filter(_.endsWith(".parquet")).toSet
    }
    // which cell holds cluster 3? (vec_id % 4 == 3 by construction)
    val cellOf3 = spark.read.parquet(s.path)
      .filter($"vec_id" === 3L).select("cell")
      .collect().head.get(0).toString.toInt
    val untouched = (0 until 4).filterNot(_ == cellOf3)
    val before = untouched.map(c => c -> cellFiles(c)).toMap

    // remove PART of cluster 3: its cell is rewritten, others untouched
    handle.removeWhere($"vec_id" % 4 === 3 && $"vec_id" < 100)
    val live = spark.read.parquet(s.path).select("vec_id").as[Long].collect().toSet
    assert(!live.exists(id => id % 4 == 3 && id < 100))
    assert(live.exists(id => id % 4 == 3 && id >= 100), "kept the rest of the cell")
    untouched.foreach(c =>
      assert(cellFiles(c) == before(c), s"untouched cell $c was rewritten"))

    // remove the REST of cluster 3: its emptied cell directory disappears
    handle.removeWhere($"vec_id" % 4 === 3)
    assert(cellFiles(cellOf3).isEmpty, "emptied cell dir must be gone")
    val after = spark.read.parquet(s.path).select("vec_id").as[Long].collect().toSet
    assert(!after.exists(_ % 4 == 3) && after.nonEmpty)
  }

  test("compactCells defragments appended cells without changing results") {
    val emb = corpus
    val centroids = Ivf.train(emb, nCentroids = 4, maxIter = 10)
    val s = new IvfStore(spark,
      Files.createTempDirectory("ivf-compact-").toString + "/v", centroids)
    s.write(emb.filter($"vec_id" < 100))
    (0 until 3).foreach(i =>
      s.append(emb.filter($"vec_id" >= 100 + i * 30 && $"vec_id" < 130 + i * 30)))
    val expected = topk(s, emb, $"vec_id" < 6)
    val filesBefore = spark.read.parquet(s.path).inputFiles.length
    s.compactCells(maxFilesPerCell = 1)
    val filesAfter = spark.read.parquet(s.path).inputFiles.length
    assert(filesAfter < filesBefore, s"$filesAfter vs $filesBefore files")
    assert(topk(s, emb, $"vec_id" < 6) == expected)
  }

  test("appendIdempotent drops re-offered vectors; replicate replay converges") {
    val emb = corpus
    val centroids = Ivf.train(emb, nCentroids = 4, maxIter = 10)
    val tmp = Files.createTempDirectory("ivf-idem-").toString
    val s = new IvfStore(spark, tmp + "/v", centroids)
    s.write(emb.filter($"vec_id" < 80))
    // the delta overlaps the seed: only the 120 new ids may land
    s.appendIdempotent(emb.filter($"vec_id" >= 40))
    val ids = spark.read.parquet(s.path).select("vec_id").as[Long].collect()
    assert(ids.length == 200 && ids.toSet.size == 200, "store must hold " +
      s"each vector exactly once; got ${ids.length} rows")

    // intra-batch duplicate ids are a data error, refused loudly
    val dup = emb.filter($"vec_id" === 0L)
      .unionByName(emb.filter($"vec_id" === 0L))
    val e = intercept[IllegalArgumentException] { s.appendIdempotent(dup) }
    assert(e.getMessage.contains("duplicate vec_ids"))

    // streamed replication: full-feed replay with a FRESH checkpoint
    // (the worst restart: every batch re-offered) leaves the store as-is
    emb.write.parquet(tmp + "/feed")
    def replayOnce(cp: String): Unit = {
      val q = s.replicate(
          spark.readStream.schema(emb.schema)
            .option("maxFilesPerTrigger", 2).parquet(tmp + "/feed"), cp)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    replayOnce(tmp + "/cp1")
    replayOnce(tmp + "/cp2") // fresh checkpoint: full replay
    val after = spark.read.parquet(s.path).select("vec_id").as[Long].collect()
    assert(after.length == 200 && after.toSet.size == 200,
      s"replayed replication duplicated vectors: ${after.length} rows")
  }

  test("upsert re-embeds: matched ids replaced (cell moves follow the " +
      "new embedding), unmatched ids appended") {
    val emb = corpus
    val centroids = Ivf.train(emb, nCentroids = 4, maxIter = 10)
    val s = new IvfStore(spark,
      Files.createTempDirectory("ivf-upsert-").toString + "/v", centroids)
    s.write(emb.filter($"vec_id" < 150))
    // re-embed ids 0-49 with cluster-((id+1)%4) vectors (cells MOVE) and
    // introduce 150-199 as new
    val delta = (0L until 50L).map { i =>
      val c = ((i + 1) % 4).toInt
      (i, Array.tabulate(8)(j => if (j == c * 2) 10f else 0.5f))
    }.toDF("vec_id", "embedding")
      .unionByName(emb.filter($"vec_id" >= 150))
    s.upsert(delta)
    val store = spark.read.parquet(s.path)
    assert(store.count() == 200 &&
      store.select("vec_id").distinct().count() == 200)
    // the re-embedded vectors answer from their NEW cluster
    val got = s.searchTopK(
        Seq((0L, Array.tabulate(8)(j => if (j == 2) 10f else 0.5f)))
          .toDF("vec_id", "embedding"), k = 1, nProbe = 4)
      .select("neighbor_id").as[Long].collect()
    assert(got.length == 1 && got.head < 50,
      s"nearest to the re-embedded direction should be a re-embedded id: ${got.toSeq}")
    // upsert == removeMatching + append: replaced embeddings really moved
    val stored0 = Similarity.vecRows(store.filter($"vec_id" === 0L)
      .select("vec_id", "embedding")).collect().head._2
    assert(stored0(2) == 10.0 && stored0(0) == 0.5, stored0.mkString(","))
  }

  test("distributed ANN join at full probe == brute force for every " +
      "query; salt lanes don't change the answer") {
    val (s, emb) = newStore()
    val brute = Similarity.bruteForceTopK(emb, lit(true), 5)
      .select("q_id", "rk", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    def joined(salt: Int) = s.searchTopKJoin(emb, 5, nProbe = 4, salt = salt)
      .select("q_id", "rk", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val got = joined(4)
    assert(got == brute && got.nonEmpty)
    assert(joined(1) == got, "salting is a parallelism knob, not semantics")
  }

  test("an interrupted cell swap refuses reads and mutations loudly") {
    val (s, emb) = newStore()
    val staging = new java.io.File(s.path + "_staging")
    assert(staging.mkdirs())
    try {
      val e = intercept[IllegalArgumentException] {
        s.probedCorpus(Set(0)).collect()
      }
      assert(e.getMessage.contains("interrupted cell swap"))
      intercept[IllegalArgumentException] { s.append(emb.limit(1)) }
      intercept[IllegalArgumentException] { s.compactCells() }
    } finally { staging.delete(); () }
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
