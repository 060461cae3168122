package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.SparkSpec.spark.implicits._

/** Scale-path semantics of the pair generators: the distributed plans
  * (pigeonhole band join, blocked pair scan, capped buckets) must return
  * exactly the sets their naive counterparts define.
  */
class PairScaleSpec extends SparkSpec {

  private def docsDf(rows: Seq[(Long, String)]) =
    rows.toDF("doc_id", "text")

  test("bucket cap drops degenerate boilerplate buckets, uncapped keeps them") {
    val n = 300
    val docs = docsDf((1 to n).map(i =>
      (i.toLong, "the same boilerplate text repeated in every document")))
    val sig = MinHashLsh.signature(docs, "text", 3, 8)
    // every doc identical -> every band bucket holds all 300 docs
    val capped = MinHashLsh.lshCandidatesWithDrops(sig, 8, 2, maxBucket = 10)
    assert(capped.pairs.count() == 0, "capped run must drop the oversized bucket")
    // the drop side channel names every oversized bucket with its size —
    // 4 bands, each one bucket of all 300 docs
    val drops = capped.droppedBuckets.collect()
    assert(drops.length == 4, s"4 over-cap band buckets, got ${drops.length}")
    assert(drops.forall(_.getAs[Long]("members") == n.toLong))
    val uncapped = MinHashLsh.lshCandidatesWithDrops(sig, 8, 2, Int.MaxValue)
    assert(uncapped.pairs.count() == n.toLong * (n - 1) / 2)
    assert(uncapped.droppedBuckets.count() == 0, "uncapped drops nothing")
  }

  test("pipeline entry point is capped by default and lazily composed") {
    val n = 80
    val docs = docsDf((1 to n).map(i =>
      (i.toLong, "the same boilerplate text repeated in every document")))
    // construction must run NO job (round 2 had an eager .head() inside
    // the cap) — count Spark jobs across plan composition
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); ()
      }
    }
    graft.SparkSpec.spark.sparkContext.addSparkListener(listener)
    val res = try {
      val r = DedupPipeline.nearDuplicates(docs, maxBucket = 10)
      Thread.sleep(1000) // listener events post asynchronously
      assert(jobs.get() == 0,
        s"composing the capped pipeline must run zero Spark jobs, ran ${jobs.get()}")
      r
    } finally graft.SparkSpec.spark.sparkContext.removeSparkListener(listener)
    assert(res.pairs.count() == 0)
    assert(res.droppedBuckets.count() == 4)
    val full = DedupPipeline.nearDuplicates(docs, maxBucket = Int.MaxValue)
    assert(full.pairs.count() == n.toLong * (n - 1) / 2)
  }

  test("jaccard bucket cap: identical corpus completes empty, uncapped pairs all") {
    val n = 120
    val docs = docsDf((1 to n).map(i =>
      (i.toLong, "alpha beta gamma delta epsilon zeta eta")))
    val capped = Jaccard.pairs(docs, "text", 3, 5, 10, maxBucket = 10)
    assert(capped.count() == 0)
    val uncapped = Jaccard.pairs(docs, "text", 3, 5, 10)
    assert(uncapped.count() == n.toLong * (n - 1) / 2)
  }

  test("simhash pigeonhole banding equals brute-force pairing") {
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val variants = Seq(
      base, base, base + " lambda", base + " mu nu",
      "totally different content about unrelated things entirely",
      base.replace("beta", "betta"), base.replace("gamma", "gamma2"),
      "alpha beta gamma", base + " lambda", "x y z")
    val docs = docsDf(variants.zipWithIndex.map { case (t, i) => ((i + 1).toLong, t) })
    val sh = MinHashLsh.simhash64(docs, "text")
    val banded = MinHashLsh.simhashNearDups(sh, 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    // brute force in the test (the shape the old driver-collect code had)
    val all = sh.collect().map(r => (r.getLong(0), r.getLong(1)))
    val brute = (for {
      i <- all.indices
      j <- (i + 1) until all.length
      d = java.lang.Long.bitCount(all(i)._2 ^ all(j)._2)
      if d <= 8
    } yield (math.min(all(i)._1, all(j)._1), math.max(all(i)._1, all(j)._1), d)).toSet
    assert(banded == brute)
    assert(brute.nonEmpty, "fixture should produce at least one near-dup pair")
  }

  test("blocked nearDupPairs equals single-block result") {
    // deterministic synthetic embeddings: 40 vectors in 8 dims
    val emb = (0 until 40).map { i =>
      (i.toLong, Array.tabulate(8)(d =>
        (math.sin(i * 0.7 + d) + (if (i % 5 == 0) 1.5 else 0.0)).toFloat))
    }.toSeq.toDF("vec_id", "embedding")
    def pairSet(nb: Int) =
      Similarity.nearDupPairs(emb, 0.9, nBlocks = nb)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val one = pairSet(1)
    assert(pairSet(4) == one)
    assert(pairSet(7) == one)
    assert(one.nonEmpty)
  }
}
