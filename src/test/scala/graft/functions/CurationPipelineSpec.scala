package graft.functions

import graft.SparkSpec
import graft.SparkSpec.spark.implicits._

/** End-to-end curation: a crafted corpus where each stage drops exactly
  * one known document, verified through the drop ledger and the final
  * kept set.
  */
class CurationPipelineSpec extends SparkSpec {

  // 40 distinct tokens in a per-document namespace so unrelated docs
  // share NO shingles (a shared base text would make the whole corpus
  // one near-dup cluster)
  private def body(i: Int) = (1 to 40).map(j => s"d${i}w$j").mkString(" ")

  test("each stage drops its targeted document") {
    val docs = Seq(
      // survives everything
      (1L, body(1), "en", "s1", 200L),
      // too short (quality gate)
      (2L, "tiny doc", "en", "s1", 8L),
      // repetitive: 40 tokens, 4 distinct (repetition gate)
      (3L, Seq.fill(10)("a b c d").mkString(" "), "en", "s1", 80L),
      // exact duplicate of doc 5 with a larger id (exact dedup keeps 5)
      (6L, body(5), "en", "s1", 200L),
      (5L, body(5), "en", "s1", 200L),
      // near-duplicate pair: 9 = 7 plus one trailing token ->
      // component rep is 7, 9 dropped
      (7L, body(7) + " shared tail", "en", "s1", 210L),
      (9L, body(7) + " shared tail x", "en", "s1", 212L),
      // contaminated: contains the eval doc's 4-gram
      (11L, body(11) + " alpha beta gamma delta", "en", "s1", 230L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val eval = Seq((100L, "alpha beta gamma delta epsilon zeta eta theta"))
      .toDF("doc_id", "text")
    val res = CurationPipeline.curate(docs, eval,
      // keep-all sampling so the sample stage is identity here
      sampleRateBp = org.apache.spark.sql.functions.lit(10000L))
    val ledger = res.ledger().toMap
    assert(ledger("input") == 8)
    assert(ledger("quality") == 6, "drops the short and the repetitive doc")
    assert(ledger("exact_dedup") == 5, "drops the larger-id exact dup")
    assert(ledger("decontaminated") == 4, "drops the contaminated doc")
    assert(ledger("near_dedup") == 3, "drops the near-dup non-representative")
    val kept = res.kept.select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L, 5L, 7L))
    res.release()
  }

  test("a boilerplate cluster lands in quarantine, not the pair join") {
    // 300 near-identical docs (shared 80-token boilerplate + one unique
    // trailing token): exact dedup keeps all 300 (hashes differ), so
    // without the cap the near-dup stage would explode the cluster into
    // ~45k in-task pairs and collapse it to one representative. The long
    // shared body keeps every doc's minhash bands on the modal values
    // (the unique shingle is 2 of 81 — winning a whole band is ~1e-5)
    val boilerBody = (1 to 80).map(j => s"bw$j").mkString(" ")
    val boiler = (0 until 300).map(i =>
      (1000L + i, boilerBody + s" uniq$i", "en", "s", 200L))
    val docs = (boiler :+ (1L, body(1), "en", "s", 200L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val eval = Seq((77777L, "nothing shared here at all ok"))
      .toDF("doc_id", "text")

    val capped = CurationPipeline.curate(docs, eval, maxBucket = 64,
      sampleRateBp = org.apache.spark.sql.functions.lit(10000L))
    val dropped = capped.droppedBuckets.collect()
    assert(dropped.nonEmpty, "the cluster's band buckets must be quarantined")
    assert(dropped.map(_.getAs[Long]("members")).max >= 250L)
    val cappedLedger = capped.ledger().toMap
    assert(cappedLedger("quarantined_buckets") == dropped.length.toLong)
    // the cluster is NOT collapsed here — it flows through for routing
    assert(cappedLedger("near_dedup") >= 250L)
    capped.release()

    val uncapped = CurationPipeline.curate(docs, eval,
      maxBucket = Int.MaxValue,
      sampleRateBp = org.apache.spark.sql.functions.lit(10000L))
    val uncappedLedger = uncapped.ledger().toMap
    assert(uncappedLedger("quarantined_buckets") == 0L)
    // collapses to one representative, plus the rare doc whose unique
    // shingle hash wins every minhash permutation (an isolate of the
    // affine scheme, deterministic and oracle-replayed)
    assert(uncappedLedger("near_dedup") <= 5L,
      "uncapped, the cluster collapses to (nearly) one representative")
    uncapped.release()
  }

  test("ledger after consuming kept does not re-run the CC fixpoint") {
    val docs = Seq(
      (1L, body(1), "en", "s1", 200L),
      (7L, body(7) + " shared tail", "en", "s1", 210L),
      (9L, body(7) + " shared tail x", "en", "s1", 212L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val eval = Seq((100L, "alpha beta gamma delta epsilon zeta eta theta"))
      .toDF("doc_id", "text")
    val res = CurationPipeline.curate(docs, eval,
      sampleRateBp = org.apache.spark.sql.functions.lit(10000L))
    res.kept.count() // consume the final output (populates the caches)
    val roundsBefore = graft.core.Metrics.counter("graft.cc.rounds")
    res.ledger()
    res.ledger() // twice: a recompute would show up on either call
    assert(graft.core.Metrics.counter("graft.cc.rounds") == roundsBefore,
      "ledger() must read persisted stages, not re-run connectedComponents")
    res.release()
  }

  test("sampling stage applies the per-language rate") {
    val docs = (1 to 400).map(i =>
      (i.toLong, body(i), if (i % 2 == 0) "en" else "zz", "s", 200L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val eval = Seq((99999L, "nothing shared here at all ok")).toDF("doc_id", "text")
    val res = CurationPipeline.curate(docs, eval)
    val kept = res.kept.collect()
    val byLang = kept.groupBy(_.getString(1)).view.mapValues(_.length).toMap
    // en keeps at 80%, zz at 10% of 200 docs each
    assert(byLang.getOrElse("en", 0) > 130 && byLang("en") < 200)
    assert(byLang.getOrElse("zz", 0) < 50)
    res.release()
  }
}
