package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** DSIR importance-resampling laws: feature extraction, λ semantics,
  * weight monotonicity toward the target distribution, and the
  * partitioning/determinism contract that makes the sample an oracle row.
  */
class DsirSpec extends SparkSpec {

  private def docsDf(rows: Seq[(Long, String, String)]) = {
    val s = spark
    import s.implicits._
    rows.toDF("doc_id", "lang", "text")
  }

  test("featureBuckets emits unigrams + bigrams, in [0, b)") {
    val s = spark
    import s.implicits._
    val b = 64
    val got = docsDf(Seq((1L, "en", "alpha beta gamma")))
      .select(Dsir.featureBuckets(col("text"), b).as("f"))
      .as[Seq[Long]].head()
    // 3 unigrams + 2 bigrams
    assert(got.length == 5)
    assert(got.forall(x => x >= 0 && x < b))
    // the bigram buckets hash the space-joined shingle convention
    val big = docsDf(Seq((1L, "en", "x")))
      .select(MinHashLsh.hash60(lit("dsir:alpha beta")).as("h"))
      .select(pmod(col("h"), lit(b.toLong)).as("p")).as[Long].head()
    assert(got(3) == big)
  }

  test("native featureBuckets == functions-only reference on edge inputs") {
    val s = spark
    import s.implicits._
    val texts = Seq("alpha beta gamma", " lead  trail ", "", " ", "\tx",
      "x\t", "a", "a  b", "über café 中文 日本語", "  \t  ",
      (1 to 50).map(i => s"tok$i").mkString(" "))
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    for (b <- Seq(7, 1024)) {
      val got = df.select(col("doc_id"),
          Dsir.featureBuckets(col("text"), b).as("n"),
          Dsir.featureBucketsReference(col("text"), b).as("r"))
        .collect()
      got.foreach { r =>
        assert(r.getSeq[Long](1) == r.getSeq[Long](2),
          s"doc ${r.getLong(0)} b=$b: native ${r.getSeq[Long](1)} != " +
            s"reference ${r.getSeq[Long](2)}")
      }
    }
  }

  test("a single-token document has no bigram features") {
    val s = spark
    import s.implicits._
    val got = docsDf(Seq((1L, "en", "  solo  ")))
      .select(Dsir.featureBuckets(col("text"), 32).as("f"))
      .as[Seq[Long]].head()
    assert(got.length == 1)
  }

  test("lambda is positive for target-only features, negative for raw-only") {
    val target = docsDf(Seq((1L, "en", "tt tt tt tt"), (2L, "en", "tt tt")))
    val raw = docsDf(Seq((3L, "de", "rr rr rr rr"), (4L, "de", "rr rr")))
    val b = 32
    val lam = Dsir.lambdaMicros(target, raw, "text", b)
    assert(lam.length == b)
    val tBucket = target
      .select(element_at(Dsir.featureBuckets(col("text"), b), 1).as("p"))
      .head().getLong(0).toInt
    val rBucket = raw
      .select(element_at(Dsir.featureBuckets(col("text"), b), 1).as("p"))
      .head().getLong(0).toInt
    assert(lam(tBucket) > 0, s"target-only bucket λ=${lam(tBucket)}")
    assert(lam(rBucket) < 0, s"raw-only bucket λ=${lam(rBucket)}")
  }

  test("docs sharing the target vocabulary outscore docs that don't") {
    val target = (1L to 20L).map(i => (i, "en", "quick brown fox jumps"))
    val rawLike = (100L to 104L).map(i => (i, "de", "quick brown fox"))
    val rawUnlike = (200L to 204L).map(i => (i, "de", "nacht nebel regen"))
    val docs = docsDf(target ++ rawLike ++ rawUnlike)
    val lam = Dsir.lambdaMicros(
      docs.filter(col("lang") === "en"), docs.filter(col("lang") =!= "en"),
      "text", Dsir.DefaultBuckets)
    val w = docs.filter(col("lang") =!= "en")
      .select(col("doc_id"),
        Dsir.logwMicros(col("text"), lam, Dsir.DefaultBuckets).as("w"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val minLike = (100L to 104L).map(w).min
    val maxUnlike = (200L to 204L).map(w).max
    assert(minLike > maxUnlike,
      s"target-like docs (min $minLike) must outscore unlike ($maxUnlike)")
  }

  test("sample is deterministic and partitioning-invariant") {
    val docs = docsDf((1L to 60L).map { i =>
      val lang = if (i % 3 == 0) "en" else "de"
      (i, lang, s"tok${i % 7} tok${i % 5} tok${i % 3} tok${i % 11}")
    })
    def run(df: org.apache.spark.sql.DataFrame) =
      Dsir.sample(df, "text", col("lang") === "en", b = 128, fracBp = 2500)
        .collect().map(r => (r.getLong(0), r.getLong(3))).toSeq
    val a = run(docs)
    val b = run(docs.repartition(13))
    assert(a.nonEmpty)
    assert(a == b, "selection must not depend on partitioning")
    // 40 raw docs at 25% → exactly 10 selected
    assert(a.length == 10)
  }

  test("gumbel keys rank by weight in expectation: heavier docs selected") {
    // one doc with an overwhelming weight advantage must always be in
    // the sample: the Gumbel perturbation from a 60-bit uniform is
    // bounded to roughly [-3.8, +42] nats, while the weight gap here is
    // ~100 nats (the target-vocab doc repeats it enough times to score
    // dozens of positive-λ features, but far fewer than would tilt the
    // raw distribution itself — the trap a 200× repeat falls into)
    val target = (1L to 50L).map(i => (i, "en", "aa bb cc dd"))
    val heavy = Seq((100L, "de", Seq.fill(10)("aa bb cc dd").mkString(" ")))
    val light = (200L to 219L).map(i => (i, "de", "xx yy zz"))
    val docs = docsDf(target ++ heavy ++ light)
    val got = Dsir.sample(docs, "text", col("lang") === "en",
      b = 256, fracBp = 500).collect().map(_.getLong(0)).toSet
    // 21 raw docs at 5% → k = ceil(1.05) = 2; the heavy doc must be there
    assert(got.contains(100L), s"heavy doc missing from $got")
  }
}
