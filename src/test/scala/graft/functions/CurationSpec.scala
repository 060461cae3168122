package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.SparkSpec.spark.implicits._

/** Curation operators: planted contamination is found (and only it),
  * repetition stats match hand counts, hash sampling is deterministic and
  * rate-proportional, domain-mix rates hit the uniform target.
  */
class CurationSpec extends SparkSpec {

  test("decontaminate flags exactly the planted overlap") {
    val eval = Seq((100L, "alpha beta gamma delta epsilon")).toDF("doc_id", "text")
    val train = Seq(
      // contains the 4-gram "beta gamma delta epsilon" (1 hit) and
      // "alpha beta gamma delta" (1 hit)
      (1L, "x alpha beta gamma delta epsilon y"),
      (2L, "alpha beta X gamma delta epsilon"), // no shared 4-gram
      (3L, "unrelated words only here man")
    ).toDF("doc_id", "text")
    val out = Curation.decontaminate(train, eval, "text", n = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 2L))
  }

  test("repetitionStats matches hand counts") {
    val docs = Seq(
      (1L, "a a a b"),      // 4 tokens, 2 distinct, top token a=3;
                            // bigrams: "a a" x2, "a b" -> top 2 of 3
      (2L, "only")          // 1 token; no bigrams
    ).toDF("doc_id", "text")
    val rows = Curation.repetitionStats(docs, "text")
      .collect().map(r => r.getLong(0) -> r).toMap
    val r1 = rows(1L)
    assert(r1.getLong(1) == 4 && r1.getLong(2) == 2 && r1.getLong(3) == 3)
    assert(r1.getLong(4) == 3 && r1.getLong(5) == 2)
    assert(r1.getDouble(6) == 0.5 && r1.getDouble(7) == 0.6667)
    val r2 = rows(2L)
    assert(r2.getLong(1) == 1 && r2.getLong(4) == 0 && r2.getLong(5) == 0)
    assert(r2.getDouble(6) == 0.0 && r2.getDouble(7) == 0.0)
  }

  test("hashSample is deterministic and roughly rate-proportional") {
    val docs = spark.range(10000).select(col("id").as("doc_id"))
    val a = Curation.hashSample(docs, col("doc_id"), "s", lit(2500L))
    val b = Curation.hashSample(docs, col("doc_id"), "s", lit(2500L))
    val na = a.count()
    assert(na == b.count()) // pure function of the id
    assert(na > 2000 && na < 3000, s"kept $na of 10000 at 25%")
    // different salt -> independent decision, similar rate
    val nc = Curation.hashSample(docs, col("doc_id"), "t", lit(2500L)).count()
    assert(nc > 2000 && nc < 3000 && nc != na)
  }

  test("temperatureSample: smallest domain keeps all, 4x domain keeps half") {
    val s = spark
    import s.implicits._
    // 4 docs in 'big', 1 in 'small': keep_bp(small)=10000,
    // keep_bp(big)=floor(10000*sqrt(1/4))=5000
    val docs = ((1 to 4).map(i => (i.toLong, "big")) :+ (9L, "small"))
      .toDF("doc_id", "dom")
    val got = Curation.temperatureSample(docs, "dom", col("doc_id"), "t")
      .select(col("dom"), col("keep_bp")).distinct()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got.get("small").forall(_ == 10000L))
    assert(got.get("big").forall(_ == 5000L), got.toString)
  }

  test("temperatureSample: NULL-domain docs are a real group, not a " +
      "phantom anchor — they sample at their own rate instead of " +
      "anchoring n_min and then vanishing in the join") {
    val s = spark
    import s.implicits._
    // 1 null-domain doc + 4 'big': the null group IS the smallest
    // (n_min = 1) — it must keep at 10000bp itself, and 'big' keeps
    // floor(10000*sqrt(1/4)) = 5000 anchored to that real group
    val docs = ((1 to 4).map(i => (i.toLong, "big")) :+
      (9L, null.asInstanceOf[String])).toDF("doc_id", "dom")
    val got = Curation.temperatureSample(docs, "dom", col("doc_id"), "t")
      .select(col("dom"), col("keep_bp")).distinct()
      .collect().map(r => Option(r.getString(0)) -> r.getLong(1)).toMap
    assert(got.get(None).forall(_ == 10000L),
      s"null-domain docs must survive at their own rate: $got")
    assert(got(Some("big")) == 5000L, got.toString)
    // and the null-domain doc itself is present in the output
    assert(Curation.temperatureSample(docs, "dom", col("doc_id"), "t")
      .filter(col("dom").isNull).count() == 1)
  }

  test("epochMix honors the caller's id column name") {
    val s = spark
    import s.implicits._
    val docs = (1L to 10L).map(i => (i, "en")).toDF("url_id", "lang")
    val out = Curation.epochMix(docs, "lang", col("url_id"),
      lit(10000L), "t")
    assert(out.columns.toSeq == Seq("doc_id", "lang", "copy_idx"))
    assert(out.count() == 10, "every doc exactly once at 100% target")
  }

  test("temperatureSample on an empty corpus is empty, not an NPE") {
    val s = spark
    import s.implicits._
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "dom")
    assert(Curation.temperatureSample(empty, "dom", col("doc_id"), "t")
      .count() == 0)
  }

  test("domainMixRates downsamples heavy domains to the uniform share") {
    // dom a: 6000 chars, dom b: 3000, dom c: 1000 -> total 10000, target
    // 3333 -> a rate 5555, b rate 10000 (capped), c rate 10000
    val docs = Seq(
      ("a", 6000L), ("b", 3000L), ("c", 1000L)
    ).toDF("source", "n_chars")
    val rates = Curation.domainMixRates(docs, "source", "n_chars")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rates == Map("a" -> 5555L, "b" -> 10000L, "c" -> 10000L))
  }

  test("domainMixRates keeps a zero-weight domain instead of dividing by 0") {
    // dom z carries only zero-weight rows: it cannot be over the uniform
    // target, so it keeps everything (and must not throw under ANSI mode)
    val docs = Seq(
      ("a", 6000L), ("b", 3000L), ("z", 0L), ("z", 0L)
    ).toDF("source", "n_chars")
    val rates = Curation.domainMixRates(docs, "source", "n_chars")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rates("z") == 10000L)
    assert(rates("a") == 5000L) // total 9000, 3 domains -> target 3000
    assert(rates("b") == 10000L)
  }

  test("exactQuantiles equals the sort-based nearest-rank reference") {
    val rnd = new scala.util.Random(7)
    val docs = (1 to 2000).map { i =>
      val lang = Seq("en", "de", "fr")(i % 3)
      (i.toLong, lang, (rnd.nextInt(300) + 1).toLong)
    }.toDF("doc_id", "lang", "n_chars")
    val got = Curation.exactQuantiles(docs, "lang", "n_chars", Seq(50, 90, 99))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    // reference: sort each group, take the value at rank ceil(p*n/100)
    val byLang = docs.collect().groupBy(_.getString(1))
      .view.mapValues(_.map(_.getLong(2)).sorted).toMap
    byLang.foreach { case (lang, vs) =>
      def ref(p: Int) = vs((vs.length * p + 99) / 100 - 1)
      assert(got(lang) == ((ref(50), ref(90), ref(99))), s"lang=$lang")
    }
  }

  test("exactQuantilesWeighted selects by cumulative weight, not row count") {
    import org.apache.spark.sql.functions.col
    // one group: values 10,20,30 with weights 1,1,98 — the token-weighted
    // p50 is 30 (98% of the weight), while the unweighted p50 is 20
    val docs = Seq(
      ("en", 10L, 1L), ("en", 20L, 1L), ("en", 30L, 98L)
    ).toDF("lang", "n_chars", "w")
    val weighted = Curation.exactQuantilesWeighted(docs, "lang", "n_chars",
      col("w"), Seq(50)).head()
    assert(weighted.getLong(1) == 30L)
    val unweighted = Curation.exactQuantiles(docs, "lang", "n_chars",
      Seq(50)).head()
    assert(unweighted.getLong(1) == 20L)
  }

  test("exactQuantiles survives user columns named n/c/cum (internal-name collision)") {
    // before the __graft_-prefixed internals, a value column named "n"
    // was silently overwritten by the group-total window -> wrong result
    val docs = Seq(("a", 10L), ("a", 20L), ("a", 30L), ("b", 5L))
      .toDF("cum", "n")
    val out = Curation.exactQuantiles(docs, "cum", "n", Seq(50, 100))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out("a") == (20L, 30L))
    assert(out("b") == (5L, 5L))
  }

  test("decontaminateBloom equals the exact path (FPs verified away)") {
    val eval = (0 until 20).map(i =>
      (1000L + i, s"ev${i}a ev${i}b ev${i}c ev${i}d extra")).toDF("doc_id", "text")
    val train = (0 until 60).map { i =>
      val text = if (i % 3 == 0) s"x ev${i % 20}a ev${i % 20}b ev${i % 20}c ev${i % 20}d y"
        else s"clean t${i}a t${i}b t${i}c t${i}d t${i}e"
      (i.toLong, text)
    }.toDF("doc_id", "text")
    def asMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // a high-fpp filter forces false positives through the prefilter;
    // the exact verify join must still eliminate every one
    val exact = asMap(Curation.decontaminate(train, eval, "text", n = 4))
    val bloom = asMap(Curation.decontaminateBloom(train, eval, "text", n = 4,
      fpp = 0.5))
    assert(exact.nonEmpty)
    assert(bloom == exact)
    // plan gate: the probe is the native BloomFilterMightContain
    // expression inside codegen, not a Scala UDF
    val plan = Curation.decontaminateBloom(train, eval, "text", n = 4)
      .queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"), plan.take(800))
    assert(!plan.contains("UDF"), "bloom probe must not be a Scala UDF")
  }

  test("noveltyRate: hand corpus fractions; bloom path equals exact") {
    // ref doc: tokens a..f → 3-gram shingles {abc,bcd,cde,def}
    val ref = Seq((1L, "a b c d e f")).toDF("doc_id", "text")
    // eval 10: b..g → {bcd,cde,def,efg}: 3 seen, 1 novel → 0.25
    // eval 11: all fresh → 1.0; eval 12: a..d → {abc,bcd}: all seen → 0.0
    val eval = Seq(
      (10L, "b c d e f g"),
      (11L, "p q r s t"),
      (12L, "a b c d")).toDF("doc_id", "text")
    def asMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r =>
        r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    val exact = asMap(Curation.noveltyRateExact(eval, ref, "text", n = 3))
    assert(exact == Map(
      10L -> (4L, 1L, 0.25),
      11L -> (3L, 3L, 1.0),
      12L -> (2L, 0L, 0.0)))
    // a high-fpp filter forces false positives through the prefilter;
    // the exact semi-join must cancel every one
    val bloom = asMap(Curation.noveltyRate(eval, ref, "text", n = 3, fpp = 0.5))
    assert(bloom == exact)
    val plan = Curation.noveltyRate(eval, ref, "text", n = 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"), plan.take(800))
    assert(!plan.contains("UDF"), "bloom probe must not be a Scala UDF")
  }

  test("redactPii scrubs planted email/ip/phone and counts each") {
    val docs = Seq(
      (1L, "write me at bob.smith+x@sub.example.org today"),
      (2L, "host 192.168.1.254 then call +420777123456 now"),
      (3L, "no pii here at all"),
      (4L, "two mails a@b.cz c@d.org and ip 10.0.0.1")
    ).toDF("doc_id", "text")
    val out = Curation.redactPii(docs, "text").collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    assert(out(1L) == (("write me at <EMAIL> today", 1L, 0L, 0L)))
    assert(out(2L) == (("host <IP> then call <PHONE> now", 0L, 1L, 1L)))
    assert(out(3L) == (("no pii here at all", 0L, 0L, 0L)))
    assert(out(4L) == (("two mails <EMAIL> <EMAIL> and ip <IP>", 2L, 1L, 0L)))
  }

  test("packSequences conserves tokens and chunks at the context boundary") {
    val ctx = 10
    // 30 docs of 1..30 tokens, single shard so the chain is deterministic
    val docs = (1 to 30).map(i => (i.toLong, Seq.fill(i)("t").mkString(" ")))
      .toDF("doc_id", "text")
    val out = Curation.packSequences(docs, "text", ctx = ctx, nShards = 1)
      .orderBy(col("seq_id"), col("seq_off")).collect()
    assert(out.map(_.getLong(2)).sum == (1 to 30).sum)
    // offsets stay inside the context window
    assert(out.forall(r => r.getLong(4) >= 0 && r.getLong(4) < ctx))
    // the doc starting at running-total R lands in sequence R/ctx with
    // offset R%ctx: recompute the chain independently in shard order
    var running = 0L
    out.sortBy(r => (r.getLong(3), r.getLong(4))).foreach { r =>
      assert(r.getLong(3) == running / ctx, s"seq_id for doc ${r.getLong(1)}")
      assert(r.getLong(4) == running % ctx, s"seq_off for doc ${r.getLong(1)}")
      running += r.getLong(2)
    }
  }

  test("segmentDedup keeps only the first occurrence of a repeated segment") {
    // seg size 2: doc 1 = [a b][c d], doc 2 = [a b][x y], doc 3 = [a b]
    // and doc 1 also repeats [c d] internally as its third segment
    val docs = Seq(
      (1L, "a b c d c d"),
      (2L, "a b x y"),
      (3L, "a b")
    ).toDF("doc_id", "text")
    val out = Curation.segmentDedup(docs, "text", segTokens = 2)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    // doc 1: 3 segs, keeps [a b] + first [c d], drops the repeat
    assert(out(1L) == ((3L, 2L, 0.6667)))
    // doc 2: [a b] lost to doc 1, [x y] kept
    assert(out(2L) == ((2L, 1L, 0.5)))
    // doc 3: everything lost
    assert(out(3L) == ((1L, 0L, 0.0)))
  }

  test("native segment hashes == slice/concat_ws formula on edge inputs") {
    val texts = Seq("a b c d e f g", "one", "", " pad  ded ", "\tx y\t",
      (1 to 23).map(i => s"w$i").mkString(" "))
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    for (n <- Seq(1, 3, 10)) {
      val toks = split(trim(col("text")), "\\s+")
      val nSegs = floor((size(toks) + lit(n - 1)) / lit(n)).cast("int")
      val formula = transform(sequence(lit(0), nSegs - 1), i =>
        MinHashLsh.hash60(concat(lit("seg:"),
          concat_ws(" ", slice(toks, i * n + 1, lit(n))))))
      val got = df.select(col("doc_id"),
          ShingleHash60.segmentColumn(col("text"), n, "seg:").as("native"),
          formula.as("ref"))
        .collect()
      got.foreach { r =>
        assert(r.getSeq[Long](1) == r.getSeq[Long](2),
          s"doc ${r.getLong(0)} n=$n: ${r.getSeq[Long](1)} != ${r.getSeq[Long](2)}")
      }
    }
  }

  test("segmentDedup short/ragged docs segment by ceil division") {
    val docs = Seq((1L, "t1 t2 t3 t4 t5 t6 t7")).toDF("doc_id", "text")
    val out = Curation.segmentDedup(docs, "text", segTokens = 3)
      .collect().head
    assert(out.getLong(1) == 3) // [t1 t2 t3][t4 t5 t6][t7]
    assert(out.getLong(2) == 3)
  }

  test("epochMix emits r_base copies plus hash-chosen extras, near target") {
    // 100 'big' docs + 10 'small' docs; target 50/50 → small needs
    // m_d = 55 copies from 10 docs: r_base 5 each + 5 extras
    val docs = ((1L to 100L).map(i => (i, "big")) ++
      (200L to 209L).map(i => (i, "small")))
      .toDF("doc_id", "lang")
      .withColumn("text", lit("x"))
    val tbp = when(col("lang") === "small", 5000L).otherwise(5000L)
    val out = Curation.epochMix(docs, "lang", col("doc_id"), tbp, "t")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val bySmall = out.filter(_._2 == "small")
    val byBig = out.filter(_._2 == "big")
    // every small doc repeats at least 5x; total tracks 55 within the
    // hash-noise band (binomial around 5 extras over 10 docs)
    assert(bySmall.groupBy(_._1).forall(_._2.size >= 5))
    assert(bySmall.size >= 50 && bySmall.size <= 60, s"got ${bySmall.size}")
    // big is over target: m_d = 55 from 100 docs → 0 base copies, ~55
    // hash-chosen docs emitted once
    assert(byBig.groupBy(_._1).forall(_._2.size == 1))
    assert(byBig.size >= 40 && byBig.size <= 70, s"got ${byBig.size}")
    // copy indices are dense 0..k-1 per doc
    out.groupBy(x => (x._1, x._2)).foreach { case (_, copies) =>
      assert(copies.map(_._3).toSeq.sorted == (0L until copies.size.toLong).toSeq)
    }
  }

  test("epochMix is deterministic and partitioning-invariant") {
    val docs = (1L to 60L).map(i => (i, if (i % 4 == 0) "a" else "b"))
      .toDF("doc_id", "lang")
    val tbp = when(col("lang") === "a", 7000L).otherwise(3000L)
    def run(df: org.apache.spark.sql.DataFrame) =
      Curation.epochMix(df, "lang", col("doc_id"), tbp, "t")
        .collect().map(r => (r.getLong(0), r.getLong(2))).sorted.toSeq
    assert(run(docs) == run(docs.repartition(7)))
    assert(run(docs).nonEmpty)
  }

  test("domainKlDivergence: zero for identical distributions, positive for skew") {
    // two domains with IDENTICAL token distributions: every per-token log
    // ratio is ln(1) = 0, so KL is exactly 0.0 for both
    val same = Seq(
      (1L, "a", "x y x"), (2L, "a", "y x y"),
      (3L, "b", "x y x"), (4L, "b", "y x y")
    ).toDF("doc_id", "dom", "text")
    val klSame = Curation.domainKlDivergence(same, "dom", "text")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(klSame.toSet == Set(("a", 6L, 0.0), ("b", 6L, 0.0)), klSame.toSeq)

    // a domain holding an exclusive token diverges positively; the other
    // is also nonzero (its distribution over {x} != the blend's {x, z})
    val skew = Seq(
      (1L, "a", "x x x"), (2L, "b", "x z z")
    ).toDF("doc_id", "dom", "text")
    val klSkew = Curation.domainKlDivergence(skew, "dom", "text")
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(klSkew("a") > 0.0 && klSkew("b") > 0.0, klSkew.toString)
    // hand value for a: 3 tokens all "x"; P_a(x)=1, P_c(x)=4/6 ->
    // KL = ln(6/4) = 0.4055 (4dp, micro-nat quantized)
    assert(math.abs(klSkew("a") - 0.4055) < 1e-9, klSkew.toString)
  }

  test("exactSubstringDedup: keep-first span removal, within-doc repeats, span union") {
    // doc 1 owns the 4-token span "a b c d"; doc 2 repeats it verbatim
    // inside other text; doc 3 repeats it TWICE (cross-doc + within-doc)
    val docs = Seq(
      (1L, "a b c d x y"),
      (2L, "p q a b c d r"),
      (3L, "a b c d m a b c d"),
      (4L, "u v w")
    ).toDF("doc_id", "text")
    val got = Curation.exactSubstringDedup(docs, "doc_id", "text", k = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .sortBy(_._1)
    // doc 1 is the first occurrence — untouched; doc 2 loses exactly the
    // 4 duplicated tokens; doc 3 loses both copies (positions 1-4 and
    // 6-9, the 'm' survives); doc 4 is shorter than k — untouched
    assert(got(0) == ((1L, 6L, 0L, "a b c d x y")), got(0))
    assert(got(1) == ((2L, 7L, 4L, "p q r")), got(1))
    assert(got(2) == ((3L, 9L, 8L, "m")), got(2))
    assert(got(3) == ((4L, 3L, 0L, "u v w")), got(3))

    // span-union law: a duplicated RUN longer than k is removed in full,
    // because consecutive duplicate windows overlap-cover the whole run
    val run = Seq(
      (10L, "t1 t2 t3 t4 t5 t6"),          // owns the 6-token run
      (11L, "zz t1 t2 t3 t4 t5 t6 qq")     // repeats it -> loses all 6
    ).toDF("doc_id", "text")
    val r11 = Curation.exactSubstringDedup(run, "doc_id", "text", k = 4)
      .filter($"doc_id" === 11L).collect().head
    assert(r11.getLong(2) == 6L && r11.getString(3) == "zz qq", r11)
  }

  test("weightedSample: deterministic, weight-proportional, excludes w<=0") {
    val docs = (1L to 400L).map(i =>
      (i, if (i <= 20) 1000L else if (i <= 400) 1L else 1L))
      .toDF("doc_id", "w")
      .unionByName(Seq((999L, 0L), (998L, -5L)).toDF("doc_id", "w"))
    def draw() = Curation.weightedSample(docs, col("doc_id"), col("w"),
        k = 30, salt = "t").select("doc_id")
      .collect().map(_.getLong(0)).toSet
    val a = draw()
    assert(a == draw(), "hash-derived sample must be identical across runs")
    assert(!a.contains(999L) && !a.contains(998L))
    // the 20 heavy docs (1000x weight) dominate a k=30 draw
    assert(a.count(_ <= 20) >= 15, s"heavy docs drawn: ${a.count(_ <= 20)}")
    // partitioning invariance
    val b = Curation.weightedSample(docs.repartition(13), col("doc_id"),
        col("w"), k = 30, salt = "t").select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(a == b)
  }
}
