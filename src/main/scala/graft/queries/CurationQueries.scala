package graft.queries

import org.apache.spark.sql.functions._

import graft.functions.{Curation, CurationPipeline}
import graft.sources.Tables

/** Corpus-curation operators over `documents` (LLM-pipeline extension):
  * benchmark decontamination, Gopher-style repetition filters,
  * deterministic stratified sampling and domain-mix rebalancing. All
  * sampling decisions are 60-bit md5 hashes — no RNG — so the DuckDB
  * oracle replays every kept row bit-exactly.
  */
object CurationQueries extends QuerySet {

  // doc_id % 50 == 0 stands in for the held-out benchmark set the corpus
  // must be decontaminated against
  private val EvalMod = 50
  private val ReservoirN = 20
  private val NoveltyRefN = 100
  private val SubstrK = 8

  val queries: Map[String, QFn] = Map(
    // benchmark decontamination: training docs sharing >= 1 four-token
    // shingle with the eval set, with the count of contaminated shingles
    // (downstream: anti-join these ids out of the corpus)
    "q_decontaminate" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      Curation.decontaminate(
        docs.filter(col("doc_id") % EvalMod =!= 0),
        docs.filter(col("doc_id") % EvalMod === 0),
        "text", n = 4)
    }),

    // Gopher-style repetition statistics + filter fractions per doc
    "q_repetition" -> ((s, d) =>
      Curation.repetitionStats(Tables.documents(s, d), "text")),

    // stratified sampling: per-language keep rates in basis points,
    // decided by a deterministic per-doc hash bucket
    "q_stratified_sample" -> ((s, d) => {
      val rate = when(col("lang") === "en", 8000L)
        .when(col("lang") === "de", 5000L)
        .when(col("lang") === "fr", 2500L)
        .otherwise(1000L)
      Curation.hashSample(Tables.documents(s, d), col("doc_id"), "sample", rate)
        .select(col("doc_id"), col("lang"),
          Curation.sampleBucket(col("doc_id"), "sample").as("bucket"))
    }),

    // temperature-balanced resampling across source domains (alpha=0.5
    // smoothing): head domains downsample toward the tail by
    // floor(10000*sqrt(n_min/n_d)) basis points — sqrt, not pow, so the
    // rate is correctly-rounded-identical in both engines
    "q_temperature_sample" -> ((s, d) =>
      Curation.temperatureSample(Tables.documents(s, d), "lang",
        col("doc_id"), "temp")
        .select(col("doc_id"), col("lang"), col("keep_bp"))),

    // corpus profiling: exact per-language length quantiles by
    // NEAREST-RANK selection (rank = ceil(q*n), all-integer, so the
    // DuckDB replay is hash-exact — no interpolation doubles).
    // Skew-safe: a per-(lang, n_chars) histogram + cumulative-rank
    // selection — no per-language row sort funnels half the corpus
    // into one task (see Curation.exactQuantiles)
    "q_length_quantiles" -> ((s, d) =>
      Curation.exactQuantiles(Tables.documents(s, d), "lang", "n_chars",
        Seq(50, 90, 99))),

    // token-weighted length quantiles: the n_chars cutoff below which
    // p% of each language's TOKENS live — the question a token-budgeted
    // curation run asks. Weight = the native whitespace token count
    // (graft_token_count, bit-equal to the split-based formula DuckDB
    // replays); same single-scan histogram plan as q_length_quantiles
    "q_weighted_quantiles" -> ((s, d) =>
      Curation.exactQuantilesWeighted(Tables.documents(s, d), "lang",
        "n_chars",
        graft.functions.TokenCount.column(col("text")).cast("long"),
        Seq(50, 90, 99))),

    // THE end-to-end curation pipeline (functions/CurationPipeline):
    // quality gate -> exact dedup -> decontaminate -> near-dup dedup
    // (LSH + Jaccard + connected components, survivors only) -> sampled
    // corpus. Stage 4 runs its iterative CC jobs at composition time
    // (inherent to a fixpoint algorithm, like q_dedup_clusters)
    "q_curation_pipeline" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      CurationPipeline.curate(
        docs.filter(col("doc_id") % EvalMod =!= 0),
        docs.filter(col("doc_id") % EvalMod === 0)).kept
    }),

    // reproducible training-shard shuffle: shard + within-shard order
    // are pure functions of the doc id, so a re-run (or an engine swap)
    // emits byte-identical shards; at scale this is repartition(shard)
    // + sortWithinPartitions(posh) feeding the shard writer
    "q_shuffle_shards" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val posh = graft.functions.MinHashLsh
        .hash60(concat(lit("pos:"), col("doc_id").cast("string")))
      Tables.documents(s, d)
        .select(col("doc_id"),
          (graft.functions.MinHashLsh
            .hash60(concat(lit("shard:"), col("doc_id").cast("string"))) % 8)
            .as("shard"),
          posh.as("posh"))
        .withColumn("pos", row_number().over(
          Window.partitionBy(col("shard")).orderBy(col("posh"), col("doc_id")))
          .cast("long"))
        .select(col("shard"), col("pos"), col("doc_id"))
    }),

    // PII redaction: the synthetic corpus carries no PII, so the query
    // plants a deterministic email/IP/phone suffix per doc (pure function
    // of doc_id — both engines build the identical string) and the
    // operator must scrub all three and count them
    "q_pii_redact" -> ((s, d) => {
      val aug = Tables.documents(s, d).select(col("doc_id"),
        concat(col("text"),
          lit(" contact u"), col("doc_id"), lit("@mail.example.com from 10."),
          col("doc_id") % 256, lit("."), (col("doc_id") * 7) % 256,
          lit(".4 or +420601"), col("doc_id") % 1000).as("text"))
      Curation.redactPii(aug, "text")
    }),

    // sequence packing: shuffle into 8 shards, concatenate each shard's
    // token stream, chunk into 2048-token training sequences; every doc
    // gets (seq_id, offset) from the running token total before it
    "q_pack_sequences" -> ((s, d) =>
      Curation.packSequences(Tables.documents(s, d), "text",
        ctx = 2048, nShards = 8)),

    // deterministic train/val/test split: one salted hash bucket per doc
    // partitions the corpus 80/10/10 — disjoint and complete by
    // construction, stable across re-runs, retries and engines, and a
    // doc's assignment never depends on corpus membership (the property
    // that keeps splits stable as the corpus grows)
    "q_train_split" -> ((s, d) => {
      val b = Curation.sampleBucket(col("doc_id"), "split")
      Tables.documents(s, d).select(col("doc_id"), col("lang"),
        when(b < 8000, "train").when(b < 9000, "val").otherwise("test")
          .as("split"))
    }),

    // LEAKAGE-SAFE split: hash the GROUP key (source domain), not the
    // doc — every doc of a domain lands in the same split, so near-dup
    // pages within a site can never straddle train/test (the eval-
    // hygiene rule doc-level splitting silently violates). Same pure
    // map-side bucketing as q_train_split, different hashed key
    "q_group_split" -> ((s, d) => {
      val b = Curation.sampleBucket(col("source"), "gsplit")
      Tables.documents(s, d).select(col("doc_id"), col("source"),
        when(b < 8000, "train").when(b < 9000, "val").otherwise("test")
          .as("split"))
    }),

    // segment-level exact dedup (CCNet-style paragraph dedup with fixed
    // 10-token segments standing in for paragraphs): repeated segments
    // keep only their first (doc_id, seg_idx) occurrence; per-doc
    // retention stats
    "q_segment_dedup" -> ((s, d) =>
      Curation.segmentDedup(Tables.documents(s, d), "text", segTokens = 10)),

    // epoch-mix resampling toward explicit per-domain shares: fractional
    // epochs — every doc repeats m_d div n_d times, m_d mod n_d
    // hash-chosen docs get one extra copy (UP-sampling complement to
    // q_temperature_sample's down-only rates)
    "q_epoch_mix" -> ((s, d) => {
      val tbp = when(col("lang") === "en", 2000L)
        .when(col("lang") === "de", 3000L)
        .when(col("lang") === "fr", 2000L)
        .when(col("lang") === "es", 2000L)
        .otherwise(1000L)
      Curation.epochMix(Tables.documents(s, d), "lang", col("doc_id"),
        tbp, "epoch")
    }),

    // DSIR importance resampling (Xie et al. 2023): select the 20% of
    // non-English docs whose hashed unigram+bigram profile looks most
    // like the English target distribution, via Gumbel top-k over
    // integer micro-nat importance weights — the published data-
    // selection method, hash-deterministic end to end
    "q_dsir_sample" -> ((s, d) =>
      graft.functions.Dsir.sample(Tables.documents(s, d), "text",
        col("lang") === "en")),

    // deterministic weighted sampling without replacement (functions/
    // Curation.weightedSample): probability ∝ n_chars via Gumbel keys —
    // the generic Efraimidis–Spirakis primitive behind DSIR's selection,
    // exposed for plain weight columns. Map-only scoring, TakeOrdered
    // selection, hash-derived randomness the oracle replays exactly
    "q_weighted_sample" -> ((s, d) =>
      graft.functions.Curation.weightedSample(
          Tables.documents(s, d), col("doc_id"), col("n_chars"),
          k = 40, salt = "wsamp")
        .select(col("doc_id"), col("n_chars"), col("sample_key_micros"))),

    // link-graph centrality (functions/Centrality): integer-micro
    // PageRank over a deterministic citation graph (intra-source doc
    // chains + to-hub edges), 3 unrolled power iterations — the Common-
    // Crawl-style "rank hosts by connectivity" curation signal; hub
    // docs surface on top. Exact integer update rule, so the DuckDB
    // oracle replays every division bit-for-bit
    "q_centrality" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val docs = Tables.documents(s, d)
      val hub = docs
        .select(col("doc_id").as("src"),
          min("doc_id").over(Window.partitionBy("source")).as("dst"))
        .filter(col("src") =!= col("dst"))
      rankTop50(docChainEdges(docs).unionByName(hub), dangling = false)
    }),

    // the dangling-mass-redistributing PageRank variant over a graph
    // that actually HAS dangling nodes (chain edges only — each
    // source's last doc has no out-edge): per round the dangling rank
    // sum splits equally over all nodes before damping, still in exact
    // truncating-integer micros, so the unrolled SQL replays it
    // bit-for-bit
    "q_centrality_dangling" -> ((s, d) =>
      rankTop50(docChainEdges(Tables.documents(s, d)), dangling = true)),

    // declarative data-quality expectations (functions/Expectations):
    // the whole constraint suite — completeness, uniqueness, range,
    // set membership, min count — evaluated in ONE aggregation pass
    // (conditional partial aggregates, 1-row result), verdicts in exact
    // integer basis points so the report hash-matches cross-engine
    "q_data_quality" -> ((s, d) => {
      import graft.functions.Expectations._
      report(Tables.documents(s, d), Seq(
        Complete("text", 10000L),
        Unique("doc_id"),
        InRange("n_chars", 1L, 1000000L, 0L),
        InSet("lang", Seq("en", "de", "fr", "es", "zh"), 0L),
        MinCount(100L)))
    }),

    // fastText-style quality classifier (functions/QualityClassifier):
    // Naive Bayes over the DSIR hashed-n-gram feature space, trained on
    // the labeled half (even doc_id; positive = lang 'en'), scored over
    // EVERY document — the odd half is held out, so the output exhibits
    // generalization, and every score is an exact integer micro-nat sum
    "q_quality_classifier" -> ((s, d) => {
      import graft.functions.QualityClassifier
      val docs = Tables.documents(s, d)
      val m = QualityClassifier.train(
        docs.filter(col("doc_id") % 2 === 0), "text", col("lang") === "en")
      QualityClassifier.withScores(docs, "text", m, predCol = "pred_en")
        .select(col("doc_id"), col("lang"),
          (col("doc_id") % 2 === 0).as("train"),
          col("score_micros"), col("pred_en"))
    }),

    // Count-Min-sketch heavy hitters over the bigram stream: sketch pass
    // (d x w mergeable grid) -> candidate filter (est >= total/800,
    // no-false-negative) -> exact recount of candidates only. False
    // positives stay in the output flagged is_heavy=false so the
    // sketch's collision arithmetic is itself oracle-checked
    // spread BEFORE the shingle explode: the sketch pays d hashes per
    // token occurrence twice (grid build + estimate), and the whole
    // chain would otherwise inherit the scan's single split (measured:
    // spreading the docs halves the row; spreading the exploded tokens
    // doesn't — the explode itself serializes). No-op at production
    // split counts (Spread derives from the live partition count)
    "q_heavy_hitters" -> ((s, d) =>
      graft.functions.Cms.heavyHitters(
        graft.functions.MinHashLsh.shingles(
          graft.core.Spread.ifStarved(Tables.documents(s, d)),
          "text", n = 2, dedupe = false),
        "shingle")),

    // domain-mix rebalancing: downsample domains above the uniform
    // char-share target to it (rates from one tiny broadcast aggregate)
    "q_domain_mix" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val rates = Curation.domainMixRates(docs, "source", "n_chars")
      docs.join(broadcast(rates), "source")
        .filter(Curation.sampleBucket(col("doc_id"), "mix") < col("rate_bp"))
        .select(col("doc_id"), col("source"), col("rate_bp"))
    }),

    // per-domain unigram KL from the corpus blend — the mix diagnostic
    // feeding reweighting decisions; micro-nat quantized, integer sums
    "q_domain_kl" -> ((s, d) =>
      Curation.domainKlDivergence(Tables.documents(s, d), "source", "text")),

    // Lee et al. 2022 exact substring dedup: duplicated >= 8-token spans
    // cut from every occurrence after the first; the retained text rides
    // as an md5 fingerprint so the output stays ndocs-bounded at any sf
    "q_exact_substring_dedup" -> ((s, d) =>
      Curation.exactSubstringDedup(Tables.documents(s, d), "doc_id", "text",
          k = SubstrK)
        .select(col("doc_id"), col("n_tokens"), col("n_removed"),
          md5(col("text_dedup")).as("retained_fp"))),

    // fixed-n per-stratum uniform sample (exactly 20 docs per language)
    // via the bounded-buffer Aggregator — the map side reduces each
    // partition to ≤ n candidates per key BEFORE the exchange (the
    // window spelling would shuffle the whole corpus into 5 tasks)
    "q_reservoir_sample" -> ((s, d) =>
      graft.functions.Reservoir.sampleByKey(Tables.documents(s, d),
        "lang", "doc_id", n = ReservoirN, salt = "res")),

    // n-gram novelty of the crawl tail (doc_id >= 100) vs the reference
    // head: Bloom-prefiltered exact membership — bloom-negative grams
    // are provably novel and never shuffle; the exact semi-join cancels
    // the false positives (spec-pinned equal to the all-exact answer)
    "q_ngram_novelty" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      Curation.noveltyRate(
        docs.filter(col("doc_id") >= NoveltyRefN),
        docs.filter(col("doc_id") < NoveltyRefN),
        "text", n = 4)
    }),

    // per-source boilerplate strip: the corpus carries no boilerplate,
    // so the query plants a deterministic 5-token banner on 90% of each
    // source's docs (pure function of (source, doc_id) — both engines
    // build the identical string); the operator must detect the
    // dominant prefix per source and strip exactly it
    "q_boilerplate_strip" -> ((s, d) => {
      val planted = Tables.documents(s, d).select(col("doc_id"),
        col("source"),
        when(col("doc_id") % 10 =!= 0,
          concat(lit("start "), col("source"),
            lit("_promo official header notice "), col("text")))
          .otherwise(col("text")).as("text"))
      graft.functions.Boilerplate
        .stripCommonPrefix(planted, "doc_id", "source", "text", k = 5)
        .select(col("doc_id"), col("source"), col("stripped"),
          col("n_tokens"), md5(col("text_stripped")).as("retained_fp"))
    }),

    // URL canonicalization + canonical dedup: the corpus carries no
    // URLs, so each doc plants one (pure function of doc_id) exercising
    // every rule — uppercase scheme/host, default vs explicit port,
    // tracking params, unsorted params, fragments; %3=0 and %3=1 docs
    // with the same host/path must collide after the utm-strip + sort
    "q_url_dedup" -> ((s, d) =>
      graft.functions.UrlCanon.dedup(
        Tables.documents(s, d).select(col("doc_id"),
          CurationQueries.plantedUrl(col("doc_id")).as("url")),
        "doc_id", "url")),

    // HTML -> text extraction: each doc wrapped in a deterministic page
    // shell (script + style with droppable CONTENT, entities incl. the
    // encoded-tag and double-encoding traps); the operator must recover
    // exactly the visible text
    "q_html_extract" -> ((s, d) => {
      val html = concat(
        lit("<html><script type=\"x\">var hidden = "),
        col("doc_id").cast("string"), lit(";</script>"),
        lit("<style>p{color:red}</style><p>Header &amp; intro&nbsp;"),
        col("doc_id").cast("string"), lit("</p><b>"), col("text"),
        lit("</b><a href=\"http://x.com/?q=1\">&lt;link&gt;</a></html>"))
      val clean = graft.functions.HtmlExtract.extract(col("html"))
      Tables.documents(s, d).select(col("doc_id"), html.as("html"))
        .select(col("doc_id"), length(clean).cast("long").as("n_chars"),
          md5(clean).as("clean_fp"))
    })
  )

  // ---- DuckDB replays ----

  /** n-token shingles, 1-based positions: i ranges over [1, len-(n-1)). */
  /** Per-source doc-id chain edges (each doc links to its successor) —
    * the citation-graph base shared by both centrality queries.
    */
  private def docChainEdges(docs: org.apache.spark.sql.DataFrame) = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("source").orderBy("doc_id")
    docs.select(lag("doc_id", 1).over(w).as("src"), col("doc_id").as("dst"))
      .filter(col("src").isNotNull)
  }

  private def rankTop50(edges: org.apache.spark.sql.DataFrame,
      dangling: Boolean) =
    graft.functions.Centrality
      .pageRankMicros(edges, iters = 3, redistributeDangling = dangling)
      .orderBy(col("rank_micros").desc, col("id"))
      .limit(50)
      .withColumnRenamed("id", "doc_id")

  private def shingleSql(n: Int, distinct: Boolean, from: String = "documents") = {
    val gram = (0 until n).map(o => s"t.toks[t.i + $o]").mkString(" || ' ' || ")
    val sel = if (distinct) "SELECT DISTINCT" else "SELECT"
    s"""$sel doc_id, $gram AS g
       |FROM (
       |  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS toks,
       |         unnest(range(1, len(regexp_split_to_array(trim(text), '\\s+')) - ${n - 2})) AS i
       |  FROM $from) t""".stripMargin
  }

  private def bucket(salt: String, id: String) =
    s"('0x' || substr(md5('$salt:' || $id), 1, 15))::UBIGINT % 10000"

  private def hash60(salt: String, id: String) =
    s"('0x' || substr(md5('$salt:' || $id), 1, 15))::UBIGINT"

  /** The planted per-doc URL fixture — ONE definition shared by
    * q_url_dedup and the streaming q_url_dedup_stream (DedupQueries);
    * the SQL twin lives in [[plantedUrlSql]].
    */
  private[queries] def plantedUrl(id: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column =
    concat(lit("HTTP://WWW.Site"), (id % 7).cast("string"), lit(".COM"),
      when(id % 4 === 0, ":80").when(id % 4 === 1, ":8080").otherwise(""),
      lit("/Path/"), (id % 50).cast("string"),
      when(id % 3 === 0, "?utm_source=x&b=2&a=1")
        .when(id % 3 === 1, "?a=1&b=2").otherwise(""),
      when(id % 5 === 0, "#frag").otherwise(""))

  /** DuckDB twin of [[plantedUrl]] over the SQL id expression. */
  private[queries] def plantedUrlSql(id: String): String =
    s"'HTTP://WWW.Site' || CAST($id % 7 AS VARCHAR) || '.COM'" +
      s" || CASE WHEN $id % 4 = 0 THEN ':80'" +
      s" WHEN $id % 4 = 1 THEN ':8080' ELSE '' END" +
      s" || '/Path/' || CAST($id % 50 AS VARCHAR)" +
      s" || CASE WHEN $id % 3 = 0 THEN '?utm_source=x&b=2&a=1'" +
      s" WHEN $id % 3 = 1 THEN '?a=1&b=2' ELSE '' END" +
      s" || CASE WHEN $id % 5 = 0 THEN '#frag' ELSE '' END"

  private val langRateSql =
    """CASE lang WHEN 'en' THEN 8000 WHEN 'de' THEN 5000
      |          WHEN 'fr' THEN 2500 ELSE 1000 END""".stripMargin

  /** The full pipeline replay: identical stage semantics and integer
    * thresholds as [[graft.functions.CurationPipeline.curate]] with the
    * minhash/LSH/Jaccard fragments of the dedup oracles restricted to
    * the surviving corpus (K=8 affine permutations mod 2^31-1, 4 bands
    * x 2 rows, Jaccard >= 5/10 — the DedupPipeline defaults), INCLUDING
    * the per-bucket candidate cap: band buckets over
    * [[graft.functions.BucketedPairs.DefaultMaxBucket]] members emit no
    * pairs (bucket membership is deterministic md5, so the cap replays
    * exactly).
    */
  private val curationPipelineSql: String = {
    val K = 8
    val bandRows = 2
    val cap = graft.functions.BucketedPairs.DefaultMaxBucket
    def affine(j: Int) = {
      val a = 2L * j + 1
      val b = j * 7919L + 13L
      s"CAST(min(($a * hm + $b) % 2147483647) AS BIGINT) AS mh_$j"
    }
    val bands = (0 until K / bandRows).map { bnd =>
      val cols = (0 until bandRows).map(r => s"CAST(mh_${bnd * bandRows + r} AS VARCHAR)")
      s"SELECT doc_id, $bnd AS band, ${cols.mkString(" || '|' || ")} AS bval FROM sig"
    }.mkString("\nUNION ALL\n")
    s"""WITH RECURSIVE
       |base AS (SELECT * FROM documents WHERE doc_id % $EvalMod <> 0),
       |toks AS (
       |  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS tk FROM base
       |),
       |s1 AS (
       |  SELECT b.* FROM base b JOIN toks USING (doc_id)
       |  WHERE len(tk) >= 30 AND len(list_distinct(tk)) * 100 >= len(tk) * 35
       |),
       |keep2 AS (SELECT min(doc_id) AS doc_id FROM s1 GROUP BY md5(text)),
       |s2 AS (SELECT s1.* FROM s1 JOIN keep2 USING (doc_id)),
       |g4 AS (${shingleSql(4, distinct = true)}),
       |ev AS (SELECT DISTINCT g FROM g4 WHERE doc_id % $EvalMod = 0),
       |cont AS (
       |  SELECT DISTINCT s2.doc_id FROM s2
       |  JOIN g4 ON g4.doc_id = s2.doc_id
       |  JOIN ev ON ev.g = g4.g
       |),
       |s3 AS (
       |  SELECT s2.* FROM s2
       |  WHERE doc_id NOT IN (SELECT doc_id FROM cont)
       |),
       |sh AS (${shingleSql(3, distinct = true, from = "s3")}),
       |hv AS (
       |  SELECT doc_id,
       |         ('0x' || substr(md5(g), 1, 15))::UBIGINT % 2147483647 AS hm
       |  FROM sh
       |),
       |sig AS (
       |  SELECT doc_id, ${(0 until K).map(affine).mkString(", ")}
       |  FROM hv GROUP BY doc_id
       |),
       |banded AS (
       |$bands
       |),
       |okb AS (
       |  SELECT band, bval FROM banded
       |  GROUP BY 1, 2 HAVING count(*) <= $cap
       |),
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
       |  FROM banded a
       |  JOIN okb ON okb.band = a.band AND okb.bval = a.bval
       |  JOIN banded b
       |    ON a.band = b.band AND a.bval = b.bval AND a.doc_id < b.doc_id
       |),
       |sz AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY 1),
       |inter AS (
       |  SELECT c.a_id, c.b_id, count(*) AS inter
       |  FROM cand c
       |  JOIN sh a ON a.doc_id = c.a_id
       |  JOIN sh b ON b.doc_id = c.b_id AND b.g = a.g
       |  GROUP BY 1, 2
       |),
       |pairs AS (
       |  SELECT i.a_id, i.b_id FROM inter i
       |  JOIN sz sa ON sa.doc_id = i.a_id
       |  JOIN sz sb ON sb.doc_id = i.b_id
       |  WHERE i.inter * 10 >= (sa.sz + sb.sz - i.inter) * 5
       |),
       |edges AS (
       |  SELECT a_id AS x, b_id AS y FROM pairs
       |  UNION SELECT b_id, a_id FROM pairs
       |),
       |reach(x, y) AS (
       |  SELECT x, y FROM edges
       |  UNION
       |  SELECT r.x, e.y FROM reach r JOIN edges e ON r.y = e.x
       |),
       |cc AS (
       |  SELECT x AS doc_id, least(x, min(y)) AS component
       |  FROM reach GROUP BY x
       |),
       |s4 AS (
       |  SELECT s3.* FROM s3 LEFT JOIN cc ON cc.doc_id = s3.doc_id
       |  WHERE cc.component IS NULL OR cc.component = s3.doc_id
       |)
       |SELECT doc_id, lang, source FROM s4
       |WHERE ${bucket("sample", "doc_id")} < $langRateSql""".stripMargin
  }

  val oracles: Map[String, String] = Map(
    "q_reservoir_sample" ->
      graft.functions.Reservoir.oracleSql("lang", "doc_id", ReservoirN, "res"),

    // same shingle replay as q_decontaminate; membership via IN (exact),
    // matching the engine's bloom-prefilter + exact-semi-join two-phase
    "q_ngram_novelty" ->
      s"""WITH sh AS (${shingleSql(4, distinct = true)}),
         |ref AS (SELECT DISTINCT g FROM sh WHERE doc_id < $NoveltyRefN),
         |ev AS (SELECT doc_id, g FROM sh WHERE doc_id >= $NoveltyRefN),
         |tot AS (
         |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams
         |  FROM ev GROUP BY 1
         |), seen AS (
         |  SELECT doc_id, CAST(count(*) AS BIGINT) AS ns
         |  FROM ev WHERE g IN (SELECT g FROM ref) GROUP BY 1
         |)
         |SELECT t.doc_id, t.n_grams,
         |       t.n_grams - COALESCE(s.ns, CAST(0 AS BIGINT)) AS n_novel,
         |       round(CAST(t.n_grams - COALESCE(s.ns, CAST(0 AS BIGINT)) AS DOUBLE)
         |             / CAST(t.n_grams AS DOUBLE), 6) AS novelty
         |FROM tot t LEFT JOIN seen s ON s.doc_id = t.doc_id""".stripMargin,

    // identical page-shell planting; extraction replayed by the shared
    // pattern chain (HtmlExtract.extractSql)
    "q_html_extract" ->
      s"""WITH h AS (
         |  SELECT doc_id,
         |         '<html><script type="x">var hidden = '
         |         || CAST(doc_id AS VARCHAR) || ';</script>'
         |         || '<style>p{color:red}</style><p>Header &amp; intro&nbsp;'
         |         || CAST(doc_id AS VARCHAR) || '</p><b>' || text
         |         || '</b><a href="http://x.com/?q=1">&lt;link&gt;</a></html>' AS html
         |  FROM documents
         |)
         |SELECT doc_id,
         |       CAST(length(${graft.functions.HtmlExtract.extractSql("html")}) AS BIGINT) AS n_chars,
         |       md5(${graft.functions.HtmlExtract.extractSql("html")}) AS clean_fp
         |FROM h""".stripMargin,

    // identical URL planting; canonical form replayed by the shared
    // regex/sort rules (UrlCanon.canonSql)
    "q_url_dedup" ->
      s"""WITH u AS (
         |  SELECT doc_id, ${plantedUrlSql("doc_id")} AS url
         |  FROM documents
         |), c AS (
         |  SELECT doc_id, ${graft.functions.UrlCanon.canonSql("url")} AS canon
         |  FROM u
         |), f AS (
         |  SELECT canon, min(doc_id) AS dup_of FROM c GROUP BY 1
         |)
         |SELECT c.doc_id, c.canon, f.dup_of
         |FROM c JOIN f USING (canon)""".stripMargin,

    // identical banner planting, detection threshold and tie-break as
    // the engine; md5 fingerprints compare the stripped text exactly
    "q_boilerplate_strip" ->
      s"""WITH planted AS (
         |  SELECT doc_id, source,
         |         CASE WHEN doc_id % 10 <> 0
         |           THEN 'start ' || source || '_promo official header notice ' || text
         |           ELSE text END AS text
         |  FROM documents
         |), tok AS (
         |  SELECT doc_id, source, regexp_split_to_array(trim(text), '\\s+') AS ts
         |  FROM planted
         |), pfx AS (
         |  SELECT doc_id, source, ts,
         |         CASE WHEN len(ts) >= 5
         |           THEN array_to_string(ts[1:5], ' ') END AS p
         |  FROM tok
         |), cnt AS (
         |  SELECT source, p, count(*) AS c
         |  FROM pfx WHERE p IS NOT NULL GROUP BY 1, 2
         |), tot AS (
         |  SELECT source, count(*) AS n FROM tok GROUP BY 1
         |), boil AS (
         |  SELECT source, p FROM (
         |    SELECT c.source, c.p, c.c, t.n,
         |           row_number() OVER (PARTITION BY c.source
         |             ORDER BY c.c DESC, c.p) AS rk
         |    FROM cnt c JOIN tot t USING (source))
         |  WHERE rk = 1 AND c * 10000 >= n * 5000
         |)
         |SELECT f.doc_id, f.source,
         |       COALESCE(f.p = b.p, FALSE) AS stripped,
         |       CAST(CASE WHEN COALESCE(f.p = b.p, FALSE)
         |         THEN len(f.ts) - 5 ELSE len(f.ts) END AS BIGINT) AS n_tokens,
         |       md5(CASE WHEN COALESCE(f.p = b.p, FALSE)
         |         THEN array_to_string(f.ts[6:], ' ')
         |         ELSE array_to_string(f.ts, ' ') END) AS retained_fp
         |FROM pfx f LEFT JOIN boil b ON b.source = f.source""".stripMargin,

    "q_decontaminate" ->
      s"""WITH sh AS (${shingleSql(4, distinct = true)}),
         |ev AS (SELECT DISTINCT g FROM sh WHERE doc_id % $EvalMod = 0)
         |SELECT s.doc_id, CAST(count(*) AS BIGINT) AS n_hits
         |FROM sh s JOIN ev USING (g)
         |WHERE s.doc_id % $EvalMod <> 0
         |GROUP BY 1""".stripMargin,

    "q_repetition" ->
      s"""WITH tok AS (
         |  SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\\s+')) AS t
         |  FROM documents
         |), tc AS (
         |  SELECT doc_id, t, count(*) AS c FROM tok GROUP BY 1, 2
         |), t1 AS (
         |  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
         |         CAST(count(*) AS BIGINT) AS n_distinct,
         |         CAST(max(c) AS BIGINT) AS top_token
         |  FROM tc GROUP BY 1
         |), bg AS (${shingleSql(2, distinct = false)}),
         |bc AS (
         |  SELECT doc_id, g, count(*) AS c FROM bg GROUP BY 1, 2
         |), t2 AS (
         |  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_bigrams,
         |         CAST(max(c) AS BIGINT) AS top_bigram
         |  FROM bc GROUP BY 1
         |)
         |SELECT t1.doc_id, n_tokens, n_distinct, top_token,
         |       CAST(coalesce(n_bigrams, 0) AS BIGINT) AS n_bigrams,
         |       CAST(coalesce(top_bigram, 0) AS BIGINT) AS top_bigram,
         |       round(1 - n_distinct / CAST(n_tokens AS DOUBLE), 4) AS dup_token_frac,
         |       CASE WHEN n_bigrams IS NULL THEN 0.0
         |            ELSE round(top_bigram / CAST(n_bigrams AS DOUBLE), 4)
         |       END AS top_bigram_frac
         |FROM t1 LEFT JOIN t2 ON t1.doc_id = t2.doc_id""".stripMargin,

    "q_stratified_sample" ->
      s"""SELECT doc_id, lang,
         |  CAST(${bucket("sample", "doc_id")} AS BIGINT) AS bucket
         |FROM documents
         |WHERE ${bucket("sample", "doc_id")} < $langRateSql""".stripMargin,

    "q_temperature_sample" ->
      s"""WITH c AS (
         |  SELECT lang, count(*) AS n_d FROM documents GROUP BY 1
         |), r AS (
         |  SELECT lang,
         |         CAST(floor(10000.0 * sqrt(
         |           (SELECT CAST(min(n_d) AS DOUBLE) FROM c)
         |             / CAST(n_d AS DOUBLE))) AS BIGINT) AS keep_bp
         |  FROM c
         |)
         |SELECT d.doc_id, d.lang, r.keep_bp
         |FROM documents d JOIN r USING (lang)
         |WHERE ${bucket("temp", "d.doc_id")} < r.keep_bp""".stripMargin,

    "q_train_split" ->
      s"""SELECT doc_id, lang,
         |  CASE WHEN ${bucket("split", "doc_id")} < 8000 THEN 'train'
         |       WHEN ${bucket("split", "doc_id")} < 9000 THEN 'val'
         |       ELSE 'test' END AS split
         |FROM documents""".stripMargin,

    "q_group_split" ->
      s"""SELECT doc_id, source,
         |  CASE WHEN ${bucket("gsplit", "source")} < 8000 THEN 'train'
         |       WHEN ${bucket("gsplit", "source")} < 9000 THEN 'val'
         |       ELSE 'test' END AS split
         |FROM documents""".stripMargin,

    // segment dedup replay: 10-token segments via 1-based inclusive
    // array slices, packed (doc_id, seg_idx) occurrence keys, min per
    // segment hash
    "q_segment_dedup" ->
      s"""WITH tk AS (
         |  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS t
         |  FROM documents
         |), seg AS (
         |  SELECT doc_id, i AS seg_idx,
         |         array_to_string(t[(i*10+1):(i*10+10)], ' ') AS seg
         |  FROM (SELECT doc_id, t, unnest(range(0, (len(t)+9)//10)) AS i
         |        FROM tk)
         |), hs AS (
         |  SELECT doc_id, seg_idx, ${hash60("seg", "seg")} AS h,
         |         doc_id * 1048576 + seg_idx AS pk
         |  FROM seg
         |), m AS (SELECT h, min(pk) AS min_pk FROM hs GROUP BY 1)
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_segs,
         |       CAST(sum(CASE WHEN pk = min_pk THEN 1 ELSE 0 END) AS BIGINT)
         |         AS n_kept,
         |       round(sum(CASE WHEN pk = min_pk THEN 1 ELSE 0 END)
         |         / CAST(count(*) AS DOUBLE), 4) AS kept_ratio
         |FROM hs JOIN m USING (h) GROUP BY 1""".stripMargin,

    // epoch-mix replay: integer rate table (m_d = w_bp*N div 10000,
    // r_base = m_d div n_d, extra_bp for the remainder), hash-chosen
    // extra copies, range-expansion per emitted copy
    "q_epoch_mix" ->
      s"""WITH nd AS (SELECT lang, count(*) AS n_d FROM documents GROUP BY 1),
         |tot AS (SELECT count(*) AS n_total FROM documents),
         |r AS (
         |  SELECT lang, n_d,
         |    (CASE lang WHEN 'en' THEN 2000 WHEN 'de' THEN 3000
         |               WHEN 'fr' THEN 2000 WHEN 'es' THEN 2000
         |               ELSE 1000 END
         |      * (SELECT n_total FROM tot)) // 10000 AS m_d
         |  FROM nd
         |), rr AS (
         |  SELECT lang, m_d // n_d AS r_base,
         |         ((m_d % n_d) * 10000) // n_d AS extra_bp
         |  FROM r
         |)
         |SELECT d.doc_id, d.lang,
         |  unnest(range(0, r_base +
         |    CASE WHEN ${bucket("epoch", "d.doc_id")} < extra_bp
         |         THEN 1 ELSE 0 END)) AS copy_idx
         |FROM documents d JOIN rr USING (lang)""".stripMargin,

    // DSIR replay: identical hashed features (unigrams + space-joined
    // bigrams into 1024 buckets), add-one-smoothed micro-nat lambda
    // table, integer per-doc weight sums, Gumbel keys from the shared
    // md5 uniform, top-20% by (key desc, doc_id)
    "q_dsir_sample" ->
      s"""WITH tk AS (
         |  SELECT doc_id, lang, regexp_split_to_array(trim(text), '\\s+') AS t
         |  FROM documents
         |), feat AS (
         |  SELECT doc_id, unnest(t) AS g FROM tk
         |  UNION ALL
         |  SELECT doc_id, t[i] || ' ' || t[i+1] AS g
         |  FROM (SELECT doc_id, t, unnest(range(1, len(t))) AS i FROM tk)
         |), fb AS (
         |  SELECT f.doc_id, d.lang, ${hash60("dsir", "g")} % 1024 AS b
         |  FROM feat f JOIN documents d USING (doc_id)
         |), ct AS (SELECT b, count(*) AS c FROM fb WHERE lang = 'en' GROUP BY 1),
         |cr AS (SELECT b, count(*) AS c FROM fb WHERE lang <> 'en' GROUP BY 1),
         |nt AS (SELECT count(*) AS n FROM fb WHERE lang = 'en'),
         |nr AS (SELECT count(*) AS n FROM fb WHERE lang <> 'en'),
         |lam AS (
         |  SELECT r.range AS b,
         |    CAST(round((ln(coalesce(ct.c, 0) + 1)
         |              - ln(CAST((SELECT n FROM nt) + 1024 AS DOUBLE))
         |              - ln(coalesce(cr.c, 0) + 1)
         |              + ln(CAST((SELECT n FROM nr) + 1024 AS DOUBLE))) * 1e6)
         |      AS BIGINT) AS lam
         |  FROM range(1024) r
         |  LEFT JOIN ct ON ct.b = r.range LEFT JOIN cr ON cr.b = r.range
         |), w AS (
         |  SELECT doc_id, CAST(sum(lam) AS BIGINT) AS logw_micros
         |  FROM fb JOIN lam USING (b) WHERE lang <> 'en' GROUP BY 1
         |), scored AS (
         |  SELECT d.doc_id, d.lang, w.logw_micros,
         |    CAST(w.logw_micros + CAST(round(-ln(-ln(
         |        (CAST(${hash60("gum", "d.doc_id")} AS DOUBLE) + 0.5)
         |          / 1152921504606846976.0)) * 1e6) AS BIGINT)
         |      AS BIGINT) AS key_micros
         |  FROM w JOIN documents d USING (doc_id)
         |)
         |SELECT doc_id, lang, logw_micros, key_micros FROM scored
         |QUALIFY row_number() OVER (ORDER BY key_micros DESC, doc_id) <=
         |  ((SELECT count(*) FROM documents WHERE lang <> 'en') * 2000 + 9999)
         |    // 10000""".stripMargin,

    // ln(weight) and the Gumbel perturbation are QUANTIZED SEPARATELY
    // (two rounds) before the integer sum — replaying both rounding
    // points is what makes the drawn sample bit-identical
    "q_weighted_sample" ->
      s"""SELECT doc_id, n_chars, sample_key_micros FROM (
         |  SELECT doc_id, n_chars,
         |    CAST(round(ln(CAST(n_chars AS DOUBLE)) * 1e6) AS BIGINT)
         |    + CAST(round(-ln(-ln(
         |        (CAST(${hash60("wsamp", "doc_id")} AS DOUBLE) + 0.5)
         |          / 1152921504606846976.0)) * 1e6) AS BIGINT)
         |      AS sample_key_micros
         |  FROM documents WHERE n_chars > 0)
         |ORDER BY sample_key_micros DESC, doc_id LIMIT 40""".stripMargin,

    // three power iterations unrolled (recursive CTEs cannot aggregate);
    // base = (10000-8500)*1e6//10000 = 150000 micro-units
    "q_centrality" ->
      """WITH e AS (
        |  SELECT src, dst FROM (
        |    SELECT lag(doc_id) OVER (PARTITION BY source ORDER BY doc_id) AS src,
        |           doc_id AS dst FROM documents) WHERE src IS NOT NULL
        |  UNION ALL
        |  SELECT doc_id AS src, m AS dst FROM (
        |    SELECT doc_id, min(doc_id) OVER (PARTITION BY source) AS m
        |    FROM documents) WHERE doc_id <> m
        |), n AS (
        |  SELECT DISTINCT id FROM (
        |    SELECT src AS id FROM e UNION ALL SELECT dst AS id FROM e)
        |), od AS (SELECT src, count(*) AS d FROM e GROUP BY 1),
        |r0 AS (SELECT id, CAST(1000000 AS BIGINT) AS r FROM n),
        |c1 AS (SELECT e.dst, CAST(sum(r0.r // od.d) AS BIGINT) AS c
        |       FROM e JOIN od USING (src) JOIN r0 ON r0.id = e.src GROUP BY 1),
        |r1 AS (SELECT n.id, CAST(150000 + 8500 * coalesce(c1.c, 0) // 10000 AS BIGINT) AS r
        |       FROM n LEFT JOIN c1 ON c1.dst = n.id),
        |c2 AS (SELECT e.dst, CAST(sum(r1.r // od.d) AS BIGINT) AS c
        |       FROM e JOIN od USING (src) JOIN r1 ON r1.id = e.src GROUP BY 1),
        |r2 AS (SELECT n.id, CAST(150000 + 8500 * coalesce(c2.c, 0) // 10000 AS BIGINT) AS r
        |       FROM n LEFT JOIN c2 ON c2.dst = n.id),
        |c3 AS (SELECT e.dst, CAST(sum(r2.r // od.d) AS BIGINT) AS c
        |       FROM e JOIN od USING (src) JOIN r2 ON r2.id = e.src GROUP BY 1),
        |r3 AS (SELECT n.id, CAST(150000 + 8500 * coalesce(c3.c, 0) // 10000 AS BIGINT) AS r
        |       FROM n LEFT JOIN c3 ON c3.dst = n.id)
        |SELECT id AS doc_id, r AS rank_micros FROM r3
        |ORDER BY r DESC, id LIMIT 50""".stripMargin,

    // chain-only graph (dangling tails), three unrolled iterations with
    // the per-round dangling share: share_r = (Σ rank of out-degree-0
    // nodes) // |nodes|, folded into every contribution before damping
    "q_centrality_dangling" ->
      """WITH e AS (
        |  SELECT src, dst FROM (
        |    SELECT lag(doc_id) OVER (PARTITION BY source ORDER BY doc_id) AS src,
        |           doc_id AS dst FROM documents) WHERE src IS NOT NULL
        |), n AS (
        |  SELECT DISTINCT id FROM (
        |    SELECT src AS id FROM e UNION ALL SELECT dst AS id FROM e)
        |), nn AS (SELECT count(*) AS cnt FROM n),
        |od AS (SELECT src, count(*) AS d FROM e GROUP BY 1),
        |r0 AS (SELECT id, CAST(1000000 AS BIGINT) AS r FROM n),
        |d1 AS (SELECT CAST(coalesce(sum(r0.r), 0) // (SELECT cnt FROM nn) AS BIGINT) AS sh
        |       FROM r0 LEFT JOIN od ON od.src = r0.id WHERE od.src IS NULL),
        |c1 AS (SELECT e.dst, CAST(sum(r0.r // od.d) AS BIGINT) AS c
        |       FROM e JOIN od USING (src) JOIN r0 ON r0.id = e.src GROUP BY 1),
        |r1 AS (SELECT n.id, CAST(150000 + 8500 * (coalesce(c1.c, 0) + (SELECT sh FROM d1)) // 10000 AS BIGINT) AS r
        |       FROM n LEFT JOIN c1 ON c1.dst = n.id),
        |d2 AS (SELECT CAST(coalesce(sum(r1.r), 0) // (SELECT cnt FROM nn) AS BIGINT) AS sh
        |       FROM r1 LEFT JOIN od ON od.src = r1.id WHERE od.src IS NULL),
        |c2 AS (SELECT e.dst, CAST(sum(r1.r // od.d) AS BIGINT) AS c
        |       FROM e JOIN od USING (src) JOIN r1 ON r1.id = e.src GROUP BY 1),
        |r2 AS (SELECT n.id, CAST(150000 + 8500 * (coalesce(c2.c, 0) + (SELECT sh FROM d2)) // 10000 AS BIGINT) AS r
        |       FROM n LEFT JOIN c2 ON c2.dst = n.id),
        |d3 AS (SELECT CAST(coalesce(sum(r2.r), 0) // (SELECT cnt FROM nn) AS BIGINT) AS sh
        |       FROM r2 LEFT JOIN od ON od.src = r2.id WHERE od.src IS NULL),
        |c3 AS (SELECT e.dst, CAST(sum(r2.r // od.d) AS BIGINT) AS c
        |       FROM e JOIN od USING (src) JOIN r2 ON r2.id = e.src GROUP BY 1),
        |r3 AS (SELECT n.id, CAST(150000 + 8500 * (coalesce(c3.c, 0) + (SELECT sh FROM d3)) // 10000 AS BIGINT) AS r
        |       FROM n LEFT JOIN c3 ON c3.dst = n.id)
        |SELECT id AS doc_id, r AS rank_micros FROM r3
        |ORDER BY r DESC, id LIMIT 50""".stripMargin,

    // one measurement CTE, five verdict rows — identical check labels
    // and integer-bp arithmetic as Expectations.report
    "q_data_quality" ->
      """WITH m AS (
        |  SELECT count(*) AS n, count(text) AS c_text,
        |         count(DISTINCT doc_id) AS d_id, count(doc_id) AS nn_id,
        |         CAST(sum(CASE WHEN n_chars IS NOT NULL
        |              AND (n_chars < 1 OR n_chars > 1000000)
        |              THEN 1 ELSE 0 END) AS BIGINT) AS v_range,
        |         count(n_chars) AS nn_chars,
        |         CAST(sum(CASE WHEN lang IS NOT NULL
        |              AND lang NOT IN ('en','de','fr','es','zh')
        |              THEN 1 ELSE 0 END) AS BIGINT) AS v_set,
        |         count(lang) AS nn_lang
        |  FROM documents
        |)
        |SELECT 'complete(text)>=10000' AS "check",
        |       c_text * 10000 // n AS metric_bp,
        |       CAST(10000 AS BIGINT) AS bound_bp,
        |       c_text * 10000 // n >= 10000 AS pass FROM m
        |UNION ALL
        |SELECT 'unique(doc_id)', d_id * 10000 // nn_id,
        |       CAST(10000 AS BIGINT), d_id * 10000 // nn_id = 10000 FROM m
        |UNION ALL
        |SELECT 'in_range(n_chars,1,1000000)<=0', v_range * 10000 // nn_chars,
        |       CAST(0 AS BIGINT), v_range * 10000 // nn_chars <= 0 FROM m
        |UNION ALL
        |SELECT 'in_set(lang)<=0', v_set * 10000 // nn_lang,
        |       CAST(0 AS BIGINT), v_set * 10000 // nn_lang <= 0 FROM m
        |UNION ALL
        |SELECT 'count>=100', n, CAST(100 AS BIGINT), n >= 100 FROM m""".stripMargin,

    // NB classifier replay: λ from the TRAIN half's conditional feature
    // counts (the q_dsir_sample formula with the labeled subset as both
    // distributions' source), prior from train DOC counts, score = exact
    // integer sum over every doc's feature buckets
    "q_quality_classifier" ->
      s"""WITH tk AS (
         |  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS t
         |  FROM documents
         |), feat AS (
         |  SELECT doc_id, unnest(t) AS g FROM tk
         |  UNION ALL
         |  SELECT doc_id, t[i] || ' ' || t[i+1] AS g
         |  FROM (SELECT doc_id, t, unnest(range(1, len(t))) AS i FROM tk)
         |), fb AS (
         |  SELECT f.doc_id, d.lang, d.doc_id % 2 = 0 AS train,
         |         ${hash60("dsir", "g")} % 1024 AS b
         |  FROM feat f JOIN documents d USING (doc_id)
         |), ct AS (SELECT b, count(*) AS c FROM fb
         |          WHERE train AND lang = 'en' GROUP BY 1),
         |cr AS (SELECT b, count(*) AS c FROM fb
         |       WHERE train AND lang <> 'en' GROUP BY 1),
         |nt AS (SELECT count(*) AS n FROM fb WHERE train AND lang = 'en'),
         |nr AS (SELECT count(*) AS n FROM fb WHERE train AND lang <> 'en'),
         |lam AS (
         |  SELECT r.range AS b,
         |    CAST(round((ln(coalesce(ct.c, 0) + 1)
         |              - ln(CAST((SELECT n FROM nt) + 1024 AS DOUBLE))
         |              - ln(coalesce(cr.c, 0) + 1)
         |              + ln(CAST((SELECT n FROM nr) + 1024 AS DOUBLE))) * 1e6)
         |      AS BIGINT) AS lam
         |  FROM range(1024) r
         |  LEFT JOIN ct ON ct.b = r.range LEFT JOIN cr ON cr.b = r.range
         |), prior AS (
         |  SELECT CAST(round((ln((SELECT count(*) FROM documents
         |                          WHERE doc_id % 2 = 0 AND lang = 'en') + 1)
         |                   - ln((SELECT count(*) FROM documents
         |                          WHERE doc_id % 2 = 0 AND lang <> 'en') + 1))
         |                  * 1e6) AS BIGINT) AS p
         |), w AS (
         |  SELECT doc_id, CAST(sum(lam) AS BIGINT) AS s
         |  FROM fb JOIN lam USING (b) GROUP BY 1
         |)
         |SELECT d.doc_id, d.lang, d.doc_id % 2 = 0 AS train,
         |       CAST(w.s + (SELECT p FROM prior) AS BIGINT) AS score_micros,
         |       (w.s + (SELECT p FROM prior)) > 0 AS pred_en
         |FROM documents d JOIN w USING (doc_id)""".stripMargin,

    // CMS replay: 4x1024 grid as per-(row, bucket) sums over the bigram
    // counts, estimate = min over the 4 rows, threshold = total // 800,
    // candidates (est >= threshold) recounted exactly
    "q_heavy_hitters" ->
      s"""WITH tk AS (
         |  SELECT regexp_split_to_array(trim(text), '\\s+') AS t FROM documents
         |), g AS (
         |  SELECT t[i] || ' ' || t[i+1] AS g
         |  FROM (SELECT t, unnest(range(1, len(t))) AS i FROM tk)
         |), tc AS (SELECT g, count(*) AS c FROM g GROUP BY 1),
         |grid AS (
         |  SELECT j.range AS j,
         |    ('0x' || substr(md5('cms' || j.range || ':' || g), 1, 15))::UBIGINT
         |      % 1024 AS pos,
         |    sum(c) AS s
         |  FROM tc CROSS JOIN range(4) j GROUP BY 1, 2
         |), est AS (
         |  SELECT tc.g, tc.c, min(grid.s) AS est
         |  FROM tc CROSS JOIN range(4) j
         |  JOIN grid ON grid.j = j.range
         |    AND grid.pos =
         |      ('0x' || substr(md5('cms' || j.range || ':' || tc.g), 1, 15))::UBIGINT
         |        % 1024
         |  GROUP BY 1, 2
         |), th AS (SELECT greatest(1, (SELECT sum(c) FROM tc) // 800) AS t)
         |SELECT g AS token, CAST(est AS BIGINT) AS est, CAST(c AS BIGINT) AS cnt,
         |       (c >= (SELECT t FROM th)) AS is_heavy
         |FROM est WHERE est >= (SELECT t FROM th)""".stripMargin,

    "q_curation_pipeline" -> curationPipelineSql,

    "q_shuffle_shards" ->
      s"""SELECT
         |  CAST(${hash60("shard", "doc_id")} % 8 AS BIGINT) AS shard,
         |  CAST(row_number() OVER (
         |    PARTITION BY ${hash60("shard", "doc_id")} % 8
         |    ORDER BY ${hash60("pos", "doc_id")}, doc_id) AS BIGINT) AS pos,
         |  doc_id
         |FROM documents""".stripMargin,

    "q_length_quantiles" ->
      """WITH c AS (
        |  SELECT lang, count(*) AS n FROM documents GROUP BY 1
        |), r AS (
        |  SELECT lang, n_chars,
        |         row_number() OVER (PARTITION BY lang
        |           ORDER BY n_chars, doc_id) AS rn
        |  FROM documents
        |)
        |SELECT r.lang,
        |  max(CASE WHEN rn = (n * 50 + 99) // 100 THEN n_chars END) AS p50,
        |  max(CASE WHEN rn = (n * 90 + 99) // 100 THEN n_chars END) AS p90,
        |  max(CASE WHEN rn = (n * 99 + 99) // 100 THEN n_chars END) AS p99
        |FROM r JOIN c USING (lang)
        |GROUP BY 1""".stripMargin,

    // cumulative token weight per (lang, n_chars) histogram bucket; the
    // quantile is the smallest n_chars whose cumulative weight reaches
    // ceil(p*W/100) — mirror of Curation.exactQuantilesWeighted
    "q_weighted_quantiles" ->
      """WITH h AS (
        |  SELECT lang, n_chars,
        |         sum(len(regexp_split_to_array(trim(text), '\s+'))) AS c
        |  FROM documents GROUP BY 1, 2
        |), r AS (
        |  SELECT lang, n_chars, c,
        |         sum(c) OVER (PARTITION BY lang ORDER BY n_chars) AS cum,
        |         sum(c) OVER (PARTITION BY lang) AS n
        |  FROM h
        |)
        |SELECT lang,
        |  min(CASE WHEN cum >= (n * 50 + 99) // 100 THEN n_chars END) AS p50,
        |  min(CASE WHEN cum >= (n * 90 + 99) // 100 THEN n_chars END) AS p90,
        |  min(CASE WHEN cum >= (n * 99 + 99) // 100 THEN n_chars END) AS p99
        |FROM r GROUP BY 1""".stripMargin,

    "q_pii_redact" -> {
      // RE2 'g' flag == Java replace-all; patterns stay in the
      // Java/RE2-common subset (see Curation.EmailRe etc.)
      val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
      val ip = "\\b([0-9]{1,3}\\.){3}[0-9]{1,3}\\b"
      val phone = "\\+[0-9]{7,15}"
      s"""WITH aug AS (
         |  SELECT doc_id,
         |         text || ' contact u' || doc_id || '@mail.example.com from 10.'
         |              || (doc_id % 256) || '.' || ((doc_id * 7) % 256)
         |              || '.4 or +420601' || (doc_id % 1000) AS text
         |  FROM documents)
         |SELECT doc_id,
         |  regexp_replace(regexp_replace(regexp_replace(text,
         |      '$email', '<EMAIL>', 'g'),
         |      '$ip', '<IP>', 'g'),
         |      '$phone', '<PHONE>', 'g') AS red_text,
         |  CAST(len(regexp_extract_all(text, '$email')) AS BIGINT) AS n_emails,
         |  CAST(len(regexp_extract_all(text, '$ip')) AS BIGINT) AS n_ips,
         |  CAST(len(regexp_extract_all(text, '$phone')) AS BIGINT) AS n_phones
         |FROM aug""".stripMargin
    },

    "q_pack_sequences" ->
      s"""WITH t AS (
         |  SELECT doc_id,
         |    ${hash60("shard", "doc_id")} % 8 AS shard,
         |    ${hash60("pos", "doc_id")} AS posh,
         |    len(regexp_split_to_array(trim(text), '\\s+')) AS n_tokens
         |  FROM documents
         |), r AS (
         |  SELECT shard, doc_id, n_tokens,
         |    sum(n_tokens) OVER (PARTITION BY shard ORDER BY posh, doc_id
         |      ROWS UNBOUNDED PRECEDING) AS end_off
         |  FROM t)
         |SELECT CAST(shard AS BIGINT) AS shard, doc_id,
         |  CAST(n_tokens AS BIGINT) AS n_tokens,
         |  CAST((end_off - n_tokens) // 2048 AS BIGINT) AS seq_id,
         |  CAST((end_off - n_tokens) % 2048 AS BIGINT) AS seq_off
         |FROM r""".stripMargin,

    "q_domain_mix" ->
      s"""WITH per AS (
         |  SELECT source, sum(n_chars) AS domain_w FROM documents GROUP BY 1
         |), tot AS (
         |  SELECT sum(domain_w) AS total_w, count(*) AS n_domains FROM per
         |), rates AS (
         |  SELECT source,
         |         least(10000, ((total_w // n_domains) * 10000) // domain_w)
         |           AS rate_bp
         |  FROM per, tot
         |)
         |SELECT d.doc_id, d.source, CAST(r.rate_bp AS BIGINT) AS rate_bp
         |FROM documents d JOIN rates r USING (source)
         |WHERE ${bucket("mix", "d.doc_id")} < r.rate_bp""".stripMargin,

    // same micro-nat quantization as the engine: lnq per (domain, token)
    // rounds ln((c_dw·N)/(n_d·c_w))·1e6 to BIGINT, the domain sum is
    // integer, only the final ratio rounds (4dp)
    "q_domain_kl" ->
      """WITH tok AS (
        |  SELECT source AS domain,
        |         unnest(regexp_split_to_array(trim(text), '\s+')) AS w
        |  FROM documents
        |), cdw AS (
        |  SELECT domain, w, count(*) AS c_dw FROM tok GROUP BY 1, 2
        |), cw AS (SELECT w, CAST(sum(c_dw) AS BIGINT) AS c_w FROM cdw GROUP BY 1),
        |nd AS (SELECT domain, CAST(sum(c_dw) AS BIGINT) AS n_d FROM cdw GROUP BY 1),
        |tot AS (SELECT CAST(sum(n_d) AS BIGINT) AS n_total FROM nd)
        |SELECT c.domain, nd.n_d AS n_tokens,
        |       round(CAST(sum(c.c_dw *
        |         CAST(round(ln((CAST(c.c_dw AS DOUBLE) * CAST(t.n_total AS DOUBLE))
        |           / (CAST(nd.n_d AS DOUBLE) * CAST(cw.c_w AS DOUBLE))) * 1000000.0)
        |           AS BIGINT)) AS BIGINT) / 1000000.0 / CAST(nd.n_d AS DOUBLE), 4)
        |         AS kl
        |FROM cdw c
        |JOIN cw USING (w)
        |JOIN nd ON nd.domain = c.domain
        |CROSS JOIN tot t
        |GROUP BY c.domain, nd.n_d""".stripMargin,

    // same 60-bit gram hash (md5 of space-joined tokens), same
    // doc_id*2^20+pos occurrence packing, same keep-first + span-union
    // removal; only the retained text's md5 crosses the compare
    "q_exact_substring_dedup" ->
      s"""WITH tok AS (
         |  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS toks
         |  FROM documents
         |), g AS (
         |  SELECT doc_id, CAST(u.i AS BIGINT) AS i,
         |         CAST(('0x' || substr(md5(array_to_string(
         |           toks[CAST(u.i AS INT):CAST(u.i AS INT) + $SubstrK - 1],
         |           ' ')), 1, 15))::UBIGINT AS BIGINT) AS h,
         |         doc_id * 1048576 + CAST(u.i AS BIGINT) AS pk
         |  FROM tok, unnest(generate_series(1, len(toks) - $SubstrK + 1)) u(i)
         |), fst AS (SELECT h, min(pk) AS min_pk FROM g GROUP BY h),
         |dup AS (
         |  SELECT g.doc_id, g.i FROM g JOIN fst USING (h)
         |  WHERE g.pk <> fst.min_pk
         |), pos AS (
         |  SELECT t.doc_id, CAST(u.p AS BIGINT) AS p, toks[CAST(u.p AS INT)] AS w
         |  FROM tok t, unnest(generate_series(1, len(toks))) u(p)
         |), kept AS (
         |  SELECT pos.doc_id, p, w FROM pos
         |  WHERE NOT EXISTS (SELECT 1 FROM dup d
         |                    WHERE d.doc_id = pos.doc_id
         |                      AND pos.p >= d.i AND pos.p < d.i + $SubstrK)
         |)
         |SELECT t.doc_id, CAST(len(t.toks) AS BIGINT) AS n_tokens,
         |       CAST(len(t.toks) - count(k.p) AS BIGINT) AS n_removed,
         |       md5(coalesce(string_agg(k.w, ' ' ORDER BY k.p), ''))
         |         AS retained_fp
         |FROM tok t LEFT JOIN kept k USING (doc_id)
         |GROUP BY t.doc_id, len(t.toks)""".stripMargin
  )
}
