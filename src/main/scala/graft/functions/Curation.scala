package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-curation operators for a training-data pipeline (LLM-pipeline
  * extension beyond the reference's operator set): benchmark
  * decontamination, Gopher-style repetition statistics, and deterministic
  * hash sampling (stratified rates / domain-mix rebalancing).
  *
  * Scale shapes:
  *  - decontamination joins the corpus against the DISTINCT n-gram set of
  *    the eval benchmark — the benchmark side is tiny (thousands of docs),
  *    so it broadcasts and the corpus side stays a single scan + map-side
  *    join + partial-aggregable count;
  *  - repetition stats are two explode→groupBy passes (token and bigram),
  *    both partial-aggregable, joined per-doc at the end;
  *  - hash sampling is a pure map: keep iff a 60-bit md5 of the doc id
  *    lands under the stratum's rate in basis points. Deterministic across
  *    engines, retries and re-runs (no RNG state), and rebalancing rates
  *    derive from one tiny per-domain aggregate broadcast back.
  */
object Curation {

  /** Deterministic per-row sampling hash in [0, 10000) basis points.
    * Namespaced by `salt` so independent sampling decisions (stratified
    * sample vs domain mix) are uncorrelated.
    */
  def sampleBucket(id: Column, salt: String): Column =
    MinHashLsh.hash60(concat(lit(salt + ":"), id.cast("string"))) % 10000

  /** Docs from `train` sharing at least one n-token shingle with `eval`
    * (the benchmark set): (doc_id, n_hits) where n_hits counts the
    * DISTINCT contaminated shingles of the doc. Non-overlapping docs are
    * absent — the common downstream move is an anti-join to drop the hits.
    *
    * Both sides shingle independently (the eval set is a separate, small
    * table in a real pipeline); shingles are compared via their 60-bit
    * hash (native [[Shingle60Expr]]) so the shuffle/broadcast carries
    * 8-byte keys, not strings.
    */
  /** (doc_id, g) hashed n-gram projection every decontamination/novelty
    * path shares — ONE definition: four local copies risked a salt or
    * rename landing in three of them.
    */
  private def grams(df: DataFrame, textCol: String, n: Int): DataFrame =
    MinHashLsh.hashedShingles(df, textCol, n)
      .select(col("doc_id"), col("h").as("g"))

  def decontaminate(train: DataFrame, eval: DataFrame, textCol: String,
      n: Int): DataFrame = {
    def grams(df: DataFrame) = Curation.grams(df, textCol, n)
    val evalGrams = grams(eval).select(col("g")).distinct()
    grams(train)
      .join(broadcast(evalGrams), "g")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_hits"))
  }

  /** [[decontaminate]] with a Bloom prefilter — the 100 TB shape. The
    * exact path joins EVERY corpus gram against the eval set; here a
    * Bloom filter of the eval grams (a few bits per gram — holds millions
    * of grams in tens of MB) drops ~(1-fpp) of clean grams map-side,
    * before any join machinery sees them. The surviving grams still go
    * through the exact join, so Bloom false positives are eliminated and
    * the result is IDENTICAL to [[decontaminate]] — spec-enforced. The
    * probe is Spark's own `BloomFilterMightContain` Catalyst expression
    * (exposed as `graft_might_contain` by [[GraftExtensions]]), so the
    * prefilter scan stays inside whole-stage codegen; the serialized
    * sketch rides the plan as a literal, broadcast with the task binary.
    */
  def decontaminateBloom(train: DataFrame, eval: DataFrame, textCol: String,
      n: Int, fpp: Double = 0.01): DataFrame = {
    def grams(df: DataFrame) = Curation.grams(df, textCol, n)
    // swap-pinned, NOT unpersisted here: the pin serves the eager
    // count()/bloomFilter() below AND the lazy join in the returned
    // frame — a finally-unpersist would drop the cache before the
    // caller's first action and re-run the eval shingle pipeline (a
    // full explode + shuffle over a set explicitly too big to
    // broadcast) on EVERY downstream action. CachePins bounds the
    // residue to one live eval-gram set per session.
    val evalGrams = graft.core.CachePins.swap("curation.decontaminateBloom",
      grams(eval).select(col("g")).distinct())
    val nEval = math.max(evalGrams.count(), 1L)
    val bf = evalGrams.stat.bloomFilter("g", nEval, fpp)
    val bos = new java.io.ByteArrayOutputStream()
    bf.writeTo(bos)
    // no broadcast hint here (unlike the exact path): the variant
    // exists for eval sets too big to broadcast — AQE picks the join
    grams(train)
      .filter(MightContain.column(bos.toByteArray, col("g")))
      .join(evalGrams, "g")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_hits"))
  }

  /** Per-document n-gram NOVELTY against a reference corpus: for each
    * eval doc with at least one n-token shingle, the fraction of its
    * DISTINCT shingles absent from the reference — the continuous
    * counterpart of [[decontaminate]]'s binary hit list, used to score
    * how much genuinely new text a crawl increment adds (or, inverted,
    * as a soft contamination signal). Output: (doc_id, n_grams, n_novel,
    * novelty) with novelty = round(n_novel / n_grams, 6); the counts are
    * exact integers, the ratio the established cross-engine-safe rounded
    * form. Docs shorter than n tokens have no shingles and no row.
    *
    * Scale shape — the Bloom two-phase of [[decontaminateBloom]], with
    * the asymmetry inverted to the novelty direction: a Bloom filter of
    * the reference grams classifies every eval gram map-side.
    * Bloom-NEGATIVE grams are PROVABLY novel (Bloom has no false
    * negatives) and are counted without ever reaching a join;
    * only the bloom-positive minority crosses the exchange into the
    * exact semi-join that cancels false positives. The result is exactly
    * the all-exact-join answer — spec-enforced — while the shuffle
    * carries ~(seen + fpp·novel) grams instead of every gram.
    */
  def noveltyRate(evalDocs: DataFrame, refDocs: DataFrame, textCol: String,
      n: Int, fpp: Double = 0.01): DataFrame = {
    def grams(df: DataFrame) = Curation.grams(df, textCol, n)
    val refGrams = graft.core.CachePins.swap("curation.noveltyRate",
      grams(refDocs).select(col("g")).distinct())
    val nRef = math.max(refGrams.count(), 1L)
    val bf = refGrams.stat.bloomFilter("g", nRef, fpp)
    val bos = new java.io.ByteArrayOutputStream()
    bf.writeTo(bos)
    // per-doc totals are computable IN-ROW (distinct shingle-hash array
    // size): no eval gram shuffles for the denominator, and the eval
    // corpus is not re-derived through a second explode+distinct
    // exchange (review finding: the two eval subplans differ once the
    // bloom filter pushes to the scan, so ReuseExchange cannot dedup
    // them)
    val totals = evalDocs.select(col("doc_id"),
        size(array_distinct(ShingleHash60.column(col(textCol), n)))
          .cast("long").as("n_grams"))
      .filter(col("n_grams") > 0)
    // only maybe-seen grams shuffle; the semi-join kills Bloom FPs
    val seen = grams(evalDocs)
      .filter(MightContain.column(bos.toByteArray, col("g")))
      .join(refGrams, Seq("g"), "left_semi")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("__seen"))
    totals.join(seen, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_grams"),
        (col("n_grams") - coalesce(col("__seen"), lit(0L))).as("n_novel"))
      .withColumn("novelty",
        round(col("n_novel").cast("double") / col("n_grams").cast("double"), 6))
  }

  /** All-exact-join reference implementation of [[noveltyRate]] — the
    * spec's equivalence anchor (and the shape the DuckDB oracle mirrors).
    */
  def noveltyRateExact(evalDocs: DataFrame, refDocs: DataFrame,
      textCol: String, n: Int): DataFrame = {
    def grams(df: DataFrame) = Curation.grams(df, textCol, n)
    val refGrams = grams(refDocs).select(col("g")).distinct()
    val evalGrams = grams(evalDocs)
    val totals = evalGrams.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_grams"))
    val seen = evalGrams.join(refGrams, Seq("g"), "left_semi")
      .groupBy(col("doc_id")).agg(count(lit(1)).as("__seen"))
    totals.join(seen, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_grams"),
        (col("n_grams") - coalesce(col("__seen"), lit(0L))).as("n_novel"))
      .withColumn("novelty",
        round(col("n_novel").cast("double") / col("n_grams").cast("double"), 6))
  }

  /** Gopher-style repetition statistics per document: token totals,
    * distinct counts, the hottest token/bigram, and the derived fractions
    * used as filter thresholds (duplicate-token fraction, top-bigram
    * fraction). Fractions are rounded to 4 decimals — the established
    * cross-engine-safe ratio form.
    */
  def repetitionStats(docs: DataFrame, textCol: String): DataFrame = {
    val tokCounts = docs
      .select(col("doc_id"), explode(split(trim(col(textCol)), "\\s+")).as("t"))
      .groupBy(col("doc_id"), col("t")).agg(count(lit(1)).as("c"))
    val perTok = tokCounts.groupBy(col("doc_id")).agg(
      sum(col("c")).as("n_tokens"),
      count(lit(1)).as("n_distinct"),
      max(col("c")).as("top_token"))
    val biCounts = MinHashLsh.shingles(docs, textCol, n = 2, dedupe = false)
      .groupBy(col("doc_id"), col("shingle")).agg(count(lit(1)).as("c"))
    val perBi = biCounts.groupBy(col("doc_id")).agg(
      sum(col("c")).as("n_bigrams"),
      max(col("c")).as("top_bigram"))
    perTok.join(perBi, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"), col("n_distinct"),
        col("top_token"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("top_bigram"), lit(0L)).as("top_bigram"),
        round(lit(1.0) - col("n_distinct") / col("n_tokens").cast("double"), 4)
          .as("dup_token_frac"),
        when(col("n_bigrams").isNull, lit(0.0))
          .otherwise(round(col("top_bigram") / col("n_bigrams").cast("double"), 4))
          .as("top_bigram_frac"))
  }

  /** Keep rows whose sampling bucket lands under `rateBp` (basis points,
    * 10000 = keep all). `rateBp` may be any Column — a literal, a
    * per-stratum CASE, or a joined-in rebalancing rate.
    */
  def hashSample(docs: DataFrame, id: Column, salt: String,
      rateBp: Column): DataFrame =
    docs.filter(sampleBucket(id, salt) < rateBp)

  /** Deterministic weighted sampling WITHOUT replacement, probability
    * proportional to `weight` (Efraimidis–Spirakis, via the Gumbel-key
    * identity [[Dsir.gumbelMicros]] already carries): per-row key =
    * `round(ln(weight)·1e6) + gumbel_micros(id)`, take the top k.
    * The hash-derived Gumbel makes the "random" sample a pure function
    * of (id, salt) — re-runs, retries, and the DuckDB oracle draw the
    * SAME k rows. Zero-or-negative weights are excluded (ln undefined —
    * and a zero-weight row must never be drawn).
    *
    * Scale shape: map-only scoring; selection lowers to TakeOrdered
    * (per-partition top-k + a k-row driver merge, no global sort —
    * the DSIR plan gate covers the identical lowering).
    */
  def weightedSample(docs: DataFrame, id: Column, weight: Column, k: Int,
      salt: String): DataFrame =
    docs.filter(weight > 0)
      .withColumn("sample_key_micros",
        round(log(weight.cast("double")) * 1e6).cast("long") +
          Dsir.gumbelMicros(id, salt))
      .orderBy(col("sample_key_micros").desc, id.asc)
      .limit(k)

  /** Temperature-balanced domain resampling (the multilingual-pretraining
    * alpha-smoothing move, fixed at alpha = 0.5): per-domain keep rate
    * `keep_bp = floor(10000 · sqrt(n_min / n_d))` basis points — the
    * smallest domain keeps everything, a 100× bigger one keeps 10%, so
    * head domains flatten toward the tail without any domain exploding.
    *
    * alpha is FIXED at 0.5 on purpose: the rate is then one IEEE divide,
    * one sqrt and one multiply — each correctly rounded, so the floor'd
    * basis points are bit-identical in any engine (a general `pow` is
    * not correctly rounded and could flip a boundary doc between
    * engines). Shape: one partial-aggregable domain count, a 1-row
    * driver anchor (min count), the tiny rate table broadcast back, and
    * the usual integer hash-bucket decision per row.
    */
  def temperatureSample(docs: DataFrame, domain: String, id: Column,
      salt: String): DataFrame = {
    val rates = docs.groupBy(col(domain)).agg(count(lit(1)).as("n_d"))
    // anchor joined lazily (domainMixRates pattern): no eager driver job
    // at composition time, and an EMPTY corpus yields an empty result
    // instead of an NPE from head().getLong on a null min
    val anchor = rates.agg(min(col("n_d")).as("n_min"))
    val withBp = rates.crossJoin(broadcast(anchor)).withColumn("keep_bp",
      floor(lit(10000.0) *
        sqrt(col("n_min").cast("double") / col("n_d").cast("double"))).cast("long"))
    // NULL-SAFE join: the NULL-domain group counts in the rates (it can
    // even anchor n_min), so a plain equi-join — which never matches
    // NULL — would both drop those docs entirely AND leave every other
    // domain's rate anchored to a phantom smallest domain
    docs.join(broadcast(withBp.drop("n_min", "n_d")
        .withColumnRenamed(domain, "__graft_dom")),
      col(domain) <=> col("__graft_dom"))
      .drop("__graft_dom")
      .filter(sampleBucket(id, salt) < col("keep_bp"))
  }

  /** Redaction patterns: kept to syntax that Java regex (Spark) and RE2
    * (DuckDB, the oracle) interpret identically — character classes,
    * bounded repetition, word boundaries; no lookaround, no backrefs.
    */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Re = "\\b([0-9]{1,3}\\.){3}[0-9]{1,3}\\b"
  val PhoneRe = "\\+[0-9]{7,15}"

  /** PII scrubbing: replace emails, IPv4 addresses and international
    * phone numbers with typed placeholder tokens, and count each kind
    * (counts run on the ORIGINAL text so they are independent of
    * replacement order). Documented consequence: a match NESTED inside
    * an earlier pattern's span (e.g. the "+12345678" inside
    * "a+12345678@b.com") still counts for its own kind even though the
    * outer replacement consumed it — the counts measure occurrences in
    * the SOURCE, not placeholders emitted; reconcile audits against the
    * source, not `red_text`. Pure per-row column expressions —
    * codegen'd, no shuffle, linear scan at any scale. Order of
    * replacement is email → ip → phone; the patterns cannot create each
    * other's matches from the placeholder tokens.
    */
  def redactPii(docs: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    val redacted = regexp_replace(
      regexp_replace(
        regexp_replace(t, EmailRe, "<EMAIL>"),
        Ipv4Re, "<IP>"),
      PhoneRe, "<PHONE>")
    docs.select(col("doc_id"), redacted.as("red_text"),
      size(regexp_extract_all(t, lit(EmailRe), lit(0))).cast("long").as("n_emails"),
      size(regexp_extract_all(t, lit(Ipv4Re), lit(0))).cast("long").as("n_ips"),
      size(regexp_extract_all(t, lit(PhoneRe), lit(0))).cast("long").as("n_phones"))
  }

  /** Deterministic sequence packing for training: shuffle docs into
    * `nShards` shards (same hash-derived shard/position keys as the
    * reproducible shard shuffle), then concatenate each shard's token
    * stream and chunk it into `ctx`-token sequences. A doc's sequence id
    * and offset derive from the running token total BEFORE it — the
    * standard pack-then-chunk layout (documents may straddle sequence
    * boundaries). All integers, so a re-run or engine replay is
    * bit-identical.
    *
    * Scale shape: one hash-partitioned window (= repartition(shard) +
    * sortWithinPartitions) — no global sort, no driver state; shard
    * count spreads the running-sum chains across executors.
    */
  def packSequences(docs: DataFrame, textCol: String, ctx: Int,
      nShards: Int): DataFrame = {
    require(ctx >= 1, s"ctx must be >= 1, got $ctx")
    require(nShards >= 1, s"nShards must be >= 1, got $nShards")
    import org.apache.spark.sql.expressions.Window
    val nTok = TokenCount.column(col(textCol)).cast("long")
    val shard = MinHashLsh.hash60(
      concat(lit("shard:"), col("doc_id").cast("string"))) % nShards
    val posh = MinHashLsh.hash60(
      concat(lit("pos:"), col("doc_id").cast("string")))
    val w = Window.partitionBy(col("shard")).orderBy(col("posh"), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs
      .select(col("doc_id"), shard.as("shard"), posh.as("posh"),
        nTok.as("n_tokens"))
      .withColumn("end_off", sum(col("n_tokens")).over(w))
      .select(col("shard"), col("doc_id"), col("n_tokens"),
        expr(s"(end_off - n_tokens) div $ctx").as("seq_id"),
        expr(s"(end_off - n_tokens) % $ctx").as("seq_off"))
  }

  /** Exact per-group nearest-rank quantiles (rank = ceil(p·n/100),
    * all-integer) WITHOUT a per-group row sort: a `row_number` window
    * partitioned by group sends every group's rows to one task — at
    * 100 TB the `en` partition is half the corpus sorted on a single
    * executor. Instead: one partial-aggregable histogram per
    * (group, value), a cumulative sum over that tiny distinct-value
    * table, and the quantile is the smallest value whose cumulative
    * count reaches the rank. The only window runs over the histogram —
    * rows per group = distinct VALUES, bounded by the value domain, not
    * the corpus.
    *
    * Output: (groupCol, p&lt;pct&gt;...) with the value column's type.
    */
  def exactQuantiles(df: DataFrame, groupCol: String, valueCol: String,
      pcts: Seq[Int]): DataFrame =
    exactQuantilesWeighted(df, groupCol, valueCol, lit(1L), pcts)

  /** Weighted variant: the p-quantile is the smallest value whose
    * cumulative WEIGHT reaches ceil(p·W/100) — e.g. weight = token count
    * answers "which length cutoff keeps p% of the tokens", the form a
    * token-budgeted curation run actually uses. Integer weights keep the
    * selection engine-replayable; same single-scan histogram plan as the
    * unweighted form (which is this with weight 1).
    */
  def exactQuantilesWeighted(df: DataFrame, groupCol: String,
      valueCol: String, weight: Column, pcts: Seq[Int]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // collision-proof internal names: a user column named c/cum/n must not
    // be silently overwritten by the histogram plumbing
    val cC = "__graft_c"; val cCum = "__graft_cum"; val cN = "__graft_n"
    val hist = df.groupBy(col(groupCol), col(valueCol))
      .agg(sum(weight).as(cC))
    // group total as a second window over the SAME partitioning (not a
    // re-aggregated join branch): one corpus scan, one exchange — the
    // group-total branch would otherwise scan the corpus a second time
    val cum = hist
      .withColumn(cCum,
        sum(col(cC)).over(Window.partitionBy(col(groupCol)).orderBy(col(valueCol))))
      .withColumn(cN, sum(col(cC)).over(Window.partitionBy(col(groupCol))))
    val aggs = pcts.map(p =>
      min(when(col(cCum) >= expr(s"(`$cN` * $p + 99) div 100"), col(valueCol)))
        .as(s"p$p"))
    cum.groupBy(col(groupCol)).agg(aggs.head, aggs.tail: _*)
  }

  /** Per-domain rates (basis points) that rebalance the corpus toward a
    * UNIFORM share of `weightCol` (chars/tokens) per domain: domains over
    * the uniform target are downsampled to it, domains under keep
    * everything. All-integer arithmetic (floor division) so the rates are
    * bit-identical across engines.
    *
    * One tiny aggregate (ndomains rows) — broadcast it back onto the
    * corpus and pass the joined column to [[hashSample]].
    */
  /** Per-domain unigram KL divergence from the corpus distribution —
    * KL(P_domain || P_corpus) in nats, the standard mix diagnostic for
    * "how far does this source's token distribution sit from the blend"
    * (feeds reweighting decisions the way [[domainMixRates]] feeds
    * uniform rebalancing). Output: (domain, n_tokens, kl[4dp]).
    *
    * Cross-engine determinism: the per-token log ratio
    * ln((c_dw·N)/(n_d·c_w)) quantizes to micro-nats (the [[NGramLm]]
    * pattern), the per-domain accumulation is then pure int64
    * (c_dw·lnq_w), and only the final ratio rounds to 4 decimals. The
    * ratio's products are computed in DOUBLE — exact while c_dw·N stays
    * under 2^53 (~9e15; a corpus-scale run past that should shift the
    * products to ln subtraction form on BOTH sides).
    *
    * Scale shape: the only corpus-sized pass is the token explode into
    * the (domain, token) partial-aggregable count; c_w / n_d / N derive
    * from that vocab×domains-bounded table (no second corpus scan), and
    * the per-domain totals broadcast back onto it.
    */
  def domainKlDivergence(docs: DataFrame, domainCol: String,
      textCol: String): DataFrame = {
    val cdw = docs
      .select(col(domainCol).as("domain"),
        explode(split(trim(col(textCol)), "\\s+")).as("w"))
      .groupBy(col("domain"), col("w")).agg(count(lit(1)).as("c_dw"))
    val cw = cdw.groupBy(col("w")).agg(sum(col("c_dw")).as("c_w"))
    val nd = cdw.groupBy(col("domain")).agg(sum(col("c_dw")).as("n_d"))
    val tot = nd.agg(sum(col("n_d")).as("n_total"))
    cdw.join(cw, "w").join(broadcast(nd), "domain").crossJoin(broadcast(tot))
      .withColumn("lnq",
        round(log((col("c_dw").cast("double") * col("n_total").cast("double")) /
          (col("n_d").cast("double") * col("c_w").cast("double"))) *
          lit(1000000.0)).cast("long"))
      .groupBy(col("domain"))
      .agg(max(col("n_d")).as("n_tokens"),
        sum(col("c_dw") * col("lnq")).as("__s"))
      .select(col("domain"), col("n_tokens"),
        round(col("__s").cast("double") / lit(1000000.0) /
          col("n_tokens").cast("double"), 4).as("kl"))
  }

  def domainMixRates(docs: DataFrame, domainCol: String,
      weightCol: String): DataFrame = {
    val per = docs.groupBy(col(domainCol))
      .agg(sum(col(weightCol)).as("domain_w"))
    val tot = per.agg(sum(col("domain_w")).as("total_w"),
      count(lit(1)).as("n_domains"))
    per.crossJoin(broadcast(tot))
      .select(col(domainCol),
        // a zero-weight domain (every row weightCol = 0) cannot be over
        // the uniform target — keep it all rather than tripping ANSI
        // DIVIDE_BY_ZERO (or silently dropping it via a NULL rate)
        when(col("domain_w") === 0, lit(10000L))
          .otherwise(least(lit(10000L),
            expr("((total_w div n_domains) * 10000) div domain_w")))
          .as("rate_bp"))
  }

  /** Segment-level exact dedup (the CCNet/RefinedWeb paragraph-dedup
    * move, with fixed `segTokens`-token segments standing in for
    * paragraphs — this corpus has no line structure): every repeated
    * segment keeps only its FIRST occurrence in (doc_id, seg_idx) order,
    * and each document reports how much of it survived. Downstream
    * reconstruction = concatenate the kept segments.
    *
    * Output: (doc_id, n_segs, n_kept, kept_ratio[4dp]).
    *
    * Scale shape: segments are built IN-ROW (`transform` over the token
    * array — no corpus-sized explode before the hash), each segment
    * travels as its 60-bit hash + a packed (doc_id, seg_idx) key; the
    * canonical occurrence is one partial-aggregable `min` per hash and
    * the keep decision is a join on the hash — two co-partitioned
    * exchanges total, independent of document size. Packing the
    * occurrence key into one long (`doc_id · 2^20 + seg_idx`) keeps the
    * min engine-replayable (struct mins order-compare engine-privately).
    */
  /** Packing capacity of the (doc_id, seg_idx) occurrence key: seg_idx
    * gets the low 20 bits, so documents are bounded at 2^20 segments
    * (~10.5M tokens at the default segTokens = 10) and doc_id at
    * 2^43 — enforced, not assumed: an out-of-range row would silently
    * bleed into a NEIGHBORING doc's key space and corrupt which
    * occurrence `min(pk)` picks, so the packing raises instead.
    */
  private val SegCap = 1048576L // 2^20
  private val DocCap = Long.MaxValue / SegCap // 2^43

  /** The guarded packed key; codegen'd branch, no extra pass. */
  private def segmentPk: Column =
    when(col("seg_idx") < lit(SegCap) &&
        col("doc_id").between(lit(0L), lit(DocCap - 1)),
      col("doc_id") * lit(SegCap) + col("seg_idx"))
    .otherwise(raise_error(concat(
      lit(s"occurrence packing: (doc_id, seg_idx) outside packing range " +
        s"[0, $DocCap) x [0, $SegCap): ("),
      col("doc_id").cast("string"), lit(", "),
      col("seg_idx").cast("string"), lit(")"))))

  /** Exact substring deduplication with SPAN REMOVAL — the Lee et al.
    * 2022 ("Deduplicating Training Data Makes Language Models Better")
    * move: every duplicated span of at least `k` tokens keeps its FIRST
    * corpus occurrence (by (doc_id, position) order) and is cut from
    * every later one. Complements [[segmentDedup]] (which only scores
    * fixed segments) and [[Winnow]] (which only detects overlap pairs):
    * this produces the deduplicated corpus itself.
    *
    * Semantics: a token position is removed iff it is covered by some
    * k-token window whose 60-bit gram hash first occurs at an EARLIER
    * packed (doc_id, position) — so within-doc repeats are cut too, and
    * a duplicated run of length L ≥ k is removed in full from the later
    * occurrence (all of its L − k + 1 windows are duplicates and their
    * union covers the run). Output per input doc: `n_tokens`,
    * `n_removed`, and `text_dedup` (retained tokens joined by a single
    * space — the tokenization is the engine-pinned `\s+` split, so
    * original whitespace is normalized, same as every token op here).
    *
    * Scale shape: the gram pass is the [[ShingleHash60]] in-row kernel
    * (one byte scan per doc, no token strings) exploded to corpus-sized
    * (hash, packed-position) rows — unavoidable for a GLOBAL
    * first-occurrence decision, but the `min(pk)` aggregate is
    * partial-aggregable (map-side combine) and the join back is
    * hash-co-partitioned, so the shuffle carries 16-byte rows. The
    * duplicated-start lists regroup per doc (sparse — only docs with
    * removals shuffle anything) and the span-union removal is pure
    * in-row array work. The in-row coverage test is O(tokens ×
    * dup-starts) per doc — bounded by document length squared in the
    * worst (fully-duplicated) case, never by corpus size.
    */
  def exactSubstringDedup(docs: DataFrame, idCol: String, textCol: String,
      k: Int = 8): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val grams = docs
      .select(col(idCol).as("doc_id"), posexplode(
        ShingleHash60.column(col(textCol), k)).as(Seq("i0", "h")))
      .select(col("doc_id"), (col("i0") + 1).cast("long").as("seg_idx"),
        col("h"))
      .select(col("doc_id"), col("seg_idx"), col("h"), segmentPk.as("pk"))
    val first = grams.groupBy(col("h")).agg(min(col("pk")).as("min_pk"))
    val dupStarts = grams.join(first, "h")
      .filter(col("pk") =!= col("min_pk"))
      .groupBy(col("doc_id"))
      .agg(sort_array(collect_list(col("seg_idx"))).as("__dups"))
    docs.select(col(idCol).as("doc_id"), col(textCol).as("__text"))
      .join(dupStarts, Seq("doc_id"), "left")
      .withColumn("__toks", split(trim(col("__text")), "\\s+"))
      .withColumn("__dupz",
        coalesce(col("__dups"), array().cast("array<long>")))
      .withColumn("__kept", expr(
        s"filter(sequence(1, size(__toks)), p -> NOT exists(__dupz, i -> p >= i AND p < i + $k))"))
      .select(col("doc_id"),
        size(col("__toks")).cast("long").as("n_tokens"),
        (size(col("__toks")) - size(col("__kept"))).cast("long")
          .as("n_removed"),
        array_join(expr("transform(__kept, p -> element_at(__toks, p))"),
          " ").as("text_dedup"))
  }

  def segmentDedup(docs: DataFrame, textCol: String,
      segTokens: Int = 10): DataFrame = {
    require(segTokens >= 1, s"segTokens must be >= 1, got $segTokens")
    // native Segment60Expr: the salted segment hashes come from one byte
    // scan per document — no token array, no segment strings (the
    // strings were only ever hashed); bit-equality with the slice/
    // concat_ws formula is spec-pinned (CurationSpec)
    val segs = docs
      .select(col("doc_id"), posexplode(
        ShingleHash60.segmentColumn(col(textCol), segTokens, "seg:"))
        .as(Seq("seg_idx", "h")))
      .select(col("doc_id"), col("seg_idx"), col("h"), segmentPk.as("pk"))
    val first = segs.groupBy(col("h")).agg(min(col("pk")).as("min_pk"))
    segs.join(first, "h")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_segs"),
        sum(when(col("pk") === col("min_pk"), 1L).otherwise(0L)).as("n_kept"))
      .select(col("doc_id"), col("n_segs"), col("n_kept"),
        round(col("n_kept") / col("n_segs").cast("double"), 4)
          .as("kept_ratio"))
  }

  /** Epoch-mix resampling toward explicit per-domain corpus shares — the
    * data-mixing move that UP-samples under-represented domains by
    * repeating documents (fractional epochs), complementing
    * [[temperatureSample]]'s down-only rates. For each domain with
    * target share `w_bp` basis points: desired count
    * `m_d = w_bp · N div 10000`, every doc repeats `m_d div n_d` times,
    * and `m_d mod n_d` docs (hash-chosen) get one extra copy — so the
    * emitted count tracks the target to ±hash noise, all in integer
    * arithmetic both engines replay exactly.
    *
    * Output: one row per emitted copy, (doc_id, <domain>, copy_idx).
    *
    * Scale shape: one partial-aggregable domain count + a lazily-joined
    * 1-row total (no eager driver job), the tiny rate table broadcast
    * back, and the copy expansion is an in-row `explode(sequence)` whose
    * width is the repeat factor — the output is exactly the training mix,
    * no shuffle beyond the count.
    */
  def epochMix(docs: DataFrame, domain: String, id: Column,
      targetBp: Column, salt: String): DataFrame = {
    val nd = docs.groupBy(col(domain)).agg(count(lit(1)).as("n_d"))
    val anchor = docs.agg(count(lit(1)).as("n_total"))
    // targetBp may reference the domain column — resolve it on nd's rows
    val withRates = nd
      .withColumn("__target_bp", targetBp)
      .crossJoin(broadcast(anchor))
      .withColumn("m_d", expr("(__target_bp * n_total) div 10000"))
      .select(col(domain), expr("m_d div n_d").as("r_base"),
        expr("((m_d % n_d) * 10000) div n_d").as("extra_bp"))
    // null-safe join (see temperatureSample) and the CALLER's id column
    // in the output — the id parameter was accepted but a hard-coded
    // doc_id select crashed any corpus whose id column is named otherwise
    docs.join(broadcast(withRates
        .withColumnRenamed(domain, "__graft_dom")),
      col(domain) <=> col("__graft_dom"))
      .drop("__graft_dom")
      .withColumn("n_copies",
        col("r_base") + when(sampleBucket(id, salt) < col("extra_bp"), 1L)
          .otherwise(0L))
      .filter(col("n_copies") > 0)
      .select(id.as("doc_id"), col(domain),
        explode(sequence(lit(0L), col("n_copies") - 1)).as("copy_idx"))
  }
}
