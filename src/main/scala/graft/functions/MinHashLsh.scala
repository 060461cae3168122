package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** MinHash + LSH and SimHash document sketches (LLM-pipeline dedup
  * extension; capability superset over the reference — BASELINE.json north
  * star).
  *
  * All sketches are pure `functions._` column expressions (md5/conv/shift
  * arithmetic) — whole-stage-codegen'd, cross-engine deterministic (the
  * DuckDB oracle recomputes the identical integers), and shuffle-free until
  * the final per-doc aggregate. At 100 TB: signature computation is a map
  * over the corpus; candidate generation is a band-bucket join (shuffle on
  * band value, skew-bounded because a band bucket holds near-identical docs
  * only).
  *
  * Base hash: first 15 hex chars of md5 → 60-bit integer. MinHash permutes
  * it with k affine maps mod p (p = 2^31-1 keeps a*h+b inside 63 bits).
  */
object MinHashLsh {

  val P: Long = 2147483647L // 2^31 - 1

  /** 60-bit base hash of a string column — the codegen'd [[Hash60Expr]]
    * (digest-byte arithmetic, no hex-string round trip). Bit-identical to
    * [[hash60Reference]]; `Hash60Spec` pins the equality.
    */
  def hash60(c: Column): Column = Hash60.column(c)

  /** The functions-only formula the DuckDB oracles replay; retained as the
    * cross-engine reference implementation for [[Hash60Expr]].
    */
  def hash60Reference(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  private def affine(h: Column, j: Int): Column =
    (lit(2L * j + 1) * (h % P) + lit(j * 7919L + 13L)) % P

  /** (doc_id, shingle) pairs: n-token shingles per document; `dedupe=false`
    * skips the distinct when the consumer dedupes later on a cheaper key.
    */
  def shingles(docs: DataFrame, textCol: String, n: Int,
      dedupe: Boolean = true): DataFrame = {
    val toks = split(trim(col(textCol)), "\\s+")
    val raw = docs
      .select(col("doc_id"), toks.as("toks"))
      .select(col("doc_id"), explode(
        when(size(col("toks")) >= n,
          transform(sequence(lit(0), size(col("toks")) - n),
            i => concat_ws(" ",
              (1 to n).map(o => element_at(col("toks"), i + o)): _*)))
          .otherwise(array().cast("array<string>"))).as("shingle"))
    if (dedupe) raw.distinct() else raw
  }

  /** Distinct hashed shingles per document: (doc_id, h) with h the 60-bit
    * md5 prefix of each n-token shingle — the input every dedup sketch
    * starts from, computed by the native [[Shingle60Expr]] (one byte scan
    * per document, no shingle strings or token arrays materialized).
    * Hashing BEFORE the distinct is semantics-preserving: `min`/set
    * operations over a multiset equal those over its set, and deduping on
    * the 8-byte hash instead of the shingle string shrinks the shuffle
    * ~10x (the only risk, a 60-bit collision, cannot change any min).
    */
  def hashedShingles(docs: DataFrame, textCol: String, n: Int): DataFrame =
    docs.select(col("doc_id"),
      explode(ShingleHash60.column(col(textCol), n)).as("h"))
      .distinct()

  /** k-minhash signature per document: doc_id, mh_0 .. mh_{k-1}. */
  def signature(docs: DataFrame, textCol: String, n: Int, k: Int): DataFrame =
    signatureFromHashed(hashedShingles(docs, textCol, n), k)

  /** Signature from a pre-hashed distinct (doc_id, h) shingle table —
    * callers that also need the shingle sets downstream (e.g. candidate
    * verification) compute and persist the hashed shingles ONCE and feed
    * both consumers.
    */
  def signatureFromHashed(hashedShingles: DataFrame, k: Int): DataFrame =
    hashedShingles.groupBy(col("doc_id"))
      .agg(min(affine(col("h"), 0)).as("mh_0"),
        (1 until k).map(j => min(affine(col("h"), j)).as(s"mh_$j")): _*)

  /** LSH candidate pairs: documents sharing at least one band of the
    * signature (bands of `rows` consecutive minhashes). Output a_id < b_id.
    *
    * `maxBucket` caps per-bucket membership (see [[BucketedPairs.prune]]) —
    * on degenerate corpora (N identical docs → one bucket → N² pairs in one
    * task) oversized buckets are dropped with a warning instead of
    * stalling the stage.
    */
  def lshCandidates(sig: DataFrame, k: Int, rows: Int,
      maxBucket: Int = Int.MaxValue): DataFrame =
    lshCandidatesWithDrops(sig, k, rows, maxBucket).pairs

  /** Candidate pairs plus the dropped-bucket side output (one row per
    * over-cap band bucket: band, bval, members) — the pipeline entry
    * point, capped by default so a boilerplate bucket can be routed to
    * exact dedup instead of stalling the stage.
    */
  def lshCandidatesWithDrops(sig: DataFrame, k: Int, rows: Int,
      maxBucket: Int = BucketedPairs.DefaultMaxBucket): CandidatePairs = {
    import sig.sparkSession.implicits._
    val bandedSig = banded(sig, k, rows) // arg sanity checked there
    // bucket-collect + in-bucket pair emission: ONE pass over the signature
    // (a self-join would recompute the whole minhash pipeline for each side)
    // and one shuffle on the band value; LSH buckets are near-dup clusters,
    // so they stay small by construction
    val sp = BucketedPairs.split(bandedSig, Seq("band", "bval"), maxBucket)
    val pairs = sp.kept
      .groupBy(col("band"), col("bval"))
      .agg(collect_list(col("doc_id")).as("ids"))
      .select(col("ids"))
      .as[Seq[Long]]
      .flatMap { ids =>
        val sorted = ids.sorted
        for {
          i <- sorted.indices.iterator
          j <- (i + 1) until sorted.size
        } yield (sorted(i), sorted(j))
      }
      .toDF("a_id", "b_id")
      .distinct()
    CandidatePairs(pairs, sp.dropped)
  }

  /** Pair output plus the quarantine side channel of over-cap buckets. */
  final case class CandidatePairs(pairs: DataFrame, droppedBuckets: DataFrame)

  /** (doc_id, band, bval) band assignments for a signature frame — the
    * shared banding used by candidate generation and by quarantine-member
    * resolution (a dropped bucket's (band, bval) key semi-joins back here
    * to name its documents).
    */
  def banded(sig: DataFrame, k: Int, rows: Int): DataFrame = {
    // rows > k yields ZERO bands (silently no candidates — the pipeline
    // would report a clean corpus); a non-dividing rows silently drops
    // the trailing minhashes from banding. Both are caller bugs — fail
    // loudly at plan time.
    require(rows >= 1 && rows <= k && k % rows == 0,
      s"banding needs 1 <= rows <= k and rows | k, got k=$k rows=$rows")
    val nBands = k / rows
    sig.select(col("doc_id"), explode(array(
      (0 until nBands).map { b =>
        struct(lit(b).as("band"),
          concat_ws("|", (0 until rows).map(r => col(s"mh_${b * rows + r}")): _*)
            .as("bval"))
      }: _*)).as("bs"))
      .select(col("doc_id"), col("bs.band"), col("bs.bval"))
  }

  /** 60-bit SimHash over whitespace tokens (with multiplicity): bit i set
    * iff tokens with bit i set outnumber those without.
    */
  def simhash64(docs: DataFrame, textCol: String): DataFrame = {
    val toks = docs.select(col("doc_id"),
      explode(split(trim(col(textCol)), "\\s+")).as("t"))
      .select(col("doc_id"), hash60(col("t")).as("h"))
    // 60 independent sum aggregates over the token rows — all map-side
    // partial-aggregable in ONE groupBy. (The obvious alternative,
    // exploding a (token, bit) row per bit, pushes 60x the rows through
    // the shuffle for the same 60 sums.)
    val sums = (0 until 60).map { b =>
      sum(expr(s"shiftrightunsigned(h, $b) % 2") * 2 - 1).as(s"s_$b")
    }
    toks.groupBy(col("doc_id"))
      .agg(sums.head, sums.tail: _*)
      .select(col("doc_id"),
        (0 until 60).map { b =>
          when(col(s"s_$b") > 0, lit(1L << b)).otherwise(0L)
        }.reduce(_ + _).as("simhash"))
  }

  /** Near-dup pairs by SimHash Hamming distance <= maxDist — pigeonhole
    * band join, fully distributed.
    *
    * Split the 60-bit sketch into `maxDist + 1` bit-bands: two sketches at
    * Hamming distance <= maxDist differ in at most maxDist bands, so by
    * pigeonhole at least one band is bit-identical — shuffling on
    * (band, bits) finds EVERY qualifying pair (this is exact, not
    * approximate), then the full Hamming distance is verified within the
    * bucket and multi-band hits are deduplicated. At 100 TB: one explode
    * (×(maxDist+1)), one shuffle on band bits, no driver hop — versus the
    * previous implementation which collected every sketch to the driver
    * and paired O(n²) off a broadcast.
    *
    * `maxBucket` caps per-bucket membership ([[BucketedPairs.prune]]): N
    * identical documents share all bands and would otherwise put N²
    * verification pairs in one task.
    */
  def simhashNearDups(sh: DataFrame, maxDist: Int,
      maxBucket: Int = Int.MaxValue): DataFrame =
    simhashNearDupsWithDrops(sh, maxDist, maxBucket).pairs

  /** Near-dup pairs plus the dropped-bucket side output (band, bits,
    * members) — capped by default for pipeline use.
    */
  def simhashNearDupsWithDrops(sh: DataFrame, maxDist: Int,
      maxBucket: Int = BucketedPairs.DefaultMaxBucket): CandidatePairs = {
    require(maxDist >= 0 && maxDist < 60, s"maxDist must be in [0, 60), got $maxDist")
    val spark = sh.sparkSession
    import spark.implicits._
    val nBands = maxDist + 1
    // even bit partition: band b covers [60b/n, 60(b+1)/n) — every band
    // non-empty for n <= 60, so the pigeonhole argument holds exactly
    val banded = sh.select(col("doc_id"), col("simhash"), explode(array(
      (0 until nBands).map { b =>
        val lo = 60 * b / nBands
        val w = 60 * (b + 1) / nBands - lo
        struct(lit(b).as("band"),
          expr(s"shiftrightunsigned(simhash, $lo) & ${(1L << w) - 1}")
            .as("bits"))
      }: _*)).as("bs"))
      .select(col("doc_id"), col("simhash"),
        col("bs.band").as("band"), col("bs.bits").as("bits"))
    val sp = BucketedPairs.split(banded, Seq("band", "bits"), maxBucket)
    val pairs = sp.kept
      .groupBy(col("band"), col("bits"))
      .agg(collect_list(struct(col("doc_id"), col("simhash"))).as("items"))
      .select(col("items"))
      .as[Seq[(Long, Long)]]
      .flatMap { items =>
        val arr = items.toArray
        for {
          i <- arr.indices.iterator
          j <- (i + 1) until arr.length
          (id, s) = arr(i)
          (oid, os) = arr(j)
          d = java.lang.Long.bitCount(s ^ os)
          if d <= maxDist
        } yield (math.min(id, oid), math.max(id, oid), d)
      }
      .toDF("a_id", "b_id", "dist")
      .distinct()
    CandidatePairs(pairs, sp.dropped)
  }
}
