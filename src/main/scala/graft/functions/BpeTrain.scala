package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed BPE tokenizer training (Sennrich et al. 2016 — learn the
  * merge table a byte-pair tokenizer runs): repeatedly find the most
  * frequent adjacent symbol pair in the corpus and merge it. The
  * training-data pipeline counterpart of [[TokenCount]]'s BPE-ish
  * counting: this learns the merges themselves.
  *
  * Scale shape — the classic algorithm is corpus-sized per round; this
  * one is VOCAB-sized: pair statistics are computed over the distinct
  * WORD-frequency table (one corpus scan + one shuffle, ever), and each
  * merge round is then (a) one partial-aggregable pair-count over the
  * word table weighted by word frequency, (b) a ONE-ROW argmax to the
  * driver (count desc, pair asc — fully deterministic), (c) a columnar
  * `replace` applying the merge. At 100 TB the word table is tens of
  * millions of rows regardless of corpus size, so N rounds cost N small
  * aggregates, not N corpus scans.
  *
  * Representation: a word is its space-joined symbol string (initially
  * one char per symbol; symbols never contain spaces). Applying a merge
  * is a left-to-right non-overlapping fold over the symbol list — the
  * `aggregate` higher-order function whose accumulator is the rebuilt
  * string, with its LAST token playing "previous symbol": when the last
  * token is `l` and the next is `r` they fuse into `lr`, and the fused
  * token can never re-match in the same pass (`l + r ≠ l`), which is
  * exactly reference BPE's greedy non-overlapping application (a
  * space-padded string `replace` would NOT be: its match consumes the
  * delimiter, so runs like `a a a a` merge once instead of twice). The
  * DuckDB oracle replays the identical fold via a recursive CTE. No
  * end-of-word marker (merges stay within words); add one upstream as a
  * reserved symbol if cross-boundary merges must be blocked from a
  * downstream tokenizer's perspective.
  */
object BpeTrain {

  /** One learned merge: at `merge_rank`, symbols `l_sym r_sym` fused
    * into `merged`, with corpus-weighted pair frequency `f_weight`.
    */
  final case class Merge(merge_rank: Int, l_sym: String, r_sym: String,
      merged: String, f_weight: Long)

  /** The word-frequency table: (word, syms, freq) with `syms` the
    * space-joined character symbols. One scan + one shuffle. `word` is
    * retained so the trained table doubles as the tokenizer vocabulary
    * (word → final symbol segmentation).
    */
  def wordTable(docs: DataFrame, textCol: String): DataFrame =
    docs
      .select(explode(split(trim(col(textCol)), "\\s+")).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))
      .select(col("word"),
        trim(regexp_replace(col("word"), "(.)", "$1 ")).as("syms"),
        col("freq"))

  /** Learned merges plus the final word → segmentation vocabulary.
    * `vocab` is persisted; `unpersist()` it when done.
    */
  final case class Trained(merges: Seq[Merge], vocab: DataFrame) {
    def unpersist(): Unit = { vocab.unpersist(); () }
  }

  /** Corpus-weighted adjacent-pair counts over a word table — the
    * partial-aggregable per-round statistic [[train]] argmaxes over
    * (adjacent pairs of each word's symbol list, weighted by freq; the
    * empty case is an explicit CASE — `sequence(1, 0)` descends).
    * Public so a round boundary can be oracle-probed in isolation
    * (`q_bpe_pairs1` bisects a merge-table divergence into "round-1
    * statistics" vs "argmax/fold replay").
    */
  def pairCounts(words: DataFrame): DataFrame =
    words
      .withColumn("l", split(col("syms"), " "))
      .select(col("freq"), explode(expr(
        """case when size(l) >= 2 then
          |  transform(sequence(1, size(l) - 1),
          |    i -> concat(element_at(l, i), ' ', element_at(l, i + 1)))
          |else cast(array() as array<string>) end""".stripMargin)).as("pair"))
      .groupBy(col("pair")).agg(sum(col("freq")).as("f"))

  /** Learn `rounds` merges. Each round's argmax is the ONLY driver
    * traffic (one row per round).
    */
  def train(spark: SparkSession, words: DataFrame, rounds: Int): Trained = {
    val out = Vector.newBuilder[Merge]
    var cur = words.persist()
    // ONE action per round: round r's argmax is the action that
    // materializes round r-1's lazily-pinned merge result, reading the
    // STILL-CACHED previous table — only then is that previous cache
    // released (an eager per-round count would be a second action per
    // round; an unpersist before the next action would cascade a full
    // recompute chain). `prev` is the one table whose release is
    // pending.
    var prev: Option[DataFrame] = None
    // tracks whether the LAST assignment to cur was already a lineage
    // cut — the final-cut decision keys on this, not on prev.isDefined,
    // so the exhaustion path (argmax returns no pair right after
    // releasing prev) cannot return a plan nesting up to LineageEvery-1
    // applyMerge folds and silently break the returned-plan-is-a-leaf
    // contract that tokenize's per-query re-analysis relies on
    var lastWasCut = false
    var r = 1
    var exhausted = false
    while (r <= rounds && !exhausted) {
      val pairs = pairCounts(cur)
        .orderBy(col("f").desc, col("pair").asc)
        .limit(1)
        .collect()
      // cur's storage is materialized now — the table behind it can go
      prev.foreach(_.unpersist()); prev = None
      if (pairs.isEmpty) exhausted = true
      else {
        val pair = pairs(0).getString(0)
        val f = pairs(0).getLong(1)
        val Array(l, rr) = pair.split(" ", 2)
        out += Merge(r, l, rr, l + rr, f)
        val applied = cur
          .select(col("word"), applyMerge(col("syms"), l, rr).as("syms"),
            col("freq"))
        // persist bounds the PHYSICAL recompute; it does not truncate
        // the LOGICAL plan, which nests one applyMerge fold per round —
        // at a realistic merge count (thousands, not the bench's 8)
        // per-round Catalyst analysis would grow O(r) and the loop
        // O(r²). A periodic lineage cut (graft.core.Lineage.cut —
        // reliable checkpoint on a cluster) brings the plan back to a
        // leaf, keeping every round O(1) in plan depth. Both pins are
        // LAZY — the next round's argmax (or the final materialization
        // below) is the single action that fills them.
        lastWasCut = r % LineageEvery == 0
        val next =
          if (lastWasCut)
            graft.core.Lineage.cut(applied.toDF(), eager = false)
          else applied.persist()
        prev = Some(cur)
        cur = next
        r += 1
      }
    }
    // final lineage cut: materializes the vocab before releasing the
    // table it derives from (the returned Trained must stand on its own
    // storage) AND truncates the returned plan to a leaf — without it
    // the vocab plan nests one applyMerge fold per round between
    // LineageEvery cuts, and every downstream analysis (tokenize's
    // join re-analyzes it per query) pays the whole tree (~400 KB
    // formatted at 8 rounds)
    if (!lastWasCut) {
      val last = cur
      cur = graft.core.Lineage.cut(cur)
      // the checkpoint stands alone: release the last round's pin and
      // the table it read from
      last.unpersist()
      prev.foreach(_.unpersist()); prev = None
    } else if (prev.isDefined) {
      // the loop exited right on a cut round: cur is already a leaf but
      // its LAZY cut was never filled by a next-round argmax — one
      // action materializes it while the table it reads is still
      // cached, then that pin can go
      cur.count()
      prev.foreach(_.unpersist()); prev = None
    }
    Trained(out.result(), cur)
  }

  /** Rounds between lineage-truncating checkpoints in [[train]]. */
  private val LineageEvery = 16

  /** The greedy non-overlapping merge fold (see the class scaladoc):
    * pure Column DSL, so corpus symbols never touch SQL text. Lengths
    * are code points, matching SQL `length`.
    */
  private def applyMerge(syms: org.apache.spark.sql.Column, l: String,
      r: String): org.apache.spark.sql.Column = {
    val lLen = lit(l.codePointCount(0, l.length))
    aggregate(
      split(syms, " "),
      lit(""),
      (s, x) =>
        when((s === lit(l) || s.endsWith(lit(" " + l))) && x === lit(r),
          concat(s.substr(lit(1), length(s) - lLen), lit(l + r)))
          .otherwise(when(s === lit(""), x)
            .otherwise(concat(s, lit(" "), x))))
  }

  /** The learned merge table as a DataFrame (for the oracle row). */
  def merges(spark: SparkSession, docs: DataFrame, textCol: String,
      rounds: Int): DataFrame = {
    import spark.implicits._
    val t = train(spark, wordTable(docs, textCol), rounds)
    try t.merges.toDF() finally t.unpersist()
  }

  /** Tokenize with an already-[[Trained]] vocabulary: per document,
    * the BPE token count. The vocab join is the scale story: a corpus
    * joins its (exploded) words against the VOCAB-sized mapping, which
    * Spark broadcasts when small and shuffle-joins otherwise; no
    * per-document re-segmentation work is repeated across duplicate
    * words. The caller owns the vocab lifecycle
    * (`trained.unpersist()` once results are materialized) — the
    * production shape: train once, tokenize many batches.
    */
  def tokenize(docs: DataFrame, idCol: String, textCol: String,
      trained: Trained): DataFrame =
    docs
      .select(col(idCol), explode(split(trim(col(textCol)), "\\s+")).as("word"))
      .filter(length(col("word")) > 0)
      .join(trained.vocab.select(col("word"),
        size(split(col("syms"), " ")).as("n_sym")), "word")
      .groupBy(col(idCol))
      .agg(sum(col("n_sym")).as("n_bpe_tokens"))

  /** Train-then-tokenize in one call — the ORACLE/bench shape (retrain
    * per invocation for determinism). The internal vocab pin stays
    * cached until the harness's per-query `clearCache()` (the result is
    * lazy, so unpersisting here would drop the pin before execution);
    * a long-lived application should [[train]] once and use the
    * [[Trained]] overload instead.
    */
  def tokenize(spark: SparkSession, docs: DataFrame, idCol: String,
      textCol: String, rounds: Int): DataFrame =
    tokenize(docs, idCol, textCol,
      train(spark, wordTable(docs, textCol), rounds))
}
