package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.core.StreamElement
import graft.streaming.CommitLogFamily

/** Physical-plan quality gates — the properties that make the 100 TB story
  * real: predicates reach the parquet scan, projections prune the read
  * schema, stamp ranges push down, and small dimensions broadcast. These
  * assertions pin the plan shape so a refactor that silently drops a
  * pushdown fails CI, not a production run.
  */
class PlanQualitySpec extends SparkSpec {
  import SparkSpec.spark.implicits._

  private def fam() = {
    val f = new CommitLogFamily(spark,
      Files.createTempDirectory("graft-plan-").toString + "/log")
    f.append((1 to 100).map(i =>
      StreamElement("e", s"u$i", "status", s"uu$i", 0, i.toLong,
        Array[Byte](1), delete = false, deleteWildcard = false)))
    f
  }

  test("point-lookup key predicate is pushed into the parquet scan") {
    val plan = fam().batchUpdates().filter(col("key") === "u7")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters"), plan)
    assert(plan.contains("EqualTo(key,u7)"), plan)
  }

  test("stamp-range read pushes both bounds into the scan") {
    val plan = fam().batchUpdates(from = 10, until = 20)
      .queryExecution.executedPlan.toString
    assert(plan.contains("GreaterThanOrEqual(stamp,10)"), plan)
    assert(plan.contains("LessThan(stamp,20)"), plan)
  }

  test("projection prunes the parquet read schema to selected columns") {
    val plan = fam().batchUpdates().toDF().select(col("key"), col("stamp"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("ReadSchema: struct<key:string,stamp:bigint>"), plan)
    assert(!plan.contains("value"), "unselected binary column must not be read")
  }

  test("small dimension side of a join is broadcast") {
    val facts = (1 to 10000).map(i => (i.toLong, i % 25)).toDF("id", "dim_id")
    val dims = (0 until 25).map(i => (i, s"dim$i")).toDF("dim_id", "name")
    val plan = facts.join(dims, "dim_id")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("decontamination broadcasts the eval gram set, not the corpus") {
    val train = (1 to 500).map(i =>
      (i.toLong, (1 to 30).map(j => s"d${i}t$j").mkString(" ")))
      .toDF("doc_id", "text")
    val eval = Seq((9001L, "alpha beta gamma delta epsilon"))
      .toDF("doc_id", "text")
    val plan = graft.functions.Curation.decontaminate(train, eval, "text", 4)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("domain-mix rates join back by broadcast") {
    val docs = (1 to 1000).map(i => (i.toLong, s"src${i % 5}", 100L))
      .toDF("doc_id", "source", "n_chars")
    val rates = graft.functions.Curation.domainMixRates(docs, "source", "n_chars")
    val plan = docs.join(broadcast(rates), "source")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("quality gate runs inside the scan stage (no shuffle before filter)") {
    val dir = Files.createTempDirectory("graft-qgate-").toString + "/docs"
    (1 to 200).map(i => (i.toLong, (1 to 40).map(j => s"d${i}w$j").mkString(" ")))
      .toDF("doc_id", "text").write.parquet(dir)
    val docs = spark.read.parquet(dir)
    val t = split(trim(col("text")), "\\s+")
    val gated = docs.filter(size(t) >= 30 &&
      size(array_distinct(t)) * 100 >= size(t) * 35)
    val plan = gated.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"per-doc quality gate must not shuffle:\n$plan")
  }

  test("winnowing selection is in-row: no sort, no window, no shuffle") {
    val dir = Files.createTempDirectory("graft-winnow-").toString + "/docs"
    (1 to 64).map(i => (i.toLong, (1 to 60).map(j => s"d${i}w$j").mkString(" ")))
      .toDF("doc_id", "text").repartition(32).write.parquet(dir)
    val docs = spark.read.parquet(dir)
    // 32 input splits >= cores: the small-input guard must NOT fire, and
    // the whole selection must stay inside the scan stage — the property
    // that makes it one pass over a 100 TB corpus
    val plan = graft.functions.Winnow.fingerprints(docs, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"winnow selection must not shuffle:\n$plan")
    assert(!plan.contains("WindowExec") && !plan.contains("Sort"),
      s"winnow selection must not sort:\n$plan")
  }

  test("exact quantiles window over the histogram, never the raw rows") {
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Window => LWindow}
    val docs = (1 to 5000).map(i => (i.toLong, if (i % 2 == 0) "en" else "de",
      (i % 37).toLong)).toDF("doc_id", "lang", "n_chars")
    val q = graft.functions.Curation.exactQuantiles(docs, "lang", "n_chars",
      Seq(50, 90, 99))
    val wins = q.queryExecution.optimizedPlan.collect { case w: LWindow => w }
    assert(wins.nonEmpty, "cumulative ranks require one window")
    wins.foreach { w =>
      assert(w.child.collectFirst { case a: Aggregate => a }.isDefined,
        s"the window must consume the per-(group,value) histogram, not " +
          s"the raw corpus (a bare-group row sort is the 100 TB skew " +
          s"funnel):\n${q.queryExecution.optimizedPlan}")
    }
    // group totals come from a window over the same partition, never a
    // second aggregation branch over the corpus
    val plan = q.queryExecution.executedPlan.toString
    val scans = "Scan".r.findAllIn(plan).size
    assert(scans == 1, s"quantiles must read the corpus exactly once, saw $scans scans:\n$plan")
  }

  test("bm25 top-k lowers to TakeOrdered over a broadcast stats row") {
    val dir = Files.createTempDirectory("graft-bm25-").toString + "/docs"
    (1 to 500).map(i => (i.toLong, (1 to 30).map(j => s"w${(i + j) % 40}").mkString(" ")))
      .toDF("doc_id", "text").write.parquet(dir)
    val docs = spark.read.parquet(dir)
    val plan = graft.functions.Bm25
      .topK(docs, "doc_id", "text", Seq("w1", "w2"), 10)
      .queryExecution.executedPlan.toString
    // global top-k must be per-partition TakeOrdered, never a full sort
    assert(plan.contains("TakeOrderedAndProject"),
      s"bm25 top-k must lower to TakeOrdered:\n$plan")
    assert(!plan.contains("SortExec"), s"no global sort for top-k:\n$plan")
    // the stats side is one 1-row aggregate, broadcast — the corpus is
    // read exactly twice (stats pass + scoring pass), never more
    assert(plan.contains("BroadcastNestedLoopJoin") ||
      plan.contains("BroadcastExchange"), plan)
    val scans = "Scan parquet".r.findAllIn(plan).size
    assert(scans == 2, s"bm25 reads the corpus exactly twice, saw $scans:\n$plan")
  }

  test("lm scoring joins the broadcast count tables, corpus scanned 3x") {
    val dir = Files.createTempDirectory("graft-lm-").toString + "/docs"
    (1 to 500).map(i => (i.toLong, (1 to 30).map(j => s"w${(i * j) % 40}").mkString(" ")))
      .toDF("doc_id", "text").write.parquet(dir)
    val docs = spark.read.parquet(dir)
    val q = graft.functions.NGramLm.score(docs, "doc_id", "text")
    try {
      val plan = q.queryExecution.executedPlan.toString
      // small-vocab model: both count-table joins broadcast (an open
      // vocabulary legitimately falls back to shuffle joins — the model
      // is data-sized — but this corpus must not)
      assert("BroadcastHashJoin".r.findAllIn(plan).size >= 2,
        s"bc and hist joins must broadcast:\n$plan")
      // the hist roll-up and the scoring join must both consume the
      // PERSISTED bigram-count table — without the persist Spark re-runs
      // the whole bigram-count corpus scan for hist (no subtree sharing)
      assert("InMemoryTableScan".r.findAllIn(plan).size >= 2,
        s"bc must be persisted and reused for hist + scoring:\n$plan")
    } finally spark.catalog.clearCache()
  }

  test("bounded (as-of) snapshot pushes the horizon into the parquet scan") {
    // the asOf bound must stay a RELATIONAL filter: a typed lambda is an
    // object barrier that would force deserializing the full
    // post-horizon history on both compaction branches
    val plan = fam().batchSnapshot(asOf = 50)
      .queryExecution.executedPlan.toString
    assert(plan.contains("LessThanOrEqual(stamp,50)"),
      s"asOf must reach PushedFilters:\n$plan")
  }

  test("chunking shuffles chunk summaries, never tokens") {
    // the prefix sums are in-row: the ONLY exchange in the plan is the
    // per-(doc, chunk) summary aggregation — a per-token exchange would
    // mean the fold regressed to a window function
    val docs = (1 to 50).map(i =>
      (i.toLong, (1 to 80).map(j => s"w$i$j").mkString(" ")))
      .toDF("doc_id", "text")
    val plan = graft.functions.Chunk.byCharBudget(docs, "doc_id", "text", 100)
      .queryExecution.executedPlan.toString
    assert("Exchange".r.findAllIn(plan).size == 1,
      s"exactly one exchange (the summary agg):\n$plan")
    assert(plan.contains("HashAggregate"), plan)
  }

  test("snapshot diff restricts history to delta-touched keys (semi join " +
    "below the compactions)") {
    val f = fam()
    val plan = graft.operators.SnapshotDiff.diff(f.batchUpdates(), 10, 20)
      .queryExecution.executedPlan.toString
    assert(plan.contains("LeftSemi"),
      s"history must semi-join against the delta key set:\n$plan")
    // the delta key set itself comes from a stamp-range-pruned scan
    assert(plan.contains("GreaterThan(stamp,10)") ||
      plan.contains("GreaterThan(stamp,10)".replace(" ", "")),
      s"delta scan must push the stamp range:\n$plan")
  }

  test("default snapshot compaction is the skew-safe per-cell plan") {
    val plan = fam().batchSnapshot().queryExecution.executedPlan.toString
    // per-(key,attribute) typed reduce (hash-aggregated, ONE element of
    // state per cell) + tombstone join — NOT the one-pass aggregator
    // whose buffer holds every live wildcard suffix of a (key, prefix)
    // in one in-memory map (the wide-hot-key risk the default must not
    // carry), and NOT a sort-based aggregation of the full changelog
    // (max_by over a struct plans SortAggregate on both shuffle sides)
    assert(plan.contains("ObjectHashAggregate"),
      s"per-cell reduce must plan as a hash aggregate:\n$plan")
    assert(!plan.contains("LatestWithTombstones"),
      s"default snapshot must not route through the wide-Acc aggregator:\n$plan")
    // two scans are the deliberate trade: the second (tombstone) scan
    // carries the deleteWildcard pushdown so it reads tombstones only
    val scans = "FileScan parquet".r.findAllIn(plan).size
    assert(scans == 2, s"two-pass snapshot reads log + tombstones, saw $scans scans\n$plan")
    assert(plan.contains("PushedFilters: [IsNotNull(deleteWildcard), EqualTo(deleteWildcard,true)]")
      || plan.contains("EqualTo(deleteWildcard,true)"),
      s"tombstone scan must push the deleteWildcard filter:\n$plan")
  }

  test("epoch-arithmetic tumbling window is one partial-agg pass, no expand") {
    // the session-zone-free window lowering (WindowQueries r8) must keep
    // the plan a plain two-phase hash aggregate in whole-stage codegen —
    // no Expand (window() struct explosion) and exactly one exchange
    val df = graft.queries.WindowQueries
      .queries("q_window_tumbling")(spark, "/root/testdata/sf0.001")
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Expand"), plan)
    // two-phase: partial_ functions before the exchange, final after
    assert(plan.contains("partial_count"), plan)
    val exchanges = "Exchange".r.findAllIn(plan).size
    assert(exchanges == 1, s"one shuffle expected, saw $exchanges\n$plan")
  }

  test("proxy read filters on the RAW attribute below the rename") {
    // the proxy view's read predicate must be on the raw name (pushable
    // below the rename projection), not on the renamed output
    val raw = fam()
    raw.append(Seq(StreamElement("e", "k", "_e.x", "uup", 0, 5L,
      Array[Byte](2), delete = false, deleteWildcard = false)))
    val view = graft.core.Proxies.view(raw, "event.*",
      graft.core.ProxySpec(
        Some(graft.core.ProxySide("_e.*", None)), None))
    val plan = view.batchUpdates().queryExecution.executedPlan.toString
    assert(plan.contains("StartsWith(attribute,_e.)"), plan)
  }

  test("dsir selection is a map-only scoring scan lowered to TakeOrdered") {
    val dir = Files.createTempDirectory("graft-dsir-").toString + "/docs"
    (1 to 400).map(i => (i.toLong, if (i % 3 == 0) "en" else "de",
        (1 to 20).map(j => s"w${(i + j) % 50}").mkString(" ")))
      .toDF("doc_id", "lang", "text").write.parquet(dir)
    val docs = spark.read.parquet(dir)
    val plan = graft.functions.Dsir
      .sample(docs, "text", col("lang") === "en", b = 128)
      .queryExecution.executedPlan.toString
    // λ rides the task binary as a literal: scoring joins nothing and
    // selection is per-partition top-k + k-row driver merge
    assert(plan.contains("TakeOrderedAndProject"),
      s"dsir selection must lower to TakeOrdered:\n$plan")
    assert(!plan.contains("SortExec"), s"no global sort for top-k:\n$plan")
    assert(!plan.contains("Join"), s"scoring must not join:\n$plan")
    assert(!plan.contains("ShuffleExchange"),
      s"scoring must be map-only up to the TakeOrdered:\n$plan")
  }

  test("cms candidate filter runs below the exact-recount exchange") {
    val dir = Files.createTempDirectory("graft-cms-").toString + "/toks"
    (1 to 5000).map(i => Tuple1(s"t${i % 60}")).toDF("token")
      .write.parquet(dir)
    val tokens = spark.read.parquet(dir)
    val plan = graft.functions.Cms.heavyHitters(tokens, "token", denom = 50L)
      .queryExecution.executedPlan.toString
    // exactly one exchange (the candidate groupBy) and the est-threshold
    // Filter must sit under it, so the tail never shuffles
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges == 1, s"one shuffle for the recount, saw $exchanges:\n$plan")
    val filterPos = plan.indexOf("Filter")
    val exchangePos = plan.indexOf("Exchange hashpartitioning")
    assert(filterPos > exchangePos && filterPos >= 0,
      s"estimate filter must be below (after, in tree print) the exchange:\n$plan")
  }

  test("bloom prefilter probes map-side, below the join exchange") {
    val dir = Files.createTempDirectory("graft-bloom-").toString
    (1L to 20000L).map(i => (i, i % 100)).toDF("k", "v")
      .write.parquet(dir + "/probe")
    (1L to 20000L by 197L).map(i => (i, s"b$i")).toDF("bk", "bv")
      .write.parquet(dir + "/build")
    val probe = spark.read.parquet(dir + "/probe")
    val build = spark.read.parquet(dir + "/build")
    val pre = graft.functions.BloomJoin.prefilter(probe, "k", build, "bk")
    val joined = pre.join(build.hint("shuffle_hash"),
      pre("k") === build("bk"))
    val planStr = joined.queryExecution.executedPlan.toString
    // the join shuffles (the regime the prefilter exists for) and the
    // might_contain probe runs in the SCAN stage: no exchange between
    // the Filter holding it and the FileScan it guards — i.e. rows are
    // dropped map-side, before they are shuffled for the join
    assert(planStr.contains("ShuffledHashJoin") ||
      planStr.contains("SortMergeJoin"), planStr.take(1200))
    val probePos = planStr.indexOf("might_contain")
    assert(probePos >= 0, planStr.take(1200))
    val scanPos = planStr.indexOf("FileScan", probePos)
    assert(scanPos > probePos &&
      !planStr.substring(probePos, scanPos).contains("Exchange"),
      s"bloom probe must run in the scan stage (map-side):\n$planStr")
  }

  test("exact substring dedup: first-occurrence min is partial-aggregable") {
    val docs = (1 to 300).map(i =>
      (i.toLong, (1 to 40).map(j => s"d${i}w$j").mkString(" ")))
      .toDF("doc_id", "text")
    val planStr = graft.functions.Curation
      .exactSubstringDedup(docs, "doc_id", "text", k = 8)
      .queryExecution.executedPlan.toString
    // the corpus-sized gram stream must combine map-side before the
    // only corpus-wide shuffle (partial_min over the packed occurrence
    // key), and nothing in the pipeline may degrade to a sort-based
    // aggregate (the skew hazard at 100 TB: a hot gram hash sorting a
    // whole partition)
    assert(planStr.contains("partial_min"), planStr.take(1500))
    assert(!planStr.contains("SortAggregate"), planStr.take(1500))
  }

  test("media decode stages are map-only: no exchange, no driver hop") {
    val media = graft.multimodal.Multimodal
      .syntheticMedia(spark, "/root/testdata/sf0.001")
    // real container parse + stats happen inside the scan's partition:
    // a shuffle here would mean the decode stage re-keyed corpus-sized
    // binary payloads for no reason. syntheticMedia deliberately applies
    // NO Spread (the uncompressed BMP/WAV/Y4M encode is cheap — measured,
    // see Multimodal.syntheticMedia), so its consumers must be
    // ZERO-exchange: an accidental future round-robin of decoded
    // payloads fails this law, not just a hash/range exchange
    Seq(
      graft.multimodal.Multimodal.imageStats(media).queryExecution,
      graft.multimodal.Multimodal.audioStats(media).queryExecution,
      graft.multimodal.Multimodal.videoFrameStats(media, 2).queryExecution,
      graft.multimodal.Multimodal.imageAHash(media).queryExecution
    ).foreach { qe =>
      val planStr = qe.executedPlan.toString
      assert(!planStr.contains("Exchange"), planStr.take(1200))
    }
  }

  test("reservoir sample: bounded partial aggregation below the exchange") {
    val docs = (1 to 2000).map(i => (i.toLong, s"l${i % 5}"))
      .toDF("doc_id", "lang")
    val planStr = graft.functions.Reservoir
      .sampleByKey(docs, "lang", "doc_id", 20, "res")
      .queryExecution.executedPlan.toString
    // the whole point vs the window spelling: each partition reduces to
    // ≤ n candidates per key BEFORE the exchange (partial ObjectHashAgg
    // of the bounded Agg), and no corpus-wide window/sort appears
    assert(planStr.contains("ObjectHashAggregate"), planStr.take(1500))
    assert(planStr.contains("partial_"), planStr.take(1500))
    assert(!planStr.contains("Window"),
      s"reservoir must not degrade to the corpus-shuffling window plan:\n" +
        planStr.take(1500))
  }

  test("rrf fusion: fused top-k lowers to TakeOrdered over k-row legs") {
    val kw = (1 to 50).map(i => (i.toLong, i.toLong)).toDF("doc_id", "rk")
    val vec = (30 to 79).map(i => (i.toLong, (i - 29).toLong)).toDF("doc_id", "rk")
    val planStr = graft.functions.Rrf
      .fuse(Seq("kw" -> kw, "vec" -> vec), "doc_id", 20)
      .queryExecution.executedPlan.toString
    // the final selection is TakeOrderedAndProject (per-partition top-k
    // + driver merge of k rows), never a global Sort behind an Exchange
    assert(planStr.contains("TakeOrderedAndProject"), planStr.take(1500))
  }

  test("ngram novelty: bloom probe drops definitely-novel grams in the " +
      "scan stage") {
    val dir = Files.createTempDirectory("graft-novel-").toString
    (1 to 300).map(i =>
      (i.toLong, (1 to 30).map(j => s"d${i % 40}w$j").mkString(" ")))
      .toDF("doc_id", "text").write.parquet(dir + "/docs")
    val docs = spark.read.parquet(dir + "/docs")
    val planStr = graft.functions.Curation
      .noveltyRate(docs.filter(col("doc_id") >= 40),
        docs.filter(col("doc_id") < 40), "text", n = 4)
      .queryExecution.executedPlan.toString
    // the membership classification must be map-side: no Exchange
    // between the might_contain Filter and the eval-side scan it guards
    // — bloom-negative (provably novel) grams never shuffle
    val probePos = planStr.indexOf("might_contain")
    assert(probePos >= 0, planStr.take(1500))
    val scanPos = planStr.indexOf("FileScan", probePos)
    assert(scanPos > probePos &&
      !planStr.substring(probePos, scanPos).contains("Exchange"),
      s"novelty bloom probe must run in the scan stage:\n${planStr.take(2000)}")
  }

  test("inverted-index postings: vocabulary filter in the scan stage, " +
      "partial-aggregable tf/first_pos") {
    val dir = Files.createTempDirectory("graft-post-").toString
    (1 to 500).map(i => (i.toLong, s"dup w$i vector other$i"))
      .toDF("doc_id", "text").write.parquet(dir + "/docs")
    val docs = spark.read.parquet(dir + "/docs")
    val planStr = graft.functions.Postings
      .forTerms(docs, "doc_id", "text", Seq("dup", "vector", "scan"))
      .queryExecution.executedPlan.toString
    // the in-set vocabulary filter must run between the positional
    // explode and the exchange (map-side): only requested-term postings
    // shuffle, never the corpus token stream
    val filterPos = planStr.indexOf(" IN (")
    assert(filterPos >= 0, planStr.take(1500))
    val scanPos = planStr.indexOf("FileScan", filterPos)
    assert(scanPos > filterPos &&
      !planStr.substring(filterPos, scanPos).contains("Exchange"),
      s"vocab filter must run map-side:\n${planStr.take(2000)}")
    // and both aggregates combine before the shuffle
    assert(planStr.contains("partial_count") ||
      planStr.contains("partial_min") || planStr.contains("partial"),
      planStr.take(1500))
  }

  test("chained stateful composite: exactly two exchanges, both windows " +
      "sort-based (no group materialization)") {
    // q_integrate_after_reduce_state = per-user diff window chained into a
    // per-type running-sum window. The 100 TB shape: ONE shuffle per
    // re-key (user, then type), each followed by a spill-safe sort +
    // streaming window frame — never a groupBy collect, never a third
    // exchange for the chain itself
    val df = graft.queries.StatefulQueries
      .queries("q_integrate_after_reduce_state")(spark, "/root/testdata/sf0.001")
    val planStr = df.queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(planStr).size
    assert(exchanges == 2, s"expected 2 hash exchanges, got $exchanges:\n" +
      planStr.take(2000))
    assert("RunningWindowFunction|Window".r.findAllIn(planStr).nonEmpty, planStr.take(1000))
    assert(!planStr.contains("CartesianProduct") &&
      !planStr.contains("ObjectHashAggregate"), planStr.take(1500))
  }

  test("hamming quarantine side: one partial-aggregable count over the " +
      "banded hashes, no join, no second corpus pass") {
    // the drop side of perceptualNearDupPairsWithDrops is counts > cap —
    // a map-side-combinable groupBy(band, bits).count with ONE exchange;
    // a join (the semi join belongs to the KEPT side only) or a second
    // aggregation pass here would double the corpus cost of quarantining
    val media = graft.queries.MultimodalQueries
      .queries("q_media_hamming_quarantine")(spark, "/root/testdata/sf0.001")
    val planStr = media.queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(planStr).size
    assert(exchanges == 1, s"expected 1 hash exchange, got $exchanges:\n" +
      planStr.take(2000))
    assert("partial_count|partial count".r.findAllIn(planStr.toLowerCase)
      .nonEmpty || planStr.contains("HashAggregate"), planStr.take(1500))
    assert(!planStr.contains("Join") && !planStr.contains("CartesianProduct"),
      planStr.take(1500))
  }

  test("distributed ANN join: hash join on the salted cell key, " +
      "never a cartesian") {
    // the corpus×corpus shape must stay Σ_cells |Q_c|·|V_c|: a planner
    // fallback to CartesianProduct / BroadcastNestedLoopJoin would turn
    // it into all-pairs and a 100 TB self-join into heat death
    val emb = (0L until 120L).map { i =>
      val c = (i % 4).toInt
      (i, Array.tabulate(8)(j =>
        (if (j == c * 2) 10f else 0f) + ((i * 7 + j) % 5) * 0.1f))
    }.toDF("vec_id", "embedding")
    val centroids = graft.functions.Ivf.train(emb, nCentroids = 4, maxIter = 5)
    val store = new graft.functions.IvfStore(spark,
      Files.createTempDirectory("graft-annjoin-plan-").toString + "/v",
      centroids)
    store.write(emb)
    val joined = store.searchTopKJoin(emb, 3, nProbe = 2, salt = 4)
    joined.collect()
    val planStr = joined.queryExecution.executedPlan.toString
    assert(!planStr.contains("CartesianProduct") &&
      !planStr.contains("BroadcastNestedLoopJoin"), planStr.take(2000))
    // the equi-join runs on BOTH key columns: cell AND the salt lane
    val joinLine = planStr.linesIterator
      .find(l => l.contains("Join") && l.contains("cell")).getOrElse(
        fail(s"no cell-keyed join in:\n${planStr.take(2000)}"))
    assert(joinLine.contains("s#") || joinLine.contains("[cell"),
      joinLine)
  }

  test("domain KL: one corpus token pass, reused for the marginals") {
    val docs = (1 to 400).map(i =>
      (i.toLong, s"src${i % 4}", (1 to 30).map(j => s"w${(i * j) % 90}").mkString(" ")))
      .toDF("doc_id", "source", "text")
    val df = graft.functions.Curation.domainKlDivergence(docs, "source", "text")
    df.collect() // AQE finalizes reuse decisions at execution
    val planStr = df.queryExecution.executedPlan.toString
    // c_w / n_d / the total all derive from the (domain, token) count —
    // the plan must reuse that aggregate's exchange, not re-explode the
    // corpus once per marginal
    assert(planStr.contains("ReusedExchange"), planStr.take(2000))
  }
}
