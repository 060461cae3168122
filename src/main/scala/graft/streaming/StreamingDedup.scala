package graft.streaming

import scala.concurrent.duration.FiniteDuration

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.functions.MinHashLsh

/** Streaming near-duplicate gate: every incoming document is checked
  * against the corpus seen SO FAR — the ingestion-time dedup a
  * training-data pipeline runs before a document ever lands (the batch
  * [[graft.functions.DedupPipeline]] is the retrospective counterpart).
  *
  * Shape: the k-minhash signature is computed PER ROW (a document's
  * signature depends only on its own text, so this is a pure map — no
  * shuffle, unlike the batch columnar lowering which aggregates exploded
  * shingles); each document then lands in its LSH band buckets, and ONE
  * stateful operator (`flatMapGroupsWithState` keyed by band bucket,
  * state = first document id seen) flags any document sharing a bucket
  * with an earlier one. Spark's restriction on chained stateful
  * operators is exactly why the signature must be map-side here.
  *
  * State is bounded by distinct band buckets (≤ documents × bands);
  * at 100 TB the state store shards it by bucket key across executors.
  * For a LONG-RUNNING gate that bound still grows with the corpus —
  * [[bandHitsWithHorizon]] bounds it by a dedup horizon instead: a
  * bucket idle past the horizon is evicted (its next occupant claims it
  * fresh), turning "dup of anything ever seen" into "dup of anything
  * seen within the window" — the standard trade a perpetual ingestion
  * gate makes, via the same event-time timeout machinery as
  * [[StateOps]].
  * The per-row signature math is IDENTICAL to the batch column
  * expressions (same md5-60-bit base hash, same affine permutations mod
  * 2^31-1) — spec-enforced — so streaming flags agree with what the
  * batch pipeline would compute over the same corpus.
  */
object StreamingDedup {

  /** One band-bucket hit: `dup_of` names the bucket's first document
    * (None when this document IS the bucket's first). A document is a
    * near-dup candidate iff ANY of its bands carries `dup_of`.
    */
  final case class BandHit(doc_id: Long, band: Int, bval: String,
      dup_of: Option[Long])

  /** 60-bit md5 base hash — the same digest-byte kernel the columnar
    * [[graft.functions.Hash60Expr]] generates code against.
    */
  private[graft] def hash60(s: String): Long =
    graft.functions.Hash60.digest60(s.getBytes("UTF-8"))

  /** Per-document k-minhash signature over n-token shingles; identical
    * integers to [[MinHashLsh.signature]] (min over the shingle multiset
    * equals min over its set, so no dedup is needed).
    */
  private[graft] def signature(text: String, n: Int, k: Int): Array[Long] = {
    val toks = text.trim.split("\\s+")
    val sig = Array.fill(k)(Long.MaxValue)
    if (toks.length >= n) {
      var i = 0
      while (i + n <= toks.length) {
        val h = hash60(toks.slice(i, i + n).mkString(" ")) % MinHashLsh.P
        var j = 0
        while (j < k) {
          val v = ((2L * j + 1) * h + (j * 7919L + 13L)) % MinHashLsh.P
          if (v < sig(j)) sig(j) = v
          j += 1
        }
        i += 1
      }
    }
    sig
  }

  /** The shared first-claim fold: the smallest id claims an unclaimed
    * key, everyone else is flagged with the claimant — ONE definition,
    * so a claim-semantics fix cannot land in one gate and silently miss
    * the other ([[bandHitsWithHorizon]] keeps its own loop: its state
    * carries the eviction stamp and its order is event-time, not id).
    */
  private def claimFold[O](ids: Seq[Long], state: GroupState[Long],
      out: (Long, Option[Long]) => O): Iterator[O] = {
    var first = state.getOption
    val res = ids.map { id =>
      first match {
        case None =>
          first = Some(id)
          out(id, None)
        case Some(f) => out(id, if (f == id) None else Some(f))
      }
    }
    first.foreach(state.update)
    res.iterator
  }

  /** Band-bucket hits for a (doc_id, text) stream. Update output mode;
    * within one micro-batch the smallest doc id claims a fresh bucket
    * (deterministic).
    */
  def bandHits(docs: Dataset[(Long, String)], n: Int = 3, k: Int = 8,
      bandRows: Int = 2): Dataset[BandHit] = {
    val spark = docs.sparkSession
    import spark.implicits._
    require(k % bandRows == 0, s"bandRows $bandRows must divide k $k")
    val banded = docs.flatMap { case (id, text) =>
      val sig = signature(text, n, k)
      // a document too short to shingle has NO signature — the batch
      // side emits zero signature rows for it (groupBy over zero
      // exploded shingles), so it is never a candidate; banding the
      // all-MaxValue sentinel instead would collide every short
      // document with every other in every band (any real shingle sets
      // all k lanes below MaxValue, so lane 0 is an exact emptiness test)
      if (sig(0) == Long.MaxValue) Seq.empty
      else (0 until k / bandRows).map { b =>
        (b, (0 until bandRows).map(r => sig(b * bandRows + r)).mkString("|"), id)
      }
    }
    banded
      .groupByKey { case (b, bval, _) => (b, bval) }
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (key: (Int, String), rows: Iterator[(Int, String, Long)],
            state: GroupState[Long]) =>
          claimFold(rows.map(_._3).toSeq.sorted, state,
            (id, d) => BandHit(id, key._1, key._2, d))
      }
  }

  /** One first-claim result: `dup_of` names the key's first document
    * (None when this document IS the claimant).
    */
  final case class KeyClaim(doc_id: Long, key_h: Long, dup_of: Option[Long])

  /** Generic EXACT first-claim gate over a 60-bit key — the streaming
    * counterpart of "group by key, min(doc_id) wins", used as the
    * crawl-frontier canonical-URL dedup (key = hash of the canonical
    * form, computed map-side upstream via [[graft.functions.UrlCanon]]).
    * ONE stateful operator, state = a single Long per distinct key —
    * at 100 TB the state store shards keys across executors; bound a
    * perpetual frontier by recency the same way [[bandHitsWithHorizon]]
    * bounds band buckets.
    */
  def firstClaim(rows: Dataset[(Long, Long)]): Dataset[KeyClaim] = {
    val spark = rows.sparkSession
    import spark.implicits._
    rows
      .groupByKey(_._2)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (key: Long, it: Iterator[(Long, Long)], state: GroupState[Long]) =>
          claimFold(it.map(_._1).toSeq.sorted, state,
            (id, d) => KeyClaim(id, key, d))
      }
  }

  /** Banded row for the horizon gate (a named class, not a tuple: the
    * internally-attached watermark column rides alongside, and tuple
    * deserializers are positional — they reject extra columns — while
    * case-class fields resolve by name).
    */
  final case class Banded(band: Int, bval: String, id: Long, stamp: Long)

  /** [[bandHits]] with a dedup horizon: input rows carry an event-time
    * stamp, and a band bucket whose newest arrival falls a full `horizon`
    * behind the watermark is evicted — the next document hashing into it
    * claims it fresh. State is then bounded by buckets ACTIVE within the
    * horizon, the shape a perpetual gate needs at 100 TB.
    */
  def bandHitsWithHorizon(docs: Dataset[(Long, String, Long)],
      horizon: FiniteDuration, n: Int = 3, k: Int = 8, bandRows: Int = 2,
      stampUnit: String = "millis"): Dataset[BandHit] = {
    val spark = docs.sparkSession
    import spark.implicits._
    require(k % bandRows == 0, s"bandRows $bandRows must divide k $k")
    val div = StateOps.stampDivisor(stampUnit)
    val banded = docs.flatMap { case (id, text, stamp) =>
      val sig = signature(text, n, k)
      // shingle-less docs band nowhere (batch parity — see bandHits)
      if (sig(0) == Long.MaxValue) Seq.empty
      else (0 until k / bandRows).map { b =>
        Banded(b, (0 until bandRows).map(r => sig(b * bandRows + r)).mkString("|"),
          id, stamp)
      }
    }
    StateOps.withStampWatermark(banded, "stamp", stampUnit, horizon.toMillis)
      .groupByKey(r => (r.band, r.bval))
      .flatMapGroupsWithState(OutputMode.Update,
        GroupStateTimeout.EventTimeTimeout) {
        (key: (Int, String), rows: Iterator[Banded],
            state: GroupState[(Long, Long)]) =>  // (first id, lastEventMs)
          if (state.hasTimedOut) {
            // bucket idle a full horizon is evicted (and docs straddling
            // the horizon are dropped by the late-row filter — also
            // within the window contract)
            StateOps.evictOrRearm(state, state.get._2)
            Iterator.empty
          } else {
            val sorted = rows.toSeq.sortBy(r => (r.stamp, r.id))
            var first = state.getOption.map(_._1)
            var lastEventMs = state.getOption.map(_._2).getOrElse(Long.MinValue)
            val out = sorted.map { case Banded(_, _, id, stamp) =>
              lastEventMs = math.max(lastEventMs, stamp / div)
              first match {
                case None =>
                  first = Some(id)
                  BandHit(id, key._1, key._2, None)
                case Some(f) =>
                  BandHit(id, key._1, key._2, if (f == id) None else Some(f))
              }
            }
            first.foreach { f =>
              StateOps.watermarkMs(state).foreach(wm =>
                StateOps.armAfter(state, wm, lastEventMs))
              state.update((f, lastEventMs))
            }
            out.iterator
          }
      }
  }
}
