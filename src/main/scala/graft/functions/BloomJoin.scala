package graft.functions

import java.io.ByteArrayOutputStream

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Explicit Bloom-prefiltered equi-join: build a Bloom filter over the
  * small (build) side's join keys, ship it to the probe side as a literal,
  * and drop non-matching probe rows MAP-SIDE — before they are shuffled
  * for the exact join. With a selective build side this is the difference
  * between shuffling 100 TB and shuffling the ~1% that can match; the
  * Bloom filter has no false negatives, so the exact join downstream
  * makes the composite result identical to the plain join (false
  * positives just ride the shuffle and fall out of the hash probe).
  *
  * Relationship to Spark's own `InjectRuntimeFilter` rule: Spark can
  * inject the same shape automatically, but only under conservative size
  * heuristics it controls, only within one query, and never through
  * non-join consumers. This operator makes the artifact EXPLICIT — a
  * serialized `org.apache.spark.util.sketch.BloomFilter` the caller can
  * persist and reuse across queries/jobs (the PQ-codebook pattern), e.g.
  * prefiltering every nightly delta scan by the live-key set of a
  * compacted snapshot family.
  *
  * Probe cost stays inside whole-stage codegen: the probe is the native
  * `BloomFilterMightContain` expression ([[MightContain]]) over
  * `xxhash64(key)` — no UDF, the broadcast bits deserialize once per
  * codegen instance.
  */
object BloomJoin {

  /** Serialized Bloom filter over `xxhash64(keyCol)` of `build` —
    * `expectedItems < 0` sizes it from a count of the build side (one
    * cheap aggregate on what is by assumption the small side).
    */
  def keyFilter(build: DataFrame, keyCol: String,
      expectedItems: Long = -1L, fpp: Double = 0.01): Array[Byte] = {
    val n = if (expectedItems >= 0) expectedItems else build.count()
    val bf = build.select(xxhash64(col(keyCol)).as("__h"))
      .stat.bloomFilter("__h", math.max(n, 1L), fpp)
    val bos = new ByteArrayOutputStream()
    bf.writeTo(bos)
    bos.toByteArray
  }

  /** Probe-side predicate for a previously built [[keyFilter]]. */
  def mightMatch(filter: Array[Byte], keyCol: Column): Column =
    MightContain.column(filter, xxhash64(keyCol))

  /** `probe` reduced to rows whose `probeKey` can possibly join `build`'s
    * `buildKey` — the map-side prefilter, composable with any downstream
    * join/aggregate. Exact-join composition law (BloomJoinSpec):
    * `prefilter(p, k, b, bk).join(b, ...)` == `p.join(b, ...)`.
    */
  def prefilter(probe: DataFrame, probeKey: String,
      build: DataFrame, buildKey: String, fpp: Double = 0.01): DataFrame =
    probe.filter(mightMatch(keyFilter(build, buildKey, fpp = fpp),
      probe(probeKey)))

  /** Inner equi-join with the Bloom prefilter applied to the probe side.
    * The join itself is left to Catalyst (broadcast if the build side is
    * small enough — then the prefilter is belt-and-braces — shuffle
    * otherwise, which is the case the prefilter exists for).
    */
  def join(probe: DataFrame, probeKey: String,
      build: DataFrame, buildKey: String, fpp: Double = 0.01): DataFrame = {
    val p = prefilter(probe, probeKey, build, buildKey, fpp)
    p.join(build, p(probeKey) === build(buildKey))
  }
}
