package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** K-minimum-values distinct-count sketch — DETERMINISTIC cardinality
  * estimation (Bar-Yossef et al. 2002, the classic KMV/bottom-k
  * estimator), unlike HLL++ (`approx_count_distinct`), whose register
  * layout is engine-private and cannot be oracle-checked across engines.
  *
  * The sketch keeps the k smallest DISTINCT 60-bit hashes of the input.
  * "k smallest of a set" is associative, commutative and idempotent, so
  * the result is bit-identical under ANY partitioning/merge order — the
  * property that makes it (a) a hash-checkable oracle query and (b) a
  * mergeable partial aggregate: each partition ships at most k longs
  * through the shuffle, never its distinct values. At 100 TB the shuffle
  * carries `partitions × k × 8` bytes per group; estimate error is the
  * standard ~1/sqrt(k-1).
  *
  * Estimator: with the k-th smallest hash h_k over the hash space [0, M)
  * (M = 2^60), est = floor((k-1)·M / h_k); when fewer than k distinct
  * values exist the sketch IS the exact distinct set. The arithmetic is
  * long→double cast + multiply + divide + floor — each IEEE
  * correctly-rounded, so both engines produce the same integer.
  */
final class KmvSketch(k: Int)
    extends Aggregator[Long, Array[Long], Array[Long]] {
  require(k >= 2, s"KMV needs k >= 2, got $k")

  /** Buffer: sorted ascending distinct hashes, at most k of them. */
  override def zero: Array[Long] = Array.emptyLongArray

  override def reduce(b: Array[Long], h: Long): Array[Long] = insert(b, h)

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var r = a
    var i = 0
    while (i < b.length) { r = insert(r, b(i)); i += 1 }
    r
  }

  override def finish(b: Array[Long]): Array[Long] = b

  private def insert(b: Array[Long], h: Long): Array[Long] = {
    val pos = java.util.Arrays.binarySearch(b, h)
    if (pos >= 0) b // already present: sets, not multisets
    else {
      val ins = -pos - 1
      if (b.length >= k && ins >= k) b // not among the k smallest
      else {
        val n = math.min(b.length + 1, k)
        val out = new Array[Long](n)
        System.arraycopy(b, 0, out, 0, ins)
        out(ins) = h
        if (ins < n - 1) System.arraycopy(b, ins, out, ins + 1, n - ins - 1)
        out
      }
    }
  }

  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder()
}

object Kmv {

  /** The hash space size as an exact double: 2^60 (6 significant bits ×
    * trailing zeros — exactly representable, as is (k-1)·M for small k).
    */
  val M: Double = 1152921504606846976.0

  /** The sketch as a DataFrame aggregate column over a 60-bit hash
    * column ([[MinHashLsh.hash60]] output).
    */
  def sketch(k: Int)(h: Column): Column =
    udaf(new KmvSketch(k), org.apache.spark.sql.Encoders.scalaLong).apply(h)

  /** Estimate columns from a sketch array: (n_mins, kth, est_distinct) —
    * exact count when the sketch is not full, the KMV estimator once it
    * is. Pure column arithmetic, engine-replayable.
    */
  def estimate(mins: Column, k: Int): Seq[Column] = {
    // try_element_at: an under-full sketch (fewer than k distinct values
    // in the group) answers null for kth, not an ANSI index error
    val kth = try_element_at(mins, lit(k))
    Seq(
      size(mins).cast("long").as("n_mins"),
      kth.as("kth"),
      when(size(mins) < k, size(mins).cast("long"))
        .otherwise(floor(lit((k - 1) * M) / kth.cast("double")).cast("long"))
        .as("est_distinct"))
  }
}
