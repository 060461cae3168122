package graft.functions

import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Deterministic fixed-size per-stratum uniform sample — "take exactly n
  * documents per language", the per-stratum counterpart of the RATE-based
  * [[Curation.hashSample]]. Classic reservoir sampling is order-dependent
  * (the sample changes with partitioning); here the reservoir is defined
  * as the n rows with the SMALLEST salted 60-bit hash of the row id,
  * which is distributionally identical (any id-independent hash induces a
  * uniform random order) and a pure function of the data — any
  * partitioning, any arrival order, any cluster size produces the same
  * sample, which is what makes it both replayable as a DuckDB oracle and
  * stable across pipeline re-runs.
  *
  * Scale shape: a WINDOW row_number() over (partition by key order by
  * hash) — the naive spelling — shuffles the ENTIRE corpus into
  * #strata partitions (5 languages ⇒ 5 tasks own 100 TB between them).
  * This instead runs as a typed [[Aggregator]] whose buffer is a bounded
  * size-n candidate list: the map side reduces each partition to ≤ n
  * candidates per key BEFORE the exchange, so the shuffle carries at most
  * partitions × keys × n 16-byte entries and the per-key merge touches
  * ≤ partitions × n rows regardless of corpus size or stratum skew.
  */
object Reservoir {

  /** (hash, id) candidate — ordered by (h, id) so equal-hash rows (or a
    * truncated-hash collision) still break ties deterministically.
    */
  final case class Cand(h: Long, id: Long)

  private val candOrd: Ordering[Cand] = Ordering.by(c => (c.h, c.id))

  /** Bounded top-n-smallest accumulator: the buffer is a sorted Vector
    * capped at n (insertion keeps order; n is sampling-sized — tens to
    * thousands — so O(n) insert beats heap constant-factor churn at this
    * size and keeps the buffer trivially encodable).
    */
  final class Agg(n: Int) extends Aggregator[Cand, Seq[Cand], Seq[Cand]] {
    require(n >= 1, s"reservoir size must be >= 1, got $n")

    def zero: Seq[Cand] = Vector.empty

    def reduce(buf: Seq[Cand], c: Cand): Seq[Cand] =
      if (buf.size >= n && candOrd.gteq(c, buf.last)) buf
      else {
        val i = buf.indexWhere(b => candOrd.lt(c, b))
        val at = if (i < 0) buf.size else i
        val ins = (buf.take(at) :+ c) ++ buf.drop(at)
        if (ins.size > n) ins.dropRight(1) else ins
      }

    def merge(x: Seq[Cand], y: Seq[Cand]): Seq[Cand] =
      y.foldLeft(x)(reduce)

    def finish(buf: Seq[Cand]): Seq[Cand] = buf

    def bufferEncoder: Encoder[Seq[Cand]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Cand]]()
    def outputEncoder: Encoder[Seq[Cand]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Cand]]()
  }

  /** Sample exactly min(n, |stratum|) rows per `keyCol` stratum,
    * selection salted by `salt`. Output: (keyCol, pos, idCol) with pos =
    * 1..n the within-stratum sample order (ascending hash — itself a
    * uniform shuffle of the sample, directly usable as a training
    * mini-order).
    */
  def sampleByKey(df: DataFrame, keyCol: String, idCol: String, n: Int,
      salt: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val agg = new Agg(n)
    df.select(col(keyCol).cast("string").as("k"),
        MinHashLsh.hash60(concat(lit(salt + ":"), col(idCol).cast("string")))
          .as("h"),
        col(idCol).cast("long").as("id"))
      .as[(String, Long, Long)]
      .map { case (k, h, id) => (k, Cand(h, id)) }
      .groupByKey(_._1)
      .mapValues(_._2)
      .agg(agg.toColumn.name("sample"))
      .flatMap { case (k, cands) =>
        cands.iterator.zipWithIndex.map { case (c, i) =>
          (k, (i + 1).toLong, c.id)
        }
      }
      .toDF(keyCol, "pos", idCol)
  }

  /** DuckDB replay of [[sampleByKey]] over `documents`-shaped input: the
    * window spelling IS correct at oracle scale (the whole point of the
    * Aggregator is that the window spelling stops being viable at 100 TB,
    * not that it computes something different).
    */
  def oracleSql(keyCol: String, idCol: String, n: Int, salt: String,
      table: String = "documents"): String =
    s"""SELECT $keyCol, pos, $idCol FROM (
       |  SELECT $keyCol, $idCol,
       |         CAST(row_number() OVER (PARTITION BY $keyCol
       |           ORDER BY ('0x' || substr(md5('$salt:' || $idCol), 1, 15))::UBIGINT,
       |                    $idCol) AS BIGINT) AS pos
       |  FROM $table)
       |WHERE pos <= $n""".stripMargin
}
