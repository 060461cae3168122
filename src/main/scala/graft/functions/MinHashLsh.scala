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

  /** 60-bit base hash of a string column. */
  def hash60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  private def affine(h: Column, j: Int): Column =
    (lit(2L * j + 1) * (h % P) + lit(j * 7919L + 13L)) % P

  /** (doc_id, shingle) pairs: distinct n-token shingles per document. */
  def shingles(docs: DataFrame, textCol: String, n: Int): DataFrame = {
    val toks = split(trim(col(textCol)), "\\s+")
    docs
      .select(col("doc_id"), toks.as("toks"))
      .select(col("doc_id"), explode(
        when(size(col("toks")) >= n,
          transform(sequence(lit(0), size(col("toks")) - n),
            i => concat_ws(" ",
              (1 to n).map(o => element_at(col("toks"), i + o)): _*)))
          .otherwise(array().cast("array<string>"))).as("shingle"))
      .distinct()
  }

  /** k-minhash signature per document: doc_id, mh_0 .. mh_{k-1}. */
  def signature(docs: DataFrame, textCol: String, n: Int, k: Int): DataFrame = {
    val sh = shingles(docs, textCol, n)
      .select(col("doc_id"), hash60(col("shingle")).as("h"))
    sh.groupBy(col("doc_id"))
      .agg(min(affine(col("h"), 0)).as("mh_0"),
        (1 until k).map(j => min(affine(col("h"), j)).as(s"mh_$j")): _*)
  }

  /** LSH candidate pairs: documents sharing at least one band of the
    * signature (bands of `rows` consecutive minhashes). Output a_id < b_id.
    */
  def lshCandidates(sig: DataFrame, k: Int, rows: Int): DataFrame = {
    val nBands = k / rows
    val banded = sig.select(col("doc_id"), explode(array(
      (0 until nBands).map { b =>
        struct(lit(b).as("band"),
          concat_ws("|", (0 until rows).map(r => col(s"mh_${b * rows + r}")): _*)
            .as("bval"))
      }: _*)).as("bs"))
      .select(col("doc_id"), col("bs.band"), col("bs.bval"))
    val other = banded.select(col("doc_id").as("b_id"), col("band"), col("bval"))
    banded.join(other, Seq("band", "bval"))
      .filter(col("doc_id") < col("b_id"))
      .select(col("doc_id").as("a_id"), col("b_id"))
      .distinct()
  }

  /** 60-bit SimHash over whitespace tokens (with multiplicity): bit i set
    * iff tokens with bit i set outnumber those without.
    */
  def simhash64(docs: DataFrame, textCol: String): DataFrame = {
    val toks = docs.select(col("doc_id"),
      explode(split(trim(col(textCol)), "\\s+")).as("t"))
      .select(col("doc_id"), hash60(col("t")).as("h"))
    toks
      .select(col("doc_id"), col("h"), explode(sequence(lit(0), lit(59))).as("b"))
      .withColumn("bit", expr("shiftrightunsigned(h, CAST(b AS INT)) % 2"))
      .groupBy(col("doc_id"), col("b"))
      .agg(sum(col("bit") * 2 - 1).as("s"))
      .groupBy(col("doc_id"))
      .agg(sum(when(col("s") > 0, expr("shiftleft(CAST(1 AS BIGINT), CAST(b AS INT))"))
        .otherwise(0L)).as("simhash"))
  }

  /** Near-dup pairs by SimHash Hamming distance <= maxDist. */
  def simhashNearDups(sh: DataFrame, maxDist: Int): DataFrame = {
    val other = sh.select(col("doc_id").as("b_id"), col("simhash").as("b_sh"))
    sh.crossJoin(other)
      .filter(col("doc_id") < col("b_id"))
      .withColumn("dist", bit_count(col("simhash").bitwiseXOR(col("b_sh"))))
      .filter(col("dist") <= maxDist)
      .select(col("doc_id").as("a_id"), col("b_id"), col("dist"))
  }
}
