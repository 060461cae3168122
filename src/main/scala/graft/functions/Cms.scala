package graft.functions

import org.apache.spark.sql.{Column, DataFrame, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Count-Min sketch (Cormode & Muthukrishnan 2005) heavy-hitter
  * detection — the classic two-pass pattern for "which tokens occur more
  * than θ of the time" over a corpus whose distinct-token table is too
  * big to aggregate exactly:
  *
  *  1. one scan folds every token occurrence into a d×w counter grid
  *     (a mergeable [[CmsSketch]] aggregate: each partition ships d·w
  *     longs through the shuffle — 32 KB at the defaults — never its
  *     token table);
  *  2. the finished grid rides the task binary as an array literal (the
  *     λ/Bloom/PQ artifact pattern) and a second scan keeps only tokens
  *     whose sketch estimate `min_j grid[j][h_j(t)]` reaches the
  *     threshold — CMS never underestimates, so NO true heavy hitter is
  *     dropped — and exactly recounts just those survivors. The exact
  *     `groupBy` therefore shuffles candidate occurrences only, not the
  *     (huge) tail.
  *
  * Determinism: row hashes are the salted 60-bit md5
  * ([[MinHashLsh.hash60]], salt `cms<j>:`) mod w, the grid is an integer
  * sum (associative/commutative — bit-identical under any partitioning),
  * and the total token count is the sketch's own row-0 sum, so the
  * DuckDB oracle replays grid, estimates and recount exactly.
  */
final class CmsSketch(d: Int, w: Int)
    extends Aggregator[Seq[Long], Array[Long], Array[Long]] {
  require(d >= 1 && w >= 2, s"CMS needs d >= 1, w >= 2, got d=$d w=$w")

  /** Buffer: row-major d×w counter grid. */
  override def zero: Array[Long] = new Array[Long](d * w)

  /** Input: the token's d bucket positions (row j's position at index j),
    * pre-hashed by column expressions so the hash is the spec-pinned
    * [[Hash60Expr]], not a private JVM-side variant.
    */
  override def reduce(b: Array[Long], pos: Seq[Long]): Array[Long] = {
    var j = 0
    while (j < d) { b(j * w + pos(j).toInt) += 1L; j += 1 }
    b
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  override def finish(b: Array[Long]): Array[Long] = b

  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder()
}

object Cms {

  val DefaultDepth = 4
  val DefaultWidth = 1024

  /** Row-j bucket position of a token: hash60("cms<j>:" ++ token) mod w. */
  def position(token: Column, j: Int, w: Int): Column =
    pmod(MinHashLsh.hash60(concat(lit(s"cms$j:"), token)), lit(w.toLong))

  /** Build the d×w grid over a token column: one aggregate, d·w longs per
    * partition through the shuffle.
    */
  def buildGrid(tokens: DataFrame, tokenCol: String,
      d: Int = DefaultDepth, w: Int = DefaultWidth): Array[Long] = {
    val positions = array((0 until d).map(j =>
      position(col(tokenCol), j, w)): _*)
    tokens
      .select(positions.as("pos"))
      .agg(udaf(new CmsSketch(d, w),
          ExpressionEncoder[Seq[Long]]()).apply(col("pos")).as("grid"))
      .head().getSeq[Long](0).toArray
  }

  /** Sketch estimate for a token, from the grid literal: the minimum of
    * its d row counters. Map-only, codegen'd.
    */
  def estimate(token: Column, grid: Array[Long],
      d: Int = DefaultDepth, w: Int = DefaultWidth): Column =
    least((0 until d).map(j =>
      element_at(typedLit(grid.toSeq),
        (lit(j * w) + position(token, j, w) + 1).cast("int"))): _*)

  /** Heavy hitters with exact recount: values of `tokens(tokenCol)`
    * (one row per occurrence — unigrams, shingles, URLs, whatever the
    * caller explodes) whose sketch estimate reaches
    * `total_occurrences / denom`, with their exact counts. Output:
    * (token, est, cnt, is_heavy) — `is_heavy` marks true heavy hitters;
    * rows with `is_heavy = false` are the sketch's false positives,
    * kept so the collision arithmetic itself is oracle-checked.
    */
  def heavyHitters(tokenStream: DataFrame, tokenCol: String,
      denom: Long = 800L,
      d: Int = DefaultDepth, w: Int = DefaultWidth): DataFrame = {
    val tokens = tokenStream.select(col(tokenCol).as("token"))
    val grid = buildGrid(tokens, "token", d, w)
    // the grid knows the corpus size: every occurrence lands once per
    // row, so row 0 sums to the total token count — no extra pass
    val total = grid.iterator.take(w).sum
    // floored total/denom truncates to 0 when the corpus has fewer than
    // `denom` occurrences — est >= 0 then keeps EVERY distinct token and
    // marks it heavy, degrading the recount to a full distinct aggregate.
    // Floor at 1: a heavy hitter must occur at least once.
    val threshold = math.max(1L, total / denom)
    tokens
      .withColumn("est", estimate(col("token"), grid, d, w))
      .filter(col("est") >= threshold)
      .groupBy(col("token"), col("est"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("token"), col("est"), col("cnt"),
        (col("cnt") >= threshold).as("is_heavy"))
  }
}
