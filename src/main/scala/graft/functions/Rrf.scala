package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Reciprocal-rank fusion of independently-produced ranked lists — the
  * standard way a training-data / retrieval pipeline combines a keyword
  * ranking (BM25) with a vector ranking (ANN cosine) without having to
  * calibrate their incomparable score scales (Cormack et al., SIGIR'09:
  * RRF outperforms learned fusion on TREC runs with the single constant
  * c = 60).
  *
  * score(d) = Σ_lists 1/(c + rank_list(d)) over the lists that contain d.
  *
  * Determinism: the reciprocal is computed in INTEGER units —
  * `ScoreScale div (c + rank)` with BIGINT floor division — so the fused
  * score is a sum of exact integers, engine-replayable bit-for-bit (the
  * established quantized-ratio discipline; double `1/(c+r)` would hinge
  * on the engine's division/rounding path). With ScoreScale = 1e9 two
  * adjacent ranks are always distinguishable (1e9/61 − 1e9/62 ≈ 2.6e5)
  * and a BIGINT sum of any practical number of lists cannot overflow.
  *
  * Scale shape: fusion consumes lists that are ALREADY top-k reduced by
  * their producers (BM25's two-scan top-k, ANN's blocked scan) — each
  * input here is ≤ k rows, so the outer join and the final sort are
  * driver-trivial no matter the corpus size behind the lists. The 100 TB
  * cost lives in the producers, where it belongs.
  */
object Rrf {

  /** The SIGIR'09 constant: small enough that the head of each list
    * dominates, large enough that a single first-place vote does not
    * drown broad mid-list agreement.
    */
  val DefaultC = 60

  /** Integer reciprocal-rank unit (see class scaladoc). */
  val ScoreScale = 1000000000L

  /** Fuse named ranked lists into a top-k. Each input must carry
    * `idCol` and a 1-based BIGINT `rk` column; absence from a list
    * contributes 0. Output: (idCol, <name>_rk ... one per list with 0 =
    * absent, rrf_q) — top `k` by (rrf_q desc, idCol asc).
    */
  def fuse(lists: Seq[(String, DataFrame)], idCol: String, k: Int,
      c: Int = DefaultC): DataFrame = {
    require(lists.nonEmpty, "RRF needs at least one ranked list")
    require(lists.map(_._1).distinct.size == lists.size,
      "RRF list names must be distinct")
    val tagged = lists.map { case (name, df) =>
      df.select(col(idCol), col("rk").cast("long").as(s"${name}_rk"))
    }
    // outer-join fold over ≤k-row frames (broadcast by AQE); COALESCE
    // ranks to 0 = absent so the output schema is null-free
    val joined = tagged.reduce { (a, b) => a.join(b, Seq(idCol), "full_outer") }
    val rkCols = lists.map { case (name, _) =>
      coalesce(col(s"${name}_rk"), lit(0L)).as(s"${name}_rk")
    }
    val score = lists.map { case (name, _) =>
      when(col(s"${name}_rk") > 0,
        expr(s"CAST($ScoreScale AS BIGINT) div " +
          s"(CAST($c AS BIGINT) + ${name}_rk)"))
        .otherwise(lit(0L))
    }.reduce(_ + _)
    joined.select(col(idCol) +: rkCols :+ score.as("rrf_q"): _*)
      .orderBy(col("rrf_q").desc, col(idCol))
      .limit(k)
  }

  /** The DuckDB replay of the fused score for one list's rank column:
    * the identical BIGINT floor division (`//`), 0-rank = absent.
    */
  def scoreSql(rkCol: String, c: Int = DefaultC): String =
    s"CASE WHEN $rkCol > 0 THEN CAST($ScoreScale AS BIGINT) // " +
      s"(CAST($c AS BIGINT) + $rkCol) ELSE CAST(0 AS BIGINT) END"
}
