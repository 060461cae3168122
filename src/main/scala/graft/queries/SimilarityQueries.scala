package graft.queries

import org.apache.spark.sql.functions._

import graft.functions.Similarity
import graft.sources.Tables

/** Similarity search over the `embeddings` table (LLM-pipeline extension):
  * brute-force cosine top-k as the exact baseline, threshold near-dup pairs,
  * and n-gram Jaccard near-dup over `documents`.
  *
  * Scale design: pairwise scoring runs in [[graft.functions.Similarity]] —
  * broadcast one side as primitive float arrays, `mapPartitions` the other,
  * double-precision loop with zero per-pair allocation; the LSH-bucketed
  * variant replaces the broadcast scan with a bucket join for 100 TB
  * corpora.
  *
  * Float determinism: scores are compared via ORDERING only (ids + rank in
  * the output, never raw doubles) — Spark and DuckDB sum in different
  * orders, so last-bit score equality cannot be promised, but a rank flip
  * would need two cosines within ~1e-9 of each other.
  */
object SimilarityQueries extends QuerySet {

  val queries: Map[String, QFn] = Map(
    // brute-force cosine top-k (exact ANN baseline; broadcast-query kernel
    // in graft.functions.Similarity)
    "q_ann_topk" -> ((s, d) => {
      Similarity.bruteForceTopK(Tables.embeddings(s, d), col("vec_id") < 10, 5)
        .select(col("q_id"), col("rk"), col("neighbor_id"))
    }),

    // embedding-cosine near-duplicate pairs above a threshold
    // (broadcast-blocked self-scan, no cross-join shuffle)
    "q_near_dup_cosine" -> ((s, d) => {
      Similarity.nearDupPairs(Tables.embeddings(s, d), 0.5)
        .select(col("a_id"), col("b_id"))
    }),

    // LSH-bucketed variant (scale path; no SQL oracle -> rows-only check)
    "q_ann_lsh_pairs" -> ((s, d) => {
      Similarity.lshBucketPairs(Tables.embeddings(s, d), nPlanes = 4,
        threshold = 0.3)
        .select(col("a_id"), col("b_id"))
    }),

    // n-gram (3-token shingle) Jaccard near-dup over documents: distinct
    // shingles -> inverted-index self-join -> |A∩B| / (|A|+|B|-|A∩B|).
    // 3-token shingles are rare enough that the inverted index join stays
    // skew-free (single-token joins explode on stopwords at scale).
    "q_jaccard_pairs" -> ((s, d) => {
      import s.implicits._
      // shingle strings are hashed to 8-byte keys before the distinct
      // (collision p ~ 1e-8 at this cardinality is the only divergence
      // risk); the inverted index is a bucket-collect + in-bucket pair
      // emission — one shuffle instead of a self-join that would rescan
      // the shingle pipeline for each side
      val docs = graft.functions.MinHashLsh
        .shingles(Tables.documents(s, d), "text", 3, dedupe = false)
        .select(col("doc_id"), xxhash64(col("shingle")).as("sh"))
        .distinct()
      val sizes = docs.groupBy(col("doc_id")).agg(count(lit(1)).as("sz"))
      val inter = docs
        .groupBy(col("sh")).agg(collect_list(col("doc_id")).as("ids"))
        .select(col("ids")).as[Seq[Long]]
        .flatMap { ids =>
          val sorted = ids.sorted
          for {
            i <- sorted.indices.iterator
            j <- (i + 1) until sorted.size
          } yield (sorted(i), sorted(j))
        }
        .toDF("doc_id", "b_id")
        .groupBy(col("doc_id"), col("b_id"))
        .agg(count(lit(1)).as("inter"))
      inter
        .join(sizes, "doc_id")
        .join(sizes.select(col("doc_id").as("b_id"), col("sz").as("b_sz")), "b_id")
        .filter(col("inter") * 10 >= (col("sz") + col("b_sz") - col("inter")) * 5)
        .select(col("doc_id").as("a_id"), col("b_id"), col("inter"),
          (col("sz") + col("b_sz") - col("inter")).as("uni"))
    })
  )

  // DuckDB lacks a deterministic double-sequential list_sum, so oracles
  // recompute cosine via list_zip/list_transform in double; outputs compare
  // ids/ranks only (see scaladoc).
  private val cosExpr =
    """list_sum(list_transform(list_zip(a.embedding, b.embedding),
      |  x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))
      |/ (sqrt(list_sum(list_transform(a.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
      |   * sqrt(list_sum(list_transform(b.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))))"""
      .stripMargin

  val oracles: Map[String, String] = Map(
    "q_ann_topk" ->
      s"""WITH scored AS (
         |  SELECT b.vec_id AS q_id, a.vec_id AS neighbor_id, $cosExpr AS cos
         |  FROM embeddings a CROSS JOIN embeddings b
         |  WHERE b.vec_id < 10 AND a.vec_id <> b.vec_id
         |)
         |SELECT q_id, rk, neighbor_id FROM (
         |  SELECT q_id, neighbor_id,
         |         row_number() OVER (PARTITION BY q_id
         |           ORDER BY cos DESC, neighbor_id) AS rk
         |  FROM scored) WHERE rk <= 5""".stripMargin,

    "q_near_dup_cosine" ->
      s"""SELECT a.vec_id AS a_id, b.vec_id AS b_id
         |FROM embeddings a CROSS JOIN embeddings b
         |WHERE a.vec_id < b.vec_id AND $cosExpr >= 0.5""".stripMargin,

    "q_jaccard_pairs" ->
      """WITH sh AS (
        |  SELECT DISTINCT doc_id,
        |    t.toks[t.i] || ' ' || t.toks[t.i + 1] || ' ' || t.toks[t.i + 2] AS shingle
        |  FROM (
        |    SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks,
        |           unnest(range(1, len(regexp_split_to_array(trim(text), '\s+')) - 1)) AS i
        |    FROM documents) t
        |), sz AS (
        |  SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id
        |), inter AS (
        |  SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS inter
        |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2
        |)
        |SELECT i.a_id, i.b_id, i.inter, (sa.sz + sb.sz - i.inter) AS uni
        |FROM inter i
        |JOIN sz sa ON i.a_id = sa.doc_id
        |JOIN sz sb ON i.b_id = sb.doc_id
        |WHERE i.inter * 10 >= (sa.sz + sb.sz - i.inter) * 5""".stripMargin
  )
}
