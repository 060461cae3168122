package graft.queries

import org.apache.spark.sql.functions._

import graft.multimodal.Multimodal

/** Multimodal column plumbing over driver data (documents' text bytes as
  * opaque payloads). The decode stage is a deterministic STUB
  * ([[Multimodal.StubCodec]] — no media libs in this container), which is
  * exactly what lets the DuckDB oracle replay it: metadata is pure byte
  * arithmetic, so schema/partitioning/batch plumbing get full hash-match
  * coverage.
  */
object MultimodalQueries extends QuerySet {

  val queries: Map[String, QFn] = Map(
    // decode: binary payload -> typed metadata (batch-iterator stage)
    "q_multimodal_meta" -> ((s, d) => {
      Multimodal.decodeMeta(Multimodal.mediaFromDocuments(s, d))
        .toDF("media_id", "kind", "bytes", "width", "height", "duration_ms",
          "channels")
    }),

    // frame sampling: video payloads -> every 3rd 64-byte pseudo-frame
    "q_multimodal_frames" -> ((s, d) => {
      Multimodal.sampleFrames(Multimodal.mediaFromDocuments(s, d), 64, 3)
        .groupBy(col("mediaId").as("media_id"))
        .agg(count(lit(1)).as("n_frames"),
          sum(length(col("frame")).cast("long")).as("frame_bytes"))
        .select(col("media_id"), col("n_frames"), col("frame_bytes"))
    }),

    // resize honors the byte budget
    "q_multimodal_resize" -> ((s, d) => {
      Multimodal.resize(Multimodal.mediaFromDocuments(s, d), 128)
        .select(col("media_id"), length(col("payload")).cast("long")
          .as("bytes"))
    })
  )

  private val kindSql =
    "(['image', 'audio', 'video'])[CAST(doc_id % 3 AS INT) + 1]"

  val oracles: Map[String, String] = Map(
    "q_multimodal_meta" ->
      s"""WITH m AS (
         |  SELECT doc_id AS media_id, $kindSql AS kind,
         |         octet_length(encode(text)) AS n
         |  FROM documents
         |)
         |SELECT media_id, kind, CAST(n AS BIGINT) AS bytes,
         |  CAST(CASE kind WHEN 'image' THEN (n % 1024) + 1
         |                 WHEN 'audio' THEN 0
         |                 ELSE (n % 1920) + 1 END AS INT) AS width,
         |  CAST(CASE kind WHEN 'image' THEN (n * 7 % 768) + 1
         |                 WHEN 'audio' THEN 0
         |                 ELSE (n * 3 % 1080) + 1 END AS INT) AS height,
         |  CAST(CASE kind WHEN 'image' THEN 0
         |                 WHEN 'audio' THEN n * 8
         |                 ELSE n * 40 END AS BIGINT) AS duration_ms,
         |  CAST(CASE kind WHEN 'audio' THEN 2 ELSE 3 END AS INT) AS channels
         |FROM m""".stripMargin,

    // frames: ceil(n/64) frames, every 3rd kept; kept byte total =
    // sum of sampled frame lengths (last frame may be short)
    "q_multimodal_frames" ->
      s"""WITH m AS (
         |  SELECT doc_id AS media_id, octet_length(encode(text)) AS n
         |  FROM documents WHERE $kindSql = 'video'
         |), f AS (
         |  SELECT media_id, i.i AS idx,
         |         least(64, n - i.i * 64) AS flen
         |  FROM m, LATERAL (SELECT unnest(range(CAST(ceil(n / 64.0) AS BIGINT))) AS i) i
         |  WHERE i.i % 3 = 0
         |)
         |SELECT media_id, count(*) AS n_frames,
         |       CAST(sum(flen) AS BIGINT) AS frame_bytes
         |FROM f GROUP BY media_id""".stripMargin,

    "q_multimodal_resize" ->
      """SELECT doc_id AS media_id,
        |CAST(least(octet_length(encode(text)), 128) AS BIGINT) AS bytes
        |FROM documents""".stripMargin
  )
}
