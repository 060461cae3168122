package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Symmetric per-vector int8 quantization of an embedding column — the
  * standard 4× memory compression applied before an ANN index is built
  * or vectors are shipped to a serving tier (each component mapped to
  * round(v · 127 / max|v|), the scale kept per vector for dequantize).
  *
  * Determinism: every arithmetic step is an individually correctly
  * rounded IEEE-754 double op — FLOAT→DOUBLE cast (exact), abs/max
  * (order-free), one multiply and one divide (no fusable mul+add, so
  * FMA contraction cannot apply), floor(x + 0.5) — so every engine
  * produces the identical integer. Same discipline as [[Pca.gramQ]],
  * which closed the r7–r9 cross-engine saga: integers at the output
  * boundary, never raw doubles.
  *
  * Scale shape: pure map — one projection per row, no shuffle, no
  * state; the 100 TB cost is the scan itself. A zero vector (max|v| =
  * 0) quantizes to all zeros with scale 0 rather than dividing by zero.
  */
object EmbedQuant {

  /** Scale in integer micros: floor(max|v|·1e6 + 0.5). */
  val ScaleMicros = 1000000.0

  /** Per-vector quantization: (idCol, scale_micro, q) with q the int8
    * component array (as an int array — Spark's TINYINT would survive,
    * but BIGINT elements keep the parquet/DuckDB comparison trivial).
    */
  def quantize(df: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val maxAbs = expr(
      s"""aggregate(`$vecCol`, CAST(0.0 AS DOUBLE),
         |  (a, x) -> greatest(a, abs(CAST(x AS DOUBLE))))""".stripMargin)
    df.select(col(idCol).cast("long").as(idCol),
        maxAbs.as("__m"),
        col(vecCol).as("__v"))
      .select(col(idCol),
        floor(col("__m") * lit(ScaleMicros) + lit(0.5)).cast("long")
          .as("scale_micro"),
        expr(
          """transform(__v, x -> CASE WHEN __m = 0.0D THEN CAST(0 AS BIGINT)
            |  ELSE CAST(floor(CAST(x AS DOUBLE) * 127.0D / __m + 0.5D)
            |    AS BIGINT) END)""".stripMargin).as("q"))
  }

  /** Component-row dump of [[quantize]] for a bounded id prefix — the
    * oracle-friendly long form (vec_id, i, q_i, scale_micro).
    */
  def quantizeRows(df: DataFrame, idCol: String, vecCol: String,
      maxId: Long): DataFrame =
    quantize(df.filter(col(idCol) < maxId), idCol, vecCol)
      .select(col(idCol), col("scale_micro"), posexplode(col("q")))
      .select(col(idCol), (col("pos") + 1).cast("long").as("i"),
        col("col").as("q"), col("scale_micro"))

  /** DuckDB replay of [[quantizeRows]] — identical op-for-op double
    * chain, identical integer boundary.
    */
  def oracleSql(maxId: Long, table: String = "embeddings",
      idCol: String = "vec_id", vecCol: String = "embedding"): String =
    s"""WITH e AS (
       |  SELECT $idCol, $vecCol AS v,
       |         list_max(list_transform($vecCol,
       |           x -> abs(CAST(x AS DOUBLE)))) AS m
       |  FROM $table WHERE $idCol < $maxId
       |)
       |SELECT CAST($idCol AS BIGINT) AS $idCol, CAST(u.i AS BIGINT) AS i,
       |       CASE WHEN m = 0.0 THEN CAST(0 AS BIGINT)
       |            ELSE CAST(floor(CAST(v[CAST(u.i AS INT)] AS DOUBLE)
       |              * 127.0 / m + 0.5) AS BIGINT) END AS q,
       |       CAST(floor(m * ${ScaleMicros} + 0.5) AS BIGINT) AS scale_micro
       |FROM e, unnest(generate_series(1, len(v))) u(i)""".stripMargin
}
