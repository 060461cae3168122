package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Boundary-respecting document chunking — the embedding/RAG
  * context-window prep pass: split a document into ~`budget`-character
  * windows that never cut a token. `chunk_id =
  * floor(chars-before-this-token / budget)`: monotone per document,
  * tokens stay whole, an over-long token simply owns its chunk.
  *
  * 100 TB shape: the prefix sums are computed IN-ROW (token counts per
  * document are tens to thousands; the O(t²) `aggregate`-fold is
  * negligible against a scan), so NO per-token shuffle exists — the only
  * exchange carries per-(doc, chunk) summary rows, pre-collapsed by
  * map-side partial aggregation. Contrast the window-function
  * formulation, which shuffles every token by doc_id before the cumsum.
  */
object Chunk {

  /** Per-(idCol, chunk_id) summary: `n_tokens`, `n_chars`. */
  def byCharBudget(docs: DataFrame, idCol: String, textCol: String,
      budget: Int): DataFrame = {
    require(budget > 0, s"chunk budget must be positive, got $budget")
    docs
      .select(col(idCol), expr(
        s"""transform(split(trim(`$textCol`), '\\\\s+'), x -> length(x))""")
        .as("lens"))
      .select(col(idCol), explode(expr(
        s"""transform(sequence(1, size(lens)), i -> struct(
           |  CAST(aggregate(slice(lens, 1, i - 1), 0, (a, x) -> a + x)
           |       div $budget AS BIGINT) AS chunk_id,
           |  CAST(element_at(lens, i) AS BIGINT) AS n))""".stripMargin))
        .as("c"))
      .groupBy(col(idCol), col("c.chunk_id").as("chunk_id"))
      .agg(count(lit(1)).as("n_tokens"), sum(col("c.n")).as("n_chars"))
  }
}
