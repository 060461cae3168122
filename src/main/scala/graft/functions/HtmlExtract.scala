package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** HTML → text extraction — the first transform a crawl pipeline applies
  * to raw pages (the trafilatura/jusText role, reduced to the
  * deterministic core): script/style subtrees dropped WITH their
  * content, remaining tags stripped to spaces, basic entities decoded,
  * whitespace collapsed.
  *
  * Order matters and is part of the contract:
  *   1. `<script>…</script>` / `<style>…</style>` blocks go first (their
  *      CONTENT is not text — a generic tag strip would leak it),
  *   2. generic tags `<[^>]*>` become spaces (so `a<br>b` stays two
  *      words),
  *   3. entities decode AFTER the strip — an entity-ENCODED tag
  *      (`&lt;p&gt;`) is author-visible text and must survive as `<p>`,
  *   4. whitespace collapses, ends trim.
  *
  * Pure per-row regexp_replace chain in the Java-regex/RE2-common
  * subset (inline `(?s)` flag, non-greedy `.*?`, no backreferences) —
  * map-only at any scale, engine-replayable.
  */
object HtmlExtract {

  // two SEPARATE per-element passes, each case-insensitive: a combined
  // </(script|style)> alternation would let an embedded '</style>'
  // terminate a <script> block and leak the rest of the script body,
  // and HTML tag names are case-insensitive (an uppercase <SCRIPT>
  // must drop its content too)
  private val BlockRes = Seq(
    "(?is)<script[^>]*>.*?</script>",
    "(?is)<style[^>]*>.*?</style>")
  private val TagRe = "<[^>]*>"

  /** The extracted plain text of an HTML column. */
  def extract(html: Column): Column = {
    val noBlocks = BlockRes.foldLeft(html)((c, re) => regexp_replace(c, re, " "))
    val noTags = regexp_replace(noBlocks, TagRe, " ")
    val decoded = Seq(
      "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "'", "&nbsp;" -> " ",
      // &amp; LAST: decoding it first would conjure new entities out of
      // double-encoded text (&amp;lt; must yield &lt;, not <)
      "&amp;" -> "&"
    ).foldLeft(noTags) { case (c, (ent, ch)) =>
      replace(c, lit(ent), lit(ch))
    }
    trim(regexp_replace(decoded, "\\s+", " "))
  }

  /** DuckDB replay of [[extract]] — same patterns, same order; DuckDB
    * regexp_replace needs the explicit 'g' option where Spark is global
    * by default.
    */
  def extractSql(htmlExpr: String): String = {
    val noBlocks = BlockRes.foldLeft(htmlExpr)((e, re) =>
      s"regexp_replace($e, '$re', ' ', 'g')")
    val noTags = s"regexp_replace($noBlocks, '$TagRe', ' ', 'g')"
    val decoded = Seq(
      "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "''", "&nbsp;" -> " ",
      "&amp;" -> "&"
    ).foldLeft(noTags) { case (c, (ent, ch)) =>
      s"replace($c, '$ent', '$ch')"
    }
    s"trim(regexp_replace($decoded, '\\s+', ' ', 'g'))"
  }
}
