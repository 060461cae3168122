package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL canonicalization + canonical-URL dedup — step one of every crawl
  * pipeline: the same page arrives as `HTTP://Site.com:80/a?b=2&a=1#x`
  * and `http://site.com/a?a=1&b=2&utm_source=feed`, and must collapse
  * before any content-level dedup runs.
  *
  * Rules (the conservative, semantics-preserving subset of RFC 3986
  * normalization + the universal tracking-param strip):
  *   - scheme and host lowercase (path stays case-sensitive),
  *   - default port dropped (http:80 / https:443), explicit ports kept,
  *   - fragment dropped,
  *   - `utm_*` query params dropped, the rest BYTE-SORTED and rejoined
  *     (param order is almost never semantic; sorting makes equal
  *     param-sets collide),
  *   - empty path becomes "/".
  *
  * Everything is in-row `regexp_extract` / `split` / `array_sort` over
  * the Java-regex/RE2-common pattern subset (the [[Curation.redactPii]]
  * discipline), so the canonical form is engine-replayable and the only
  * exchange in [[dedup]] is the one legitimate dedup shuffle, keyed by
  * the canonical string.
  */
object UrlCanon {

  private val SchemeRe = "^([A-Za-z][A-Za-z0-9+.-]*)://"
  private val HostRe = "^[A-Za-z][A-Za-z0-9+.-]*://([^/:?#]+)"
  private val PortRe = "^[A-Za-z][A-Za-z0-9+.-]*://[^/:?#]+:([0-9]+)"
  private val PathRe = "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)"
  private val QueryRe = "\\?([^#]*)"

  /** The canonical form of a URL column (in-row, codegen-friendly). */
  def canonicalize(url: Column): Column = {
    val scheme = lower(regexp_extract(url, SchemeRe, 1))
    val host = lower(regexp_extract(url, HostRe, 1))
    val port = regexp_extract(url, PortRe, 1)
    val path = regexp_extract(url, PathRe, 1)
    val query = regexp_extract(url, QueryRe, 1)
    val keptQ = array_join(array_sort(filter(split(query, "&"),
      p => !p.startsWith("utm_") && p =!= lit(""))), "&")
    val portPart = when(port === "" ||
        (scheme === "http" && port === "80") ||
        (scheme === "https" && port === "443"), lit(""))
      .otherwise(concat(lit(":"), port))
    val pathPart = when(path === "", lit("/")).otherwise(path)
    val queryPart = when(keptQ === "", lit(""))
      .otherwise(concat(lit("?"), keptQ))
    concat(scheme, lit("://"), host, portPart, pathPart, queryPart)
  }

  /** Canonical-URL dedup: (idCol, canon, dup_of) with dup_of the
    * smallest id sharing the canonical form (equal to the id itself for
    * the representative). One partial-aggregable min per canonical key +
    * the join back (AQE-planned).
    */
  def dedup(df: DataFrame, idCol: String, urlCol: String): DataFrame = {
    val canon = df.select(col(idCol), canonicalize(col(urlCol)).as("canon"))
    val first = canon.groupBy(col("canon"))
      .agg(min(col(idCol)).as("dup_of"))
    canon.join(first, "canon")
      .select(col(idCol), col("canon"), col("dup_of"))
  }

  /** DuckDB replay of [[canonicalize]] over the SQL expression `urlExpr`
    * — the same regexes (RE2/Java common subset), the same byte sort.
    */
  def canonSql(urlExpr: String): String = {
    // single-quoted SQL literals of the shared patterns: DuckDB standard
    // strings keep backslashes literal, so the pattern text passes
    // through verbatim (only quotes double)
    def q(re: String) = "'" + re.replace("'", "''") + "'"
    // coalesce: DuckDB regexp_extract yields NULL on no match where
    // Spark yields '' — without it a query-less URL nulls the concat
    val scheme =
      s"lower(coalesce(regexp_extract($urlExpr, ${q(SchemeRe)}, 1), ''))"
    val host =
      s"lower(coalesce(regexp_extract($urlExpr, ${q(HostRe)}, 1), ''))"
    val port = s"coalesce(regexp_extract($urlExpr, ${q(PortRe)}, 1), '')"
    val path = s"coalesce(regexp_extract($urlExpr, ${q(PathRe)}, 1), '')"
    val query = s"coalesce(regexp_extract($urlExpr, ${q(QueryRe)}, 1), '')"
    // outer coalesce: array_to_string over the EMPTY filtered list is
    // NULL in DuckDB, '' in Spark's array_join
    val keptQ = s"coalesce(array_to_string(list_sort(list_filter(" +
      s"string_split($query, '&'), " +
      s"p -> NOT starts_with(p, 'utm_') AND p <> '')), '&'), '')"
    // ONE line: callers interpolate this into stripMargin templates,
    // where a continuation line starting with "||" would lose its first
    // pipe to the margin strip
    s"$scheme || '://' || $host" +
      s" || CASE WHEN $port = '' OR ($scheme = 'http' AND $port = '80')" +
      s" OR ($scheme = 'https' AND $port = '443') THEN ''" +
      s" ELSE ':' || $port END" +
      s" || CASE WHEN $path = '' THEN '/' ELSE $path END" +
      s" || CASE WHEN $keptQ = '' THEN '' ELSE '?' || $keptQ END"
  }
}
