package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each entry in [[queries]] exercises one operator from SURVEY.md §2
  * (grouped by area in [[graft.queries]]); [[oracleSql]] carries the
  * equivalent DuckDB SQL with IDENTICAL output column names.
  */
object SparkEntry {

  private val querySets: Seq[QuerySet] = Seq(
    RelationalQueries,
    WindowQueries,
    AccessQueries,
    StatefulQueries,
    TextQueries,
    SimilarityQueries,
    DedupQueries,
    RankingQueries,
    CurationQueries,
    MultimodalQueries,
    ChangelogQueries
  )

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    ChangelogQueries.queries("q_snapshot_compaction")(spark, "/root/testdata/sf0.001")

  /** One per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    querySets.flatMap(_.queries).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    querySets.flatMap(_.oracles).toMap
}
