package graft.queries

import org.apache.spark.sql.functions._

import graft.core.StreamElement
import graft.operators.LatestWithTombstones
import graft.sources.Tables

/** Core changelog semantics — StreamElement upserts/deletes compacted to a
  * snapshot, including wildcard-delete tombstones. Drives
  * [[graft.operators.SnapshotCompact]] over changelogs derived from the
  * driver's `events` table (key = user, `error` = delete tombstone,
  * `signup` = wildcard delete in the wildcard variant), so the DuckDB oracle
  * can replay the same semantics in SQL.
  */
object ChangelogQueries extends QuerySet {

  val queries: Map[String, QFn] = Map(
    // reduceToLatest over a real changelog with delete tombstones
    // (reference: PCollectionTools.reduceAsSnapshot:42, datamodel.md:120-149)
    "q_snapshot_compaction" -> ((s, d) => {
      val log = Tables.eventsAsChangelog(s, d)
      LatestWithTombstones.snapshot(log)
        .select(col("key"), col("stamp").as("last_stamp_us"),
          get_json_object(col("value").cast("string"), "$.event_type")
            .as("last_type"))
    }),

    // wildcard attributes + deleteWildcard tombstones
    // (reference: StreamElement.java:145, GroovyEnvTest.testWildcardDelete:286)
    "q_snapshot_wildcard_delete" -> ((s, d) => {
      import s.implicits._
      val log = Tables.events(s, d).select(
        lit("user").as("entity"),
        concat(lit("user-"), col("user_id")).as("key"),
        when(col("event_type") === "signup", lit("device.*"))
          .otherwise(concat(lit("device."), col("event_id") % 7)).as("attribute"),
        concat(lit("uuid-"), col("event_id")).as("uuid"),
        col("event_id").as("seqId"),
        unix_micros(col("ts")).as("stamp"),
        when(col("event_type").isin("signup", "error"), lit(null))
          .otherwise(encode(col("event_type"), "UTF-8")).as("value"),
        col("event_type").isin("signup", "error").as("delete"),
        (col("event_type") === "signup").as("deleteWildcard")
      ).as[StreamElement]
      LatestWithTombstones.snapshot(log)
        .select(col("key"), col("attribute"),
          col("seqId").as("last_event_id"),
          col("value").cast("string").as("last_type"))
    })
  )

  val oracles: Map[String, String] = Map(
    // latest element per user survives iff it is not a delete ('error')
    "q_snapshot_compaction" ->
      """SELECT 'user-' || CAST(user_id AS VARCHAR) AS key,
        |       epoch_us(ts) AS last_stamp_us, event_type AS last_type
        |FROM (
        |  SELECT user_id, ts, event_type,
        |         row_number() OVER (PARTITION BY user_id
        |           ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events
        |) WHERE rn = 1 AND event_type <> 'error'""".stripMargin,

    // per (user, device-suffix) the latest write survives iff it is an
    // upsert AND is strictly newer than the user's newest wildcard tombstone
    // ('signup'); ordering position = (stamp, event_id)
    "q_snapshot_wildcard_delete" ->
      """WITH base AS (
        |  SELECT user_id,
        |         CASE WHEN event_type = 'signup' THEN 'device.*'
        |              ELSE 'device.' || CAST(event_id % 7 AS VARCHAR) END AS attr,
        |         epoch_us(ts) AS e, event_id, event_type
        |  FROM events
        |), latest AS (
        |  SELECT * FROM (
        |    SELECT user_id, attr, e, event_id, event_type,
        |           row_number() OVER (PARTITION BY user_id, attr
        |             ORDER BY e DESC, event_id DESC) AS rn
        |    FROM base) WHERE rn = 1
        |), wc AS (
        |  SELECT user_id, max(CAST(e AS HUGEINT) * 100000000 + event_id) AS wcpos
        |  FROM base WHERE event_type = 'signup' GROUP BY user_id
        |)
        |SELECT 'user-' || CAST(l.user_id AS VARCHAR) AS key,
        |       l.attr AS attribute, l.event_id AS last_event_id,
        |       l.event_type AS last_type
        |FROM latest l LEFT JOIN wc ON l.user_id = wc.user_id
        |WHERE l.event_type NOT IN ('signup', 'error')
        |  AND (wc.wcpos IS NULL
        |       OR CAST(l.e AS HUGEINT) * 100000000 + l.event_id > wc.wcpos)""".stripMargin
  )
}
