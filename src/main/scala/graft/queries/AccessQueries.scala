package graft.queries

import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Random-access (point-lookup) surface over batch snapshots — the
  * reference's RandomAccessReader capability
  * (reference: direct/core/.../randomaccess/RandomAccessReader.java:121 get,
  * :181 multiFetch, :260 scanWildcard, :325 listEntities). On Spark these are
  * predicate-pushdown scans / broadcast joins over the snapshot view; at
  * 100 TB the same queries hit parquet row-group statistics so a point
  * lookup touches only matching row groups.
  */
object AccessQueries extends QuerySet {

  val queries: Map[String, QFn] = Map(
    // get(key, attribute): single point lookup (pushed to row-group pruning)
    "q_get" -> ((s, d) => {
      Tables.events(s, d).filter(col("event_id") === 424)
        .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
    }),

    // multiFetch: batched point lookups — broadcast hash join against the
    // (small) key list, never a shuffle of the big side
    "q_multi_fetch" -> ((s, d) => {
      import s.implicits._
      val keys = broadcast(Seq(1L, 5L, 9L, 42L, 77L).toDF("user_id"))
      Tables.events(s, d).join(keys, "user_id")
        .select(col("user_id"), col("event_id"), col("event_type"))
    }),

    // scanWildcard(key, prefix): prefix scan over attribute-name-encoded
    // relations ("src1" prefix plays the wildcard attribute prefix)
    "q_scan_wildcard" -> ((s, d) => {
      Tables.documents(s, d).filter(col("source").startsWith("src1"))
        .select(col("doc_id"), col("source"), col("n_chars"))
    }),

    // listEntities(offset, limit): paged key listing
    "q_list_entities" -> ((s, d) => {
      Tables.events(s, d).select(col("user_id")).distinct()
        .orderBy(col("user_id")).offset(10).limit(50)
    }),

    // secondary index family (randomaccess/SecondaryIndex): value → keys,
    // built from the pre-watermark snapshot then MAINTAINED by the
    // snapshot-diff changelog (O(changed keys) elements, one co-
    // partitioned full-outer join) — the reference's transformation-fed
    // index family + scanWildcard lookup. The lookup answers "which
    // users' LATEST activity is a purchase" from the index alone; the
    // oracle replays the direct latest-per-user rule
    "q_secondary_index" -> ((s, d) => {
      import s.implicits._
      import graft.core.StreamElement
      import graft.operators.LatestWithTombstones
      import graft.randomaccess.SecondaryIndex
      val changelog = Tables.events(s, d).select(
        lit("user").as("entity"),
        concat(lit("user-"), col("user_id")).as("key"),
        lit("activity").as("attribute"),
        concat(lit("uuid-"), col("event_id")).as("uuid"),
        col("event_id").as("seqId"),
        unix_micros(col("ts")).as("stamp"),
        when(col("event_type") === "error", lit(null))
          .otherwise(encode(col("event_type"), "UTF-8")).as("value"),
        (col("event_type") === "error").as("delete"),
        lit(false).as("deleteWildcard")).as[StreamElement]
      val t = java.time.Instant.parse("2024-01-16T00:00:00Z")
        .toEpochMilli * 1000L
      val oldSnap = LatestWithTombstones.snapshot(changelog.filter(_.stamp <= t))
      val newSnap = LatestWithTombstones.snapshot(changelog)
      val index = SecondaryIndex.fromSnapshot(oldSnap, "activity")
        .unionByName(SecondaryIndex.diff(oldSnap, newSnap, "activity",
          newStamp = t + 1))
      SecondaryIndex.lookup(
        LatestWithTombstones.snapshot(index), "activity", "purchase")
    }),

    // console put/delete (reference Console put:393 / delete:421 —
    // interactive mutators through the data operator): a BOUNDED
    // scripted session (event_id <= 24, 25 commands at any sf — the
    // q_txn_commits bounding pattern; console input is inherently
    // driver-side) derived from the events table drives the REAL shell
    // (parse → StreamElement factory → GraftOperator.write → family
    // append), then the compacted read-back through the same operator
    // answers latest-per-user. The oracle replays that rule directly:
    // each event is a put (or a delete for 'error'), stamped by its
    // event_id, so the survivor per user is its max-id non-error event
    "q_console_mutators" -> ((s, d) => {
      val slice = Tables.events(s, d).filter(col("event_id") <= 24)
        .select(col("event_id").cast("long"), col("user_id").cast("long"),
          col("event_type"))
        .collect().sortBy(_.getLong(0))
      val script = (slice.map { r =>
        val (id, uid, et) = (r.getLong(0), r.getLong(1), r.getString(2))
        if (et == "error") s"delete user user-$uid activity $id"
        else s"put user user-$uid activity $id $et"
      } :+ "exit").mkString("\n") + "\n"
      val tmp = java.nio.file.Files.createTempDirectory("graft-console-q").toString
      try {
        val repo = graft.core.Repository.parse(
          s"""entities { user { attributes { "activity" { scheme: string } } } }
             |attributeFamilies { user-primary {
             |  entity: user
             |  attributes: [ "*" ]
             |  storage: "file://$tmp/store"
             |  type: primary
             |  access: [ commit-log, batch-updates, batch-snapshot, random-access ]
             |} }""".stripMargin)
        val op = new graft.core.GraftOperator(s, repo)
        val consoleOut = new java.io.ByteArrayOutputStream()
        new graft.tools.GraftShell(op,
          new java.io.ByteArrayInputStream(script.getBytes("UTF-8")),
          new java.io.PrintStream(consoleOut, true, "UTF-8")).run()
        op.getBatchSnapshot("user").toDF()
          .select(col("key"), col("stamp").as("event_id"),
            decode(col("value"), "UTF-8").as("last_type"))
          .localCheckpoint(true) // detach from the scratch store pre-delete
      } finally StagedLogs.deleteRecursively(tmp)
    }),

    // scanWildcardAll(key): ALL live attributes of one key through the
    // REAL reader (tombstones + wildcard deletes honored by the
    // compaction, predicate pushed below it) — the changelog is the
    // same device.*/signup/error encoding q_snapshot_wildcard_delete
    // uses, so DuckDB replays the identical semantics
    // (reference RandomAccessReader.scanWildcardAll:207)
    "q_scan_wildcard_all" -> ((s, d) => {
      import graft.core.StreamElement
      // ONE shared encoding (Tables.eventsAsWildcardChangelog) + the
      // generic read-only family adapter — the same definition
      // q_snapshot_wildcard_delete and the proxy rows compact
      val fam = graft.streaming.AttributeLogFamily.batchView(
        Tables.eventsAsWildcardChangelog(s, d))
      val rows = new graft.randomaccess.RandomAccessReader(fam)
        .scanWildcardAll("user-4")
      s.createDataset(rows)(StreamElement.encoder).toDF()
        .select(col("attribute"), col("seqId").as("last_event_id"),
          col("value").cast("string").as("last_type"))
    })
  )

  val oracles: Map[String, String] = Map(
    // users whose latest event (position = ts, event_id) is a purchase —
    // the index must answer exactly the direct rule
    "q_secondary_index" ->
      """SELECT 'user-' || CAST(user_id AS VARCHAR) AS entity_key FROM (
        |  SELECT user_id, event_type,
        |         row_number() OVER (PARTITION BY user_id
        |           ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events
        |) WHERE rn = 1 AND event_type = 'purchase'""".stripMargin,

    // survivor per user = its max-id event among ids 0..24, alive iff
    // not an error (errors were console deletes)
    "q_console_mutators" ->
      """SELECT 'user-' || CAST(user_id AS VARCHAR) AS key,
        |CAST(event_id AS BIGINT) AS event_id,
        |event_type AS last_type
        |FROM (SELECT user_id, event_id, event_type,
        |             row_number() OVER (PARTITION BY user_id
        |               ORDER BY event_id DESC) AS rn
        |      FROM events WHERE event_id <= 24)
        |WHERE rn = 1 AND event_type <> 'error'""".stripMargin,

    "q_get" ->
      """SELECT event_id, user_id, event_type, value FROM events WHERE event_id = 424""",

    "q_multi_fetch" ->
      """SELECT user_id, event_id, event_type FROM events
        |WHERE user_id IN (1, 5, 9, 42, 77)""".stripMargin,

    "q_scan_wildcard" ->
      """SELECT doc_id, source, n_chars FROM documents WHERE source LIKE 'src1%'""",

    "q_list_entities" ->
      """SELECT DISTINCT user_id FROM events ORDER BY user_id LIMIT 50 OFFSET 10""",

    // per attribute of user 4: the latest write survives iff it is an
    // upsert AND strictly newer than the user's newest wildcard
    // tombstone ('signup'); position = (stamp, event_id) — the
    // q_snapshot_wildcard_delete replay restricted to one key
    "q_scan_wildcard_all" ->
      """WITH base AS (
        |  SELECT CASE WHEN event_type = 'signup' THEN 'device.*'
        |              ELSE 'device.' || CAST(event_id % 7 AS VARCHAR) END AS attr,
        |         epoch_us(ts) AS e, event_id, event_type
        |  FROM events WHERE user_id = 4
        |), latest AS (
        |  SELECT * FROM (
        |    SELECT attr, e, event_id, event_type,
        |           row_number() OVER (PARTITION BY attr
        |             ORDER BY e DESC, event_id DESC) AS rn
        |    FROM base) WHERE rn = 1
        |), wc AS (
        |  SELECT max(CAST(e AS HUGEINT) * 100000000 + event_id) AS wcpos
        |  FROM base WHERE event_type = 'signup'
        |)
        |SELECT l.attr AS attribute, l.event_id AS last_event_id,
        |       l.event_type AS last_type
        |FROM latest l LEFT JOIN wc ON TRUE
        |WHERE l.event_type NOT IN ('signup', 'error')
        |  AND (wc.wcpos IS NULL
        |       OR CAST(l.e AS HUGEINT) * 100000000 + l.event_id > wc.wcpos)""".stripMargin
  )
}
