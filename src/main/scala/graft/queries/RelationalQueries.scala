package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables
import graft.sources.Tables.cents

/** Element-wise ops, aggregations and joins over bounded data — the batch
  * lowering of the reference's Stream/WindowedStream surface
  * (reference: tools/.../Stream.java:34 map/flatMap/filter/union,
  * WindowedStream.java:27 count/sum/average/distinct/sorted/join/leftJoin).
  * Everything is declarative DataFrame code: Catalyst pushes the filters and
  * projections into the parquet scan and picks join strategies (broadcast for
  * dims), which is the scale story at 100 TB — no driver-side iteration.
  */
object RelationalQueries extends QuerySet {

  /** The (errors, clicks) as-of sides — ONE definition for q_asof_join
    * and q_asof_join_bucketed (the bucketing is an execution detail; the
    * inputs and the oracle must be the same object, not copies kept in
    * sync).
    */
  private def asofSides(s: SparkSession, d: String): (DataFrame, DataFrame) = {
    val ev = Tables.events(s, d).select(col("event_id"), col("user_id"),
      unix_micros(col("ts")).as("ts_us"), col("event_type"), col("value"))
    val errors = ev.filter(col("event_type") === "error")
      .select(col("event_id"), col("user_id"), col("ts_us"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts_us"),
        col("event_id").as("click_id"),
        cents(col("value")).as("click_cents"))
    (errors, clicks)
  }

  /** Shared as-of oracle (union + window lowering, identical tie
    * semantics: right rows before left at equal ts, highest click_id
    * within a tie).
    */
  private val asofOracleSql =
    """WITH ev AS (
      |  SELECT event_id, user_id, epoch_us(ts) AS ts_us, event_type, value
      |  FROM events
      |), u AS (
      |  SELECT user_id, ts_us, 1 AS side,
      |         CAST(9223372036854775807 AS BIGINT) AS tie,
      |         event_id, CAST(NULL AS BIGINT) AS click_cents,
      |         CAST(NULL AS BIGINT) AS click_id
      |  FROM ev WHERE event_type = 'error'
      |  UNION ALL
      |  SELECT user_id, ts_us, 0, event_id, NULL,
      |         CAST(round(value * 100, 0) AS BIGINT), event_id
      |  FROM ev WHERE event_type = 'click'
      |)
      |SELECT event_id, asof_click_cents, asof_click_id FROM (
      |  SELECT side, event_id,
      |    last_value(click_cents IGNORE NULLS) OVER w AS asof_click_cents,
      |    last_value(click_id IGNORE NULLS) OVER w AS asof_click_id
      |  FROM u
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, side, tie
      |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |) WHERE side = 1""".stripMargin

  val queries: Map[String, QFn] = Map(
    // AS-OF join (custom operator Spark lacks): every error event gains
    // the user's most recent at-or-before click — one union + one shuffle
    // via graft.operators.AsOfJoin, never an |L|x|R| range explosion
    "q_asof_join" -> ((s, d) => {
      val (errors, clicks) = asofSides(s, d)
      graft.operators.AsOfJoin.join(errors, clicks, "user_id", "ts_us",
          valueCols = Seq("click_cents", "click_id"), tiebreak = "click_id")
        .select(col("event_id"), col("asof_click_cents"), col("asof_click_id"))
    }),

    // the skew-safe AS-OF variant: same semantics, but the window
    // partitions by (key, hour-bucket) with carried boundary state, so a
    // hot key parallelizes instead of sorting its history in one task
    "q_asof_join_bucketed" -> ((s, d) => {
      val (errors, clicks) = asofSides(s, d)
      graft.operators.AsOfJoin.joinBucketed(errors, clicks, "user_id", "ts_us",
          valueCols = Seq("click_cents", "click_id"), tiebreak = "click_id",
          grain = 3600000000L)
        .select(col("event_id"), col("asof_click_cents"), col("asof_click_id"))
    }),

    // RANGE join (custom operator Spark lacks): clicks landing inside the
    // hour after a purchase by the same user — grain-bucketed equi-join,
    // never the nested-loop plan an inequality join would pick
    "q_range_join" -> ((s, d) => {
      val hourUs = 3600000000L
      val ev = Tables.events(s, d).select(col("event_id"), col("user_id"),
        unix_micros(col("ts")).as("ts_us"), col("event_type"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts_us"), col("event_id").as("click_id"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts_us").as("p_start"),
          (col("ts_us") + hourUs).as("p_end"),
          col("event_id").as("purchase_id"))
      graft.operators.RangeJoin.join(clicks, purchases, "user_id", "ts_us",
          "p_start", "p_end", grain = hourUs)
        .select(col("click_id"), col("purchase_id"))
    }),

    // map (Stream.map, Stream.java:68): 1:1 remap with computed projection
    "q_map_project" -> ((s, d) => {
      Tables.lineitem(s, d).select(
        col("l_orderkey"), col("l_linenumber"),
        cents(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("net_cents"))
    }),

    // filter (Stream.filter, Stream.java:92): pushed down to parquet scan
    "q_filter" -> ((s, d) => {
      Tables.lineitem(s, d)
        .filter(col("l_quantity") > 45 && col("l_returnflag") === "R")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
          col("l_returnflag"))
    }),

    // flatMap (Stream.flatMap, Stream.java:43): 1:N via explode
    "q_flatmap_tokens" -> ((s, d) => {
      Tables.part(s, d).select(col("p_partkey"),
        explode(split(col("p_name"), " ")).as("token"))
    }),

    // union (Stream.union, Stream.java:337)
    "q_union" -> ((s, d) => {
      val o = Tables.orders(s, d)
      val a = o.filter(col("o_orderstatus") === "F")
        .select(col("o_orderkey").as("okey"), lit("finished").as("src"))
      val b = o.filter(col("o_totalprice") > 200000)
        .select(col("o_orderkey").as("okey"), lit("big").as("src"))
      a.unionByName(b)
    }),

    // distinct (WindowedStream.distinct, WindowedStream.java:490)
    "q_distinct" -> ((s, d) => {
      Tables.orders(s, d).select(col("o_orderstatus"), col("o_orderpriority"))
        .distinct()
    }),

    // the scripted-closure / UDF surface (reference Console.java:44
    // Groovy closures; tools/ShellExpr scala()): a REAL runtime-compiled
    // Scala closure — the same ShellCompiler path the console's
    // transform(scala("df => ...")) command uses — drives a whole
    // DataFrame => DataFrame pipeline. Compiled ONCE on the driver into
    // a pure Catalyst plan (nothing runtime-compiled ships to
    // executors), which is exactly why the oracle can replay it as
    // plain SQL
    "q_shell_closure" -> ((s, d) => {
      val fn = graft.tools.ShellCompiler.dfClosure(
        """df => df.filter(col("l_quantity") > 45)
          |  .groupBy(col("l_returnflag"))
          |  .agg(count(lit(1)).as("n"),
          |    sum(round(col("l_extendedprice") * 100, 0).cast("long"))
          |      .as("sum_cents"))""".stripMargin)
      fn(Tables.lineitem(s, d))
    }),

    // reshuffle (Stream.reshuffle, Stream.java:552): explicit
    // redistribution through the GStream operator. The projection pins
    // BOTH laws a reshuffle must satisfy: every target partition is
    // populated (count distinct spark_partition_id == 7 — AQE never
    // coalesces a user-specified repartition) and the data survives
    // bit-complete (row count + seqId checksum vs the source table)
    "q_reshuffle" -> ((s, d) => {
      val g = graft.api.GStream
        .ofElements(Tables.eventsAsChangelog(s, d))
        .reshuffle(7)
      // partition id PROJECTED first (a nondeterministic expression may
      // not sit inside an aggregate argument), then aggregated
      g.ds.toDF()
        .select(spark_partition_id().as("pid"), col("seqId"))
        .agg(
          countDistinct(col("pid")).as("n_partitions"),
          count(lit(1)).as("n_rows"),
          sum(col("seqId")).as("sum_seq"))
    }),

    // countByKey (WindowedStream.countByKey, WindowedStream.java:236)
    "q_count_by_key" -> ((s, d) => {
      Tables.events(s, d).groupBy(col("user_id")).agg(count(lit(1)).as("n"))
    }),

    // sum/average per key (WindowedStream.sumByKey:464, averageByKey:285)
    "q_sum_avg_by_key" -> ((s, d) => {
      Tables.events(s, d).groupBy(col("event_type")).agg(
        sum(cents(col("value"))).as("sum_cents"),
        round(avg(col("value")), 4).as("avg_value"),
        count(lit(1)).as("n"))
    }),

    // global combine (WindowedStream.count:421 / sum:439 on windowAll)
    "q_window_all" -> ((s, d) => {
      Tables.events(s, d).agg(
        count(lit(1)).as("n"),
        sum(cents(col("value"))).as("sum_cents"),
        countDistinct(col("user_id")).as("n_users"))
    }),

    // TPC-H Q1 shape: the reference's reduce/combine on a windowed stream
    // (WindowedStream.combine:168) lowered to partial+final hash aggregation
    "q1_agg" -> ((s, d) => {
      Tables.lineitem(s, d)
        // NTZ literal against the NTZ column: zone-free compare that still
        // pushes into the parquet scan (an LTZ literal would promote the
        // column through the session zone)
        .filter(col("l_shipdate") <= expr("TIMESTAMP_NTZ '2025-06-01 00:00:00'"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(cents(col("l_quantity"))).as("sum_qty_cents"),
          sum(cents(col("l_extendedprice"))).as("sum_base_cents"),
          sum(cents(col("l_extendedprice") * (lit(1) - col("l_discount"))))
            .as("sum_disc_cents"),
          round(avg(col("l_quantity")), 4).as("avg_qty"),
          round(avg(col("l_discount")), 4).as("avg_disc"),
          count(lit(1)).as("count_order"))
    }),

    // sorted (WindowedStream.sorted:382) — distributed range sort + limit
    "q_sorted_topk" -> ((s, d) => {
      Tables.lineitem(s, d)
        .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
        .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
        .limit(100)
    }),

    // inner equi-join (WindowedStream.join:316)
    "q_join" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
      val o = Tables.orders(s, d)
      li.join(o, li("l_orderkey") === o("o_orderkey"))
        .groupBy(col("o_orderstatus"))
        .agg(sum(cents(col("l_extendedprice") * (lit(1) - col("l_discount"))))
          .as("revenue_cents"),
          count(lit(1)).as("n"))
    }),

    // left outer join (WindowedStream.leftJoin:351)
    "q_left_join" -> ((s, d) => {
      val o = Tables.orders(s, d)
      val c = Tables.customer(s, d)
      o.join(c, o("o_custkey") === c("c_custkey"), "left_outer")
        .groupBy(coalesce(col("c_mktsegment"), lit("NONE")).as("segment"))
        .agg(count(lit(1)).as("n"), sum(cents(col("o_totalprice"))).as("sum_cents"))
    }),

    // multi-way dim join — dims are broadcast (reference has no planner;
    // Spark's broadcast threshold + explicit hint do this for free)
    "q_join_dims" -> ((s, d) => {
      val c = Tables.customer(s, d)
      val n = broadcast(Tables.nation(s, d))
      val r = broadcast(Tables.region(s, d))
      c.join(n, c("c_nationkey") === n("n_nationkey"))
        .join(r, n("n_regionkey") === r("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(count(lit(1)).as("n_cust"), sum(cents(col("c_acctbal"))).as("bal_cents"))
    }),

    // semi/anti joins (free in Spark; reference reaches these via stateful
    // dataflow — documented as a capability superset)
    "q_semi_join" -> ((s, d) => {
      val c = Tables.customer(s, d)
      val o = Tables.orders(s, d)
      c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
        .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n"))
    }),
    "q_anti_join" -> ((s, d) => {
      val c = Tables.customer(s, d)
      val o = Tables.orders(s, d)
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n"))
    }),

    // salted join (functions/Skew): each probe key spreads over 8 reducer
    // partitions (deterministic row salt; build side replicated 8x), so a
    // hot key cannot serialize one task at 100 TB. AQE's skew splitting
    // only fires on detected stats — salting is the declarative guarantee.
    // Oracle = the PLAIN join: salting must not change a single row
    "q_salted_join" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
      // shuffle_hash hint: model the at-scale regime where the build side
      // exceeds the broadcast threshold — under a broadcast join salting
      // would be pointless (no shuffle to de-skew)
      val sup = Tables.supplier(s, d)
        .withColumnRenamed("s_suppkey", "l_suppkey").hint("shuffle_hash")
      graft.functions.Skew.saltedJoin(li, sup, "l_suppkey", salt = 8)
        .groupBy(col("s_nationkey"))
        .agg(count(lit(1)).as("n"),
          sum(cents(col("l_extendedprice"))).as("price_cents"))
    }),

    // Bloom-prefiltered join (functions/BloomJoin): the selective build
    // side's keys become a Bloom filter probed MAP-SIDE on lineitem before
    // the shuffle — at 100 TB the exchange carries the ~2% that can match,
    // not the corpus. shuffle_hash hint models the at-scale regime where
    // the build side exceeds the broadcast threshold; the oracle is the
    // PLAIN join (no false negatives + exact join downstream = identical
    // result, whatever the filter's false-positive set is).
    "q_bloom_join" -> ((s, d) => {
      import graft.functions.BloomJoin
      val big = Tables.orders(s, d)
        .filter(col("o_orderpriority") === "1-URGENT" &&
          col("o_totalprice") > 150000)
      val li = BloomJoin.prefilter(Tables.lineitem(s, d), "l_orderkey",
        big, "o_orderkey")
      li.join(big.hint("shuffle_hash"),
          li("l_orderkey") === big("o_orderkey"))
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"),
          sum(cents(col("l_extendedprice") * (lit(1) - col("l_discount"))))
            .as("revenue_cents"))
    })
  )

  val oracles: Map[String, String] = Map(
    // replays the union+window lowering verbatim (identical tie semantics:
    // right rows before left at equal ts, highest click_id within a tie)
    "q_asof_join" -> asofOracleSql,

    // identical answer to q_asof_join by construction — the bucketing is
    // an execution detail, so the oracle is the same lowering
    "q_asof_join_bucketed" -> asofOracleSql,

    "q_range_join" ->
      """WITH ev AS (
        |  SELECT event_id, user_id, epoch_us(ts) AS ts_us, event_type FROM events
        |), c AS (
        |  SELECT user_id, ts_us, event_id AS click_id FROM ev
        |  WHERE event_type = 'click'
        |), p AS (
        |  SELECT user_id, ts_us AS p_start, ts_us + 3600000000 AS p_end,
        |         event_id AS purchase_id
        |  FROM ev WHERE event_type = 'purchase'
        |)
        |SELECT c.click_id, p.purchase_id
        |FROM c JOIN p ON c.user_id = p.user_id
        |  AND c.ts_us >= p.p_start AND c.ts_us < p.p_end""".stripMargin,

    "q_map_project" ->
      """SELECT l_orderkey, l_linenumber,
        |CAST(round(l_extendedprice * (1 - l_discount) * 100, 0) AS BIGINT) AS net_cents
        |FROM lineitem""".stripMargin,

    "q_filter" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag
        |FROM lineitem WHERE l_quantity > 45 AND l_returnflag = 'R'""".stripMargin,

    "q_flatmap_tokens" ->
      """SELECT p_partkey, unnest(string_split(p_name, ' ')) AS token FROM part""",

    "q_union" ->
      """SELECT o_orderkey AS okey, 'finished' AS src FROM orders WHERE o_orderstatus = 'F'
        |UNION ALL
        |SELECT o_orderkey AS okey, 'big' AS src FROM orders WHERE o_totalprice > 200000""".stripMargin,

    "q_distinct" ->
      """SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders""",

    "q_shell_closure" ->
      """SELECT l_returnflag, count(*) AS n,
        |CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)) AS BIGINT)
        |  AS sum_cents
        |FROM lineitem WHERE l_quantity > 45
        |GROUP BY l_returnflag""".stripMargin,

    "q_reshuffle" ->
      """SELECT CAST(7 AS BIGINT) AS n_partitions, count(*) AS n_rows,
        |CAST(sum(event_id) AS BIGINT) AS sum_seq FROM events""".stripMargin,

    "q_count_by_key" ->
      """SELECT user_id, count(*) AS n FROM events GROUP BY user_id""",

    "q_sum_avg_by_key" ->
      """SELECT event_type,
        |CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT) AS sum_cents,
        |round(avg(value), 4) AS avg_value,
        |count(*) AS n
        |FROM events GROUP BY event_type""".stripMargin,

    "q_window_all" ->
      """SELECT count(*) AS n,
        |CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT) AS sum_cents,
        |count(DISTINCT user_id) AS n_users
        |FROM events""".stripMargin,

    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |CAST(sum(CAST(round(l_quantity * 100, 0) AS BIGINT)) AS BIGINT) AS sum_qty_cents,
        |CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)) AS BIGINT) AS sum_base_cents,
        |CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100, 0) AS BIGINT)) AS BIGINT) AS sum_disc_cents,
        |round(avg(l_quantity), 4) AS avg_qty,
        |round(avg(l_discount), 4) AS avg_disc,
        |count(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '2025-06-01'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin,

    "q_sorted_topk" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
        |ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber LIMIT 100""".stripMargin,

    "q_salted_join" ->
      """SELECT s_nationkey, count(*) AS n,
        |CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)) AS BIGINT) AS price_cents
        |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |GROUP BY s_nationkey""".stripMargin,

    "q_bloom_join" ->
      """SELECT o_orderstatus, count(*) AS n,
        |CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100, 0) AS BIGINT)) AS BIGINT) AS revenue_cents
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE o_orderpriority = '1-URGENT' AND o_totalprice > 150000
        |GROUP BY o_orderstatus""".stripMargin,

    "q_join" ->
      """SELECT o_orderstatus,
        |CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100, 0) AS BIGINT)) AS BIGINT) AS revenue_cents,
        |count(*) AS n
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderstatus""".stripMargin,

    "q_left_join" ->
      """SELECT coalesce(c_mktsegment, 'NONE') AS segment, count(*) AS n,
        |CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT) AS sum_cents
        |FROM orders LEFT JOIN customer ON o_custkey = c_custkey
        |GROUP BY 1""".stripMargin,

    "q_join_dims" ->
      """SELECT r_name, n_name, count(*) AS n_cust,
        |CAST(sum(CAST(round(c_acctbal * 100, 0) AS BIGINT)) AS BIGINT) AS bal_cents
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name""".stripMargin,

    "q_semi_join" ->
      """SELECT c_mktsegment, count(*) AS n FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |GROUP BY c_mktsegment""".stripMargin,

    "q_anti_join" ->
      """SELECT c_mktsegment, count(*) AS n FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |GROUP BY c_mktsegment""".stripMargin
  )
}
