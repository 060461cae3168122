package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables
import graft.sources.Tables.cents

/** Keyed-state operators, batch lowering. The reference executes these as
  * time-sorted stateful DoFns (reference: tools/.../Stream.java:520
  * integratePerKey, :386 reduceValueStateByKey; BeamStream.java:1498
  * IntegrateDoFn, :1544 AbstractReduceValueStateByKey). On bounded data the
  * idiomatic Spark lowering is a window function — one shuffle on the key,
  * spill-safe sort within partitions, full codegen — rather than an
  * imperative per-key loop. The streaming lowerings live in
  * [[graft.streaming]] as transformWithState processors.
  */
object StatefulQueries extends QuerySet {

  private val byUserTime = Window.partitionBy(col("user_id"))
    .orderBy(col("ts"), col("event_id"))

  val queries: Map[String, QFn] = Map(
    // integratePerKey: running prefix-sum per key in event-time order,
    // one output per input (Stream.java:520)
    "q_integrate_per_key" -> ((s, d) => {
      Tables.events(s, d)
        .withColumn("run_cents",
          sum(cents(col("value")))
            .over(byUserTime.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .select(col("event_id"), col("user_id"), col("run_cents"))
    }),

    // reduceValueStateByKey (sorted): state = previous event_type; per
    // element emit output(state, v) then update state (Stream.java:386).
    // The "emit previous" shape is exactly event-time lag.
    "q_reduce_value_state" -> ((s, d) => {
      Tables.events(s, d)
        .withColumn("prev_type",
          lag(col("event_type"), 1, "none").over(byUserTime))
        .select(col("event_id"), col("user_id"), col("prev_type"))
    }),

    // groupReduce: whole-group UDF emitting N outputs (WindowedStream
    // .java:129) — here top-2 per event_type by value; lowered to a ranked
    // window (distributed, spill-safe) instead of materializing groups
    "q_group_reduce_top2" -> ((s, d) => {
      val w = Window.partitionBy(col("event_type"))
        .orderBy(col("value").desc, col("event_id"))
      Tables.events(s, d)
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 2)
        .select(col("event_type"), col("rk"), col("event_id"), col("value"))
    })
  )

  val oracles: Map[String, String] = Map(
    "q_integrate_per_key" ->
      """SELECT event_id, user_id,
        |CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) OVER (
        |  PARTITION BY user_id ORDER BY ts, event_id
        |  ROWS UNBOUNDED PRECEDING) AS BIGINT) AS run_cents
        |FROM events""".stripMargin,

    "q_reduce_value_state" ->
      """SELECT event_id, user_id,
        |coalesce(lag(event_type) OVER (
        |  PARTITION BY user_id ORDER BY ts, event_id), 'none') AS prev_type
        |FROM events""".stripMargin,

    "q_group_reduce_top2" ->
      """SELECT event_type, rk, event_id, value FROM (
        |  SELECT event_type, event_id, value,
        |         row_number() OVER (PARTITION BY event_type
        |           ORDER BY value DESC, event_id) AS rk
        |  FROM events
        |) WHERE rk <= 2""".stripMargin
  )
}
