package graft.core

import java.util.concurrent.CopyOnWriteArrayList
import java.util.concurrent.atomic.{AtomicLong, LongAdder}

import scala.collection.concurrent.TrieMap
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** Operational metrics: counters, gauges and a pluggable listener — the
  * reference's metrics surface reduced to its observable contract
  * (reference: core/.../metrics/Metrics.java — named counters/gauges
  * incremented by operators and exported by a pluggable reporter).
  *
  * Two feed paths:
  *
  *  - DRIVER-SIDE wire-ins (`inc`/`gauge`) where counts are already known
  *    without extra work: transaction commits/aborts, embedded-log
  *    appends, random-access lookups, streaming batch commits, watermark
  *    positions;
  *  - EXECUTOR-SIDE counts ride Spark's own `Dataset.observe` mechanism:
  *    [[observed]] builds an observation whose metric columns are named
  *    `graft.…`, and [[install]] registers a QueryExecutionListener that
  *    harvests those fields into counters after each action — no extra
  *    job, no driver collect, works in batch and streaming alike.
  *
  * Counters are JVM-global (LongAdder — contention-free from many
  * threads); `reset()` gives tests isolation.
  */
object Metrics {

  /** Pluggable sink: called synchronously on every update. */
  trait Listener {
    def onCounter(name: String, delta: Long, total: Long): Unit = ()
    def onGauge(name: String, value: Long): Unit = ()
  }

  private val counters = TrieMap.empty[String, LongAdder]
  private val gauges = TrieMap.empty[String, AtomicLong]
  private val listeners = new CopyOnWriteArrayList[Listener]()
  private val obsId = new AtomicLong()
  // weak keys: an install must not pin a stopped session in memory
  private val installed = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession, java.lang.Boolean]())

  def inc(name: String, delta: Long = 1L): Unit = {
    val c = counters.getOrElseUpdate(name, new LongAdder)
    c.add(delta)
    listeners.asScala.foreach(_.onCounter(name, delta, c.sum()))
  }

  def gauge(name: String, value: Long): Unit = {
    gauges.getOrElseUpdate(name, new AtomicLong()).set(value)
    listeners.asScala.foreach(_.onGauge(name, value))
  }

  def counter(name: String): Long = counters.get(name).map(_.sum()).getOrElse(0L)

  def gaugeValue(name: String): Option[Long] = gauges.get(name).map(_.get())

  def snapshot: Map[String, Long] =
    counters.map { case (k, v) => k -> v.sum() }.toMap ++
      gauges.map { case (k, v) => k -> v.get() }

  def addListener(l: Listener): Unit = listeners.add(l)
  def removeListener(l: Listener): Unit = listeners.remove(l)

  def reset(): Unit = { counters.clear(); gauges.clear() }

  /** Attach an observation to `df` whose aggregate columns (each aliased
    * `graft.<metric>`) will be harvested into counters when an action on
    * the downstream plan completes — requires [[install]] on the session.
    */
  def observed(df: org.apache.spark.sql.DataFrame,
      metricCols: Seq[org.apache.spark.sql.Column]): org.apache.spark.sql.DataFrame =
    df.observe(s"graft-obs-${obsId.incrementAndGet()}",
      metricCols.head, metricCols.tail: _*)

  /** Register the harvest listener on a session (idempotent per session):
    * every observed-metric field named `graft.…` increments the counter
    * of that name after each successful action.
    */
  def install(spark: SparkSession): Unit = installed.synchronized {
    if (!installed.containsKey(spark)) {
      installed.put(spark, java.lang.Boolean.TRUE)
      spark.listenerManager.register(new QueryExecutionListener {
        override def onSuccess(funcName: String, qe: QueryExecution,
            durationNs: Long): Unit =
          qe.observedMetrics.foreach { case (_, row) =>
            row.schema.fields.zipWithIndex.foreach { case (f, i) =>
              if (f.name.startsWith("graft.") && !row.isNullAt(i))
                row.get(i) match {
                  case n: Number => inc(f.name, n.longValue())
                  case _         => ()
                }
            }
          }
        override def onFailure(funcName: String, qe: QueryExecution,
            exception: Exception): Unit = ()
      })
    }
  }
}
