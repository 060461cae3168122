package graft.queries

import java.util.concurrent.Executors

import scala.concurrent.duration._
import scala.concurrent.{Await, ExecutionContext, Future}

import graft.{SparkEntry, SparkSpec}

/** Multi-tenant chaos law: a MIX of SparkEntry queries running
  * CONCURRENTLY in one session must produce bit-identical results to the
  * same queries run serially. This is where the session-scoped machinery
  * that is individually unit-spec'd actually lives at 100x scale —
  * CachePins swap-pins racing on the same registry, StreamConf's
  * per-start session clones (the batch width must never wobble),
  * StagedLogs' per-(session, dir, name) build cells, and UUID-named
  * memory sinks all sharing one SparkSession.
  */
class ConcurrentQuerySpec extends SparkSpec {

  private val Sf = "/root/testdata/sf0.001"

  // >=8-way mixed concurrency: two CachePins users (lm_score pins the
  // bigram-count table, lsh_tuning pins truth + signature), two
  // StreamConf-scoped streaming replays (staged commit logs + memory
  // sinks), two plain batch queries — plus the three remaining
  // process-global-state owners: q_txn_commits (CommitArbiter's in-JVM
  // monitor + marker lease), q_media_gif (ImageIO's static reader
  // registry + the setUseCache(false) process config), and
  // q_kafka_updates_range (the EmbeddedKafka broker registry, racing
  // topic create/append/drop under a UUID topic per run)
  private val mixed = Seq(
    "q_lm_score", "q_lsh_tuning",
    "q_integrate_per_key_stream", "q_url_dedup_stream",
    "q1_agg", "q_join_dims",
    "q_txn_commits", "q_media_gif", "q_kafka_updates_range")

  /** Row cells via a deep renderer: Java arrays (binary columns)
    * toString by identity, which would make equal results compare
    * unequal.
    */
  private def cell(v: Any): String = v match {
    case a: Array[Byte] => a.map("%02x".format(_)).mkString
    case a: Array[_]    => a.map(cell).mkString("[", ",", "]")
    case s: scala.collection.Seq[_] => s.map(cell).mkString("[", ",", "]")
    case other          => String.valueOf(other)
  }

  private def canon(name: String): Seq[String] = {
    val df = SparkEntry.queries(name)(spark, Sf)
    val cols = df.columns.sorted.toSeq
    df.select(cols.map(org.apache.spark.sql.functions.col): _*).collect()
      .map(_.toSeq.map(cell).mkString("")).sorted.toSeq
  }

  private def reset(): Unit = {
    graft.core.CachePins.releaseAll()
    spark.catalog.clearCache()
  }

  test("mixed concurrent queries are bit-identical to serial execution " +
      "and never perturb the session's batch shuffle width") {
    val batchWidth = spark.conf.get("spark.sql.shuffle.partitions")
    val serial = mixed.map(n => n -> canon(n)).toMap
    reset()
    // +1 thread and a SECOND q_lm_score instance: same call-site, same
    // pin key, racing swaps — the documented worst case (reuse may be
    // lost mid-flight; correctness must not be)
    val workload = mixed :+ "q_lm_score"
    val pool = Executors.newFixedThreadPool(workload.size)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    try {
      val got = Await.result(
        Future.sequence(workload.map(n => Future(n -> canon(n)))),
        15.minutes)
      got.foreach { case (n, rows) =>
        assert(rows == serial(n),
          s"$n diverged under ${workload.size}-way concurrency")
      }
      assert(spark.conf.get("spark.sql.shuffle.partitions") == batchWidth,
        "a streaming start leaked its shuffle width into the batch session")
    } finally {
      pool.shutdown()
      reset()
    }
  }
}
