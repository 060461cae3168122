package graft.streaming

import org.apache.spark.sql.SparkSession

/** Streaming state-partition sizing. A stateful streaming query fixes its
  * state partitioning from `spark.sql.shuffle.partitions` at FIRST batch,
  * and every micro-batch then commits one state-store delta per
  * partition — per-batch overhead is O(state partitions) regardless of
  * data volume. The right number is therefore a STREAMING-specific
  * choice: ~2× total executor cores on a cluster, but far LOWER than the
  * batch shuffle width when micro-batches are small (local replay
  * harnesses, low-volume topics), where 32 partitions of per-batch
  * store-commit overhead dominated measured query time by ~30%.
  *
  * `spark.graft.streaming.shufflePartitions`, when set, is scoped over
  * streaming query STARTS only — batch plans in the same session keep
  * the session's shuffle width. Unset ⇒ no behavior change.
  */
object StreamConf {

  val Key = "spark.graft.streaming.shufflePartitions"
  private val ShuffleKey = "spark.sql.shuffle.partitions"

  /** Run `start` (which must START the streaming query — the conf is
    * read at query planning) under the streaming shuffle width, then
    * restore the session's batch width.
    */
  def scoped[A](s: SparkSession)(start: => A): A =
    s.conf.getOption(Key) match {
      case None => start
      case Some(n) =>
        val prev = s.conf.get(ShuffleKey)
        s.conf.set(ShuffleKey, n)
        try start finally s.conf.set(ShuffleKey, prev)
    }
}
