package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** Synthetic sources (reference: BeamStream.impulse/periodicImpulse,
  * BeamStream.java:254-310): a one-shot element and a periodic tick stream.
  */
object Impulse {

  /** Single synthetic element (impulse). */
  def impulse(spark: SparkSession): Dataset[java.lang.Long] =
    spark.range(1).as(org.apache.spark.sql.Encoders.LONG)

  /** Periodic tick stream (periodicImpulse) — Spark's rate source; columns
    * `timestamp`, `value`. The rate source only speaks WHOLE rows per
    * second, so fractional rates are refused loudly rather than silently
    * rounded (0.5/s would have become 1/s — double the requested rate;
    * 2.7/s would have truncated to 2/s). A sub-1/s impulse belongs on a
    * trigger interval, not the rate source.
    */
  def periodicImpulse(spark: SparkSession, ticksPerSecond: Double): DataFrame = {
    require(ticksPerSecond >= 1 && ticksPerSecond == math.floor(ticksPerSecond),
      s"rate source speaks whole rows/second; got $ticksPerSecond — use a " +
        "processing-time trigger for fractional cadences")
    spark.readStream.format("rate")
      .option("rowsPerSecond", ticksPerSecond.toLong)
      .load()
  }
}
