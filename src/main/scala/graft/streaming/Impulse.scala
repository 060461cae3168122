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
    * `timestamp`, `value`.
    */
  def periodicImpulse(spark: SparkSession, ticksPerSecond: Double): DataFrame =
    spark.readStream.format("rate")
      .option("rowsPerSecond", math.max(1, ticksPerSecond).toLong)
      .load()
}
