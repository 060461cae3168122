package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Testdata-vintage hardening: events.ts has shipped as TIMESTAMP(NANOS)
  * and TIMESTAMP(MICROS, NTZ) across driver regenerations (a silent
  * re-encoding broke 30 queries in round 7). Tables.events must
  * normalize every plausible encoding to the same micros instants, and
  * REFUSE unknown ones loudly instead of letting every downstream query
  * fail analysis one by one.
  */
class EventsVintageSpec extends SparkSpec {
  import SparkSpec.spark.implicits._

  private val baseUs = 1704412800000000L // 2024-01-05T00:00:00Z
  private def stampsUs = (0 until 20).map(i => baseUs + i * 1000000L)

  private def writeVintage(scale: Long): String = {
    val dir = Files.createTempDirectory("graft-vintage-").toString + "/sf"
    stampsUs.zipWithIndex
      .map { case (us, i) =>
        (i.toLong, us * scale, i.toLong % 5, "click", 1.0, "{}")
      }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(dir + "/events.parquet")
    dir
  }

  test("micros-, millis- and nanos-as-long vintages normalize identically") {
    def read(scale: Long): Seq[Long] = {
      val d = writeVintage(scale)
      Tables.events(spark, d)
        .select(unix_micros(col("ts"))).as[Long].collect().sorted.toSeq
    }
    // scale relative to micros: nanos ×1000, micros ×1, millis ÷1000
    assert(read(1L) == stampsUs)
    assert(read(1000L) == stampsUs)
    val millis = {
      val d = Files.createTempDirectory("graft-vintage-").toString + "/sf"
      stampsUs.zipWithIndex
        .map { case (us, i) =>
          (i.toLong, us / 1000L, i.toLong % 5, "click", 1.0, "{}")
        }
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .write.parquet(d + "/events.parquet")
      Tables.events(spark, d)
        .select(unix_micros(col("ts"))).as[Long].collect().sorted.toSeq
    }
    assert(millis == stampsUs)
  }

  test("an unknown ts type fails loudly at the normalization point") {
    val dir = Files.createTempDirectory("graft-vintage-").toString + "/sf"
    stampsUs.zipWithIndex
      .map { case (us, i) => (i.toLong, us.toString, i.toLong % 5) }
      .toDF("event_id", "ts", "user_id")
      .write.parquet(dir + "/events.parquet")
    val e = intercept[IllegalStateException] {
      Tables.events(spark, dir)
    }
    assert(e.getMessage.contains("unknown testdata vintage"))
  }

  test("an out-of-range long unit fails loudly (not silently misdated)") {
    val dir = Files.createTempDirectory("graft-vintage-").toString + "/sf"
    stampsUs.zipWithIndex
      .map { case (_, i) => (i.toLong, i.toLong /* seconds-scale?? no: tiny */,
        i.toLong % 5) }
      .toDF("event_id", "ts", "user_id")
      .write.parquet(dir + "/events.parquet")
    val e = intercept[IllegalStateException] {
      Tables.events(spark, dir).collect()
    }
    assert(e.getMessage.contains("no known epoch unit"))
  }
}
