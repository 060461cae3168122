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

  test("real TIMESTAMP(NANOS) vintage: conf restored, frame stays readable") {
    // a genuine timestamp[ns] parquet file (pyarrow-written test resource
    // — Spark cannot write one), read on a session that does NOT carry
    // nanosAsLong: events() must succeed, must RESTORE the caller's conf
    // (the r11 ADVICE finding: the nanos vintage used to leave the flag
    // set in the session permanently), and the returned frame must still
    // collect() AFTER the restore (the per-relation read option carries
    // the flag into every action's scan)
    val res = getClass.getResource("/vintage-nanos/events.parquet")
    assume(res != null, "vintage-nanos fixture missing")
    val dir = new java.io.File(res.toURI).getParentFile.getAbsolutePath
    val Key = "spark.sql.legacy.parquet.nanosAsLong"
    val vanilla = org.apache.spark.sql.GraftSqlBridge.cloneSession(spark)
    vanilla.conf.unset(Key)
    val df = Tables.events(vanilla, dir)
    // getOption surfaces the registered DEFAULT ("false") rather than
    // None — the restore is correct as long as the flag is not left true
    assert(!vanilla.conf.getOption(Key).contains("true"),
      "events() must not leave nanosAsLong set in the caller's session")
    val got = df.select(unix_micros(col("ts"))).as[Long](
      org.apache.spark.sql.Encoders.scalaLong).collect().sorted.toSeq
    assert(got == stampsUs, s"${got.take(3)}... vs ${stampsUs.take(3)}...")
    // and an UNRELATED raw parquet read in the caller's session does NOT
    // inherit the flag: without it, Spark refuses TIMESTAMP(NANOS)
    // (under the leaked flag it would silently arrive as LongType)
    val unrelated = scala.util.Try(
      vanilla.read.parquet(s"$dir/events.parquet").schema("ts").dataType)
    assert(unrelated.isFailure ||
      unrelated.get != org.apache.spark.sql.types.LongType,
      s"unrelated reads must not inherit nanosAsLong: $unrelated")
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
