package graft.sources

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** The 100 TB manifest question, MEASURED: StoreManifest is one text
  * line per data file, re-read once per query — at 100 TB / 128 MB
  * files that is ~1M lines (StoreManifest.scala doc header), and the
  * documented escape hatch is per-partition sharding. This spec
  * synthesizes exactly that manifest (1M fabricated file paths across
  * 1024 partition dirs — publish never stats the listed files, so no
  * data is needed) and measures the three costs that would motivate
  * sharding:
  *
  *  - resolve (read + parse + footer check) — paid once per QUERY;
  *  - filesUnder on a probed-cell subset — paid once per ANN/bucket
  *    query after resolve;
  *  - publish of the next generation — paid once per MUTATION.
  *
  * Measured on this host (r16, median of 3 after warm-up): resolve
  * ~0.26 s, filesUnder(8 dirs) ~0.10 s, publish ~0.2 s (first-ever
  * publish ~5 s, JIT + cold page cache) for 1M files (~65 MB
  * manifest). DECISION: acceptable, no sharding — resolve is
  * driver-local streaming text I/O paid once per query against a store
  * of ~128 TB, and the LIST it replaces is a distributed
  * recursive-listing job over 1M objects (a Spark job by itself above
  * the parallel-discovery threshold, typically tens of seconds on an
  * object store, and NOT atomic against concurrent mutations). The
  * assertions below pin generous ceilings (5 s / 2 s / 15 s) so a
  * super-linear regression in the manifest codec fails loudly here;
  * re-evaluate sharding if a real deployment's mutation cadence makes
  * the per-mutation publish dominate.
  */
class ManifestScaleSpec extends SparkSpec {

  private val NFiles = 1000000
  private val NDirs = 1024

  private def timeMs[T](f: => T): (T, Long) = {
    val t0 = System.nanoTime()
    val r = f
    (r, (System.nanoTime() - t0) / 1000000L)
  }

  test("a 1M-file manifest (the ~100 TB serving-store shape) resolves, " +
      "prunes and republishes within driver-side text-IO bounds — the " +
      "measured basis for the no-sharding decision") {
    val path = Files.createTempDirectory("graft-manifest-scale-").toString + "/v"
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("cell",
        org.apache.spark.sql.types.IntegerType)))
    // fabricated but shape-exact: job-unique part file names under
    // cell=N dirs, ~66 bytes/line — the layout IvfStore/PqStore write
    val files = (0 until NFiles).map { i =>
      f"cell=${i % NDirs}/part-${i / NDirs}%05d-ffffffff-0000-4000-8000-${i}%012d.parquet"
    }
    val (m1, publishInitialMs) = timeMs {
      StoreManifest.publish(spark, path, schema, files, expectedGen = 0L)
    }
    assert(m1.gen == 1L && m1.files.size == NFiles)

    // resolve: the per-query cost. Warm once (page cache — the serving
    // regime: the manifest of a hot store is always cached), then median
    // of 3.
    StoreManifest.resolve(spark, path, "warmup")
    val resolveMs = (1 to 3).map(_ =>
      timeMs(StoreManifest.resolve(spark, path, "probe"))._2).sorted.apply(1)
    val m = StoreManifest.resolve(spark, path, "probe")

    // filesUnder: the post-resolve pruning an nProbe=8 ANN query does
    val probed = (0 until 8).map(c => s"cell=$c").toSet
    val (pruned, filesUnderMs) = timeMs(m.filesUnder(probed))
    val expectedPruned = (0 until NFiles).count(i => (i % NDirs) < 8)
    assert(pruned.size == expectedPruned,
      s"pruning must be exact: ${pruned.size} vs $expectedPruned")

    // publish of gen 2 (same list — the cost is the text write + link,
    // not the diff): the per-mutation cost
    val (m2, publishMs) = timeMs {
      StoreManifest.publish(spark, path, m.schema, m.files, m.gen)
    }
    assert(m2.gen == 2L && m2.files.size == NFiles)

    val manifestBytes = new java.io.File(
      s"$path/_manifest.${"%020d".format(2L)}").length()
    info(s"1M-file manifest: resolve=${resolveMs}ms " +
      s"filesUnder(8/$NDirs dirs)=${filesUnderMs}ms " +
      s"publish=${publishMs}ms (initial ${publishInitialMs}ms) " +
      s"size=${manifestBytes / 1024 / 1024}MB")
    println(s"MANIFESTSCALE files=$NFiles resolveMs=$resolveMs " +
      s"filesUnderMs=$filesUnderMs publishMs=$publishMs " +
      s"publishInitialMs=$publishInitialMs bytes=$manifestBytes")

    // ceilings: generous vs measured (~10x) so only a complexity-class
    // regression (quadratic parse, per-line fs call) trips them — this
    // is a bound, not a benchmark
    assert(resolveMs < 5000, s"resolve of 1M-line manifest took ${resolveMs}ms")
    assert(filesUnderMs < 2000, s"filesUnder took ${filesUnderMs}ms")
    assert(publishMs < 15000, s"publish of 1M-line manifest took ${publishMs}ms")

    // and the integrity contract holds at this scale: footer-checked,
    // exact file count, byte-identical list after a round trip
    assert(m2.files == files.sorted)
  }
}
