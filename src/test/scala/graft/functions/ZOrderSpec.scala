package graft.functions

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ZOrderSpec extends SparkSpec {
  import SparkSpec.spark.implicits._

  test("magic-number zkey == bit-by-bit reference interleave") {
    val pts = for (x <- 0L to 70L by 7L; y <- 0L to 1000L by 97L) yield (x, y)
    val got = pts.toDF("x", "y")
      .select($"x", $"y", ZOrder.zkey($"x", $"y").as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    pts.foreach { case (x, y) =>
      assert(got((x, y)) == ZOrder.interleaveRef(x, y), s"($x,$y)")
    }
  }

  test("tile id == interleave of truncated coordinates") {
    val df = Seq((5L, 9L), (1000L, 3L), (0L, 0L), (65535L, 65535L))
      .toDF("x", "y")
      .select($"x", $"y",
        ZOrder.tile(ZOrder.zkey($"x", $"y"), 8).as("t"))
    df.collect().foreach { r =>
      val (x, y) = (r.getLong(0), r.getLong(1))
      assert(r.getLong(2) == ZOrder.interleaveRef(x >> 4, y >> 4))
    }
  }

  test("boxTiles covers exactly the tiles holding in-box points") {
    val all = for (x <- 0L until 64L; y <- 0L until 64L) yield (x, y)
    val (xLo, xHi, yLo, yHi) = (13L, 27L, 40L, 45L)
    val expected = all
      .filter { case (x, y) => x >= xLo && x <= xHi && y >= yLo && y <= yHi }
      .map { case (x, y) => ZOrder.interleaveRef(x >> 3, y >> 3) }
      .distinct.sorted
    assert(ZOrder.boxTiles(xLo, xHi, yLo, yHi, 6) == expected)
  }

  test("layoutWrite prunes tile partitions for a box query (the 100 TB read path)") {
    val dir = Files.createTempDirectory("graft-zorder-").toString + "/t"
    val df = (for (x <- 0L until 64L; y <- 0L until 64L)
      yield (x, y, x * 64 + y)).toDF("x", "y", "payload")
    ZOrder.layoutWrite(df, dir, $"x", $"y", tileShift = 8)

    val back = spark.read.parquet(dir)
    val (xLo, xHi, yLo, yHi) = (10L, 20L, 50L, 60L)
    val tiles = ZOrder.boxTiles(xLo, xHi, yLo, yHi, 8)
    val pruned = back.filter($"z_tile".isin(tiles: _*))
      .filter($"x".between(xLo, xHi) && $"y".between(yLo, yHi))

    // correctness: pruned read answers the box query exactly
    val expected = df.filter($"x".between(xLo, xHi) && $"y".between(yLo, yHi))
      .select("payload").as[Long].collect().sorted.toSeq
    assert(pruned.select("payload").as[Long].collect().sorted.toSeq == expected)

    // plan: tile predicate lands in PartitionFilters (directory pruning,
    // not a post-scan filter) — 2 of 16 tiles touched for this box.
    // AQE off so the executed plan is concrete and the scan's numFiles
    // metric is reachable (DataFrame.inputFiles ignores pruning).
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val p2 = spark.read.parquet(dir)
        .filter($"z_tile".isin(tiles: _*))
        .filter($"x".between(xLo, xHi) && $"y".between(yLo, yHi))
      p2.collect()
      val plan = p2.queryExecution.executedPlan
      assert(plan.toString.contains("PartitionFilters") &&
        plan.toString.contains("z_tile"), plan.toString.take(1500))
      val scan = plan.collect {
        case s: org.apache.spark.sql.execution.FileSourceScanExec => s
      }.head
      val touched = scan.metrics("numFiles").value
      val total = spark.read.parquet(dir).inputFiles.length
      assert(touched < total, s"pruning must skip files: $touched/$total")
    } finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
  }
}
