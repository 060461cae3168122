package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) data layout: interleave the bits of two dimension
  * columns so that multi-dimensional locality becomes one-dimensional —
  * rows close in (x, y) land in the same z-range. Laying a 100 TB table
  * out in z-order tiles turns a box query (key range × time range) into
  * partition pruning: the scan touches only the tiles whose z-prefix
  * intersects the box, instead of every file touched by either range
  * alone (row-ranked layouts cluster one dimension and scatter the
  * other).
  *
  * Everything here is pure integer bit arithmetic inside whole-stage
  * codegen (shift/and/or on longs — the classic Part1By1 magic-number
  * spread), replayable bit-for-bit by the DuckDB oracle. Two writer-side
  * affordances make the story real:
  *   - [[layoutWrite]] persists hive-partitioned by z-tile, so Catalyst
  *     prunes tile directories from a tile-set predicate
  *     (PartitionFilters — gated in ZOrderSpec);
  *   - rows are sorted by full z within each tile, so parquet row-group
  *     min/max stats on the z column prune WITHIN surviving tiles too.
  */
object ZOrder {

  /** Spread the low 16 bits of `c` to the even bit positions of a long
    * (Part1By1): 0b1111 → 0b01010101.
    */
  def spread16(c: Column): Column = {
    val a = c.bitwiseAND(lit(0xFFFFL))
    val b = a.bitwiseOR(shiftleft(a, 8)).bitwiseAND(lit(0x00FF00FFL))
    val d = b.bitwiseOR(shiftleft(b, 4)).bitwiseAND(lit(0x0F0F0F0FL))
    val e = d.bitwiseOR(shiftleft(d, 2)).bitwiseAND(lit(0x33333333L))
    e.bitwiseOR(shiftleft(e, 1)).bitwiseAND(lit(0x55555555L))
  }

  /** 32-bit Morton key of two 16-bit dimensions: x on even bits, y odd. */
  def zkey(x: Column, y: Column): Column =
    spread16(x).bitwiseOR(shiftleft(spread16(y), 1))

  /** Tile id = top bits of the z-key; `tileShift` low bits dropped, so a
    * tile covers a 2^(tileShift/2) × 2^(tileShift/2) square.
    */
  def tile(z: Column, tileShift: Int): Column = shiftright(z, tileShift)

  /** Per-tile layout manifest: row count, per-dimension min/max (what a
    * file-skipping index stores per file), and whether the tile survives
    * pruning for the given box query. One partial-aggregable groupBy —
    * the manifest is tiny regardless of corpus size.
    */
  def manifest(df: DataFrame, x: Column, y: Column, tileShift: Int,
      box: ((Long, Long), (Long, Long))): DataFrame = {
    val ((xLo, xHi), (yLo, yHi)) = box
    df.select(x.as("x"), y.as("y"))
      .withColumn("z_tile", tile(zkey(col("x"), col("y")), tileShift))
      .groupBy(col("z_tile"))
      .agg(count(lit(1)).as("n"),
        min(col("x")).as("x_min"), max(col("x")).as("x_max"),
        min(col("y")).as("y_min"), max(col("y")).as("y_max"))
      .withColumn("hit",
        !(col("x_max") < xLo || col("x_min") > xHi ||
          col("y_max") < yLo || col("y_min") > yHi))
  }

  /** Persist `df` z-ordered: hive-partitioned by tile (directory pruning)
    * and z-sorted within each tile (row-group stat pruning on `z_key`).
    * One shuffle on the tile id; tile fan-out is bounded by the z domain,
    * not the corpus.
    */
  def layoutWrite(df: DataFrame, path: String, x: Column, y: Column,
      tileShift: Int): Unit =
    df.withColumn("z_key", zkey(x, y))
      .withColumn("z_tile", tile(col("z_key"), tileShift))
      .repartition(col("z_tile"))
      .sortWithinPartitions(col("z_tile"), col("z_key"))
      .write.partitionBy("z_tile").mode("overwrite")
      // forced static: dynamic partitionOverwriteMode would keep stale
      // tiles the new layout doesn't touch
      .option("partitionOverwriteMode", "static").parquet(path)

  /** The tiles a box query must read: every tile id whose square
    * intersects the box — computed by walking the (bounded) tile grid,
    * driver-side, manifest-scale work. `tileShift` must be even (a tile
    * drops tileShift/2 bits of each dimension, so its id is the
    * interleave of the truncated coordinates).
    */
  def boxTiles(xLo: Long, xHi: Long, yLo: Long, yHi: Long,
      tileShift: Int): Seq[Long] = {
    require(tileShift % 2 == 0, s"tileShift must be even, got $tileShift")
    val k = tileShift / 2
    (for {
      ty <- (yLo >> k) to (yHi >> k)
      tx <- (xLo >> k) to (xHi >> k)
    } yield interleaveRef(tx, ty)).distinct.sorted
  }

  /** Bit-by-bit reference interleave (the model ZOrderSpec pins the
    * magic-number chain against; also used for driver-side tile lists).
    */
  def interleaveRef(x: Long, y: Long): Long =
    (0 until 16).foldLeft(0L) { (acc, i) =>
      acc | ((x >> i) & 1L) << (2 * i) | ((y >> i) & 1L) << (2 * i + 1)
    }
}
