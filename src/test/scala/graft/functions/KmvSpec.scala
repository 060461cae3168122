package graft.functions

import graft.SparkSpec

/** KMV sketch laws: the properties that make it a mergeable partial
  * aggregate AND an oracle-checkable query.
  */
class KmvSpec extends SparkSpec {

  private def reduceAll(k: Int, xs: Seq[Long]): Array[Long] = {
    val a = new KmvSketch(k)
    xs.foldLeft(a.zero)(a.reduce)
  }

  test("sketch = k smallest distinct values, any insertion order") {
    val k = 8
    val xs = Seq(50L, 10L, 30L, 10L, 90L, 20L, 40L, 60L, 70L, 80L, 15L, 5L)
    val expected = xs.distinct.sorted.take(k)
    for (seed <- 1 to 5) {
      val shuffled = new scala.util.Random(seed).shuffle(xs)
      assert(reduceAll(k, shuffled).toSeq == expected, s"seed $seed")
    }
  }

  test("merge is order-invariant and equals the single-pass sketch") {
    val k = 16
    val rnd = new scala.util.Random(7)
    val xs = Seq.fill(500)(rnd.nextLong() & ((1L << 60) - 1))
    val a = new KmvSketch(k)
    val whole = reduceAll(k, xs).toSeq
    // arbitrary 3-way split, both merge orders
    val (p1, rest) = xs.splitAt(170)
    val (p2, p3) = rest.splitAt(170)
    val Seq(s1, s2, s3) = Seq(p1, p2, p3).map(reduceAll(k, _))
    assert(a.merge(a.merge(s1, s2), s3).toSeq == whole)
    assert(a.merge(s3, a.merge(s2, s1)).toSeq == whole)
  }

  test("below k the sketch IS the exact distinct set") {
    val got = reduceAll(8, Seq(3L, 1L, 3L, 2L))
    assert(got.toSeq == Seq(1L, 2L, 3L))
  }

  test("estimator lands within 3/sqrt(k-1) of the true cardinality") {
    val k = 64
    val rnd = new scala.util.Random(42)
    val n = 20000
    val hashes = Seq.fill(n)(rnd.nextLong() & ((1L << 60) - 1)).distinct
    val mins = reduceAll(k, hashes)
    assert(mins.length == k)
    val est = math.floor((k - 1) * Kmv.M / mins.last.toDouble)
    val err = math.abs(est - hashes.size) / hashes.size.toDouble
    assert(err < 3.0 / math.sqrt(k - 1.0),
      s"estimate $est for ${hashes.size} true distinct (err $err)")
  }

  test("the Column aggregate matches the direct sketch at any parallelism") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(11)
    val xs = Seq.fill(2000)(rnd.nextLong() & ((1L << 60) - 1))
    val expected = reduceAll(32, xs).toSeq
    for (parts <- Seq(1, 7)) {
      val got = xs.toDF("h").repartition(parts)
        .agg(Kmv.sketch(32)(org.apache.spark.sql.functions.col("h")))
        .head().getSeq[Long](0)
      assert(got == expected, s"parts=$parts")
    }
  }
}
