package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Winnowing selection + exact-substring pair properties (the
  * Schleimer/Wilkerson/Aiken guarantees the operator's scaladoc
  * promises).
  */
class WinnowSpec extends SparkSpec {

  private def docs(rows: (Long, String)*) = {
    val s = spark
    import s.implicits._
    rows.toDF("doc_id", "text")
  }

  test("a shared span of at least k+w-1 chars yields a shared fingerprint") {
    val span = "UNIQUE-SHARED-SPAN" // 18 chars >= 8 + 4 - 1
    val d = docs(
      1L -> s"left padding text $span and some tail",
      2L -> s"completely different framing $span other ending",
      3L -> "no overlap with anything here at all, none")
    val fps = Winnow.fingerprints(d, "doc_id", "text")
    val pairs = Winnow.substringPairs(fps, "doc_id", minShared = 1,
      maxBucket = 50).collect()
    assert(pairs.exists(r => r.getLong(0) == 1L && r.getLong(1) == 2L),
      s"docs sharing the span must pair: ${pairs.mkString(", ")}")
    assert(!pairs.exists(r => r.getLong(1) == 3L || r.getLong(0) == 3L),
      "the disjoint doc must not pair")
  }

  test("selection is position-robust: an edit far from the span keeps its fingerprints") {
    val base = "the quick brown fox jumps over the lazy dog repeatedly"
    val d = docs(1L -> base, 2L -> s"PREFIX-EDIT $base")
    val f = Winnow.fingerprints(d, "doc_id", "text")
    val byDoc = f.collect().groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet)
    val shared = byDoc(1L) intersect byDoc(2L)
    // winnowing (unlike a single global min) keeps LOCAL minima, so the
    // shifted copy re-selects the interior spans' fingerprints
    assert(shared.nonEmpty, "shifted copy must share interior fingerprints")
  }

  test("documents shorter than k+w-1 select nothing") {
    val d = docs(1L -> "0123456789", 2L -> "0123456789a") // 10 < 11, 11 >= 11
    val counts = Winnow.fingerprints(d, "doc_id", "text")
      .groupBy("doc_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(!counts.contains(1L), "10-char doc has no full hash window")
    assert(counts(2L) == 1L, "11-char doc has exactly one full window")
  }

  test("hot boilerplate fingerprints are dropped by the bucket cap") {
    val boiler = "COMMON-LICENSE-HEADER-EVERYWHERE"
    val d = docs((1L to 6L).map(i => i -> s"$boiler unique tail $i " * 2): _*)
    val fps = Winnow.fingerprints(d, "doc_id", "text")
    // cap below the 6-doc boilerplate bucket: pairs driven ONLY by the
    // header must disappear
    val capped = Winnow.substringPairs(fps, "doc_id", minShared = 1,
      maxBucket = 5)
    val uncapped = Winnow.substringPairs(fps, "doc_id", minShared = 1,
      maxBucket = 1000)
    assert(uncapped.count() == 15L, "all 15 pairs share the header uncapped")
    assert(capped.count() < 15L, "the cap must drop header-only pairs")
  }

  test("Spark selection equals the JVM reference (transfers WinnowLaws)") {
    val rnd = new scala.util.Random(42)
    val texts = (1L to 30L).map { i =>
      val n = rnd.nextInt(120)
      i -> (1 to n).map(_ => "abcdeé中 ".charAt(rnd.nextInt(8))).mkString
    }
    val got = Winnow.fingerprints(docs(texts: _*), "doc_id", "text")
      .collect().groupBy(_.getLong(0))
      .view.mapValues(_.map(_.getLong(1)).toSet).toMap
    texts.foreach { case (id, t) =>
      val exp = WinnowLaws.select(t)
      assert(got.getOrElse(id, Set.empty[Long]) == exp,
        s"doc $id '${t.take(40)}...' sel mismatch")
    }
  }

  test("selection density is roughly 2/(w+1) of the gram count") {
    val text = (1 to 400).map(i => s"tok$i").mkString(" ")
    val d = docs(1L -> text)
    val nSel = Winnow.fingerprints(d, "doc_id", "text", k = 8, w = 4).count()
    val g = text.length - 7
    // distinct-ing collapses repeats; expect selection within [g/8, g/2]
    assert(nSel > g / 8 && nSel < g / 2,
      s"selected $nSel of $g grams — outside the winnowing density band")
  }
}
