package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class NGramLmSpec extends SparkSpec {

  private def docs(rows: (Long, String)*) = {
    val s = spark; import s.implicits._
    rows.toDF("doc_id", "text")
  }

  test("bigram generation: adjacent pairs, <2-token docs excluded") {
    val bg = NGramLm.bigrams(
      docs(1L -> "a b c", 2L -> "x", 3L -> "p q"), "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      .toSet
    assert(bg === Set((1L, "a", "b"), (1L, "b", "c"), (3L, "p", "q")))
  }

  test("add-one smoothed probabilities sum to 1 over the vocabulary") {
    // For any seen history w1: Σ_{w2 ∈ V} (c(w1,w2)+1)/(hist(w1)+V) = 1
    // exactly, because Σ c = hist(w1) and |V| terms each add 1/(hist+V).
    val d = docs(1L -> "a b a b c", 2L -> "b a b b a")
    val bg = NGramLm.bigrams(d, "doc_id", "text")
    val bc = bg.groupBy("w1", "w2").count()
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    val vocab = Set("a", "b", "c")
    val hist = bc.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    for (w1 <- hist.keys) {
      val total = vocab.toSeq.map { w2 =>
        BigDecimal(bc.getOrElse((w1, w2), 0L) + 1) /
          BigDecimal(hist(w1) + vocab.size)
      }.sum
      assert(total === BigDecimal(1), s"history $w1")
    }
  }

  test("score matches a hand-rolled reference model") {
    val d = docs(1L -> "a b a", 2L -> "b a b", 3L -> "a a b")
    // corpus bigrams: (a,b)x3 [1:ab, 2:ab? ...] — compute by hand:
    // doc1: (a,b),(b,a); doc2: (b,a),(a,b); doc3: (a,a),(a,b)
    val c2 = Map(("a", "b") -> 3L, ("b", "a") -> 2L, ("a", "a") -> 1L)
    val hist = Map("a" -> 4L, "b" -> 2L)
    val v = 2 // vocabulary {a, b}
    def logp(w1: String, w2: String): Double =
      math.log((c2.getOrElse((w1, w2), 0L) + 1).toDouble /
        (hist(w1) + v).toDouble)
    def expect(pairs: (String, String)*): Double = {
      val micros = pairs.map(p => math.round(logp(p._1, p._2) * 1e6))
      val avg = micros.sum.toDouble / 1e6 / pairs.size
      BigDecimal(avg).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val out = NGramLm.score(d, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(out(1L) === ((2L, expect(("a", "b"), ("b", "a")))))
    assert(out(2L) === ((2L, expect(("b", "a"), ("a", "b")))))
    assert(out(3L) === ((2L, expect(("a", "a"), ("a", "b")))))
  }

  test("a formulaic doc scores higher than one full of unseen bigrams") {
    val common = (1L to 8L).map(i => i -> "the quick brown fox jumps")
    val weird = 9L -> "fox the jumps brown quick"
    val out = NGramLm.score(docs(common :+ weird: _*), "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(out(1L) > out(9L))
  }

  test("buckets split distinct scores into exact tertiles") {
    // 9 docs engineered to 9 distinct scores via different repetition
    // counts of formulaic vs novel text — tertile buckets get 3 each
    val d = docs((1L to 9L).map { i =>
      val rep = ("w" + i + " ") * 3
      i -> (("the cat sat " * i.toInt) + rep).trim
    }: _*)
    val out = NGramLm.buckets(d, "doc_id", "text")
    val counts = out.groupBy("bucket").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out.select(countDistinct(col("avg_logp"))).head().getLong(0) === 9L)
    assert(counts === Map("tail" -> 3L, "middle" -> 3L, "head" -> 3L))
    // bucket assignment is monotone in the score
    val rows = out.collect().map(r => r.getDouble(1) -> r.getString(2))
    val maxTail = rows.filter(_._2 == "tail").map(_._1).max
    val middle = rows.filter(_._2 == "middle").map(_._1)
    val minHead = rows.filter(_._2 == "head").map(_._1).min
    assert(middle.forall(s => s > maxTail && s < minHead))
  }

  test("backoffScore: hand-traced levels and micro-nat arithmetic") {
    // train "a b c a b d": trigrams {abc,bca,cab,abd}, bigrams ab:2
    // bc/ca/bd:1, unigrams a:2 b:2 c:1 d:1, N=6, V=4
    val train = docs(1L -> "a b c a b d")
    val eval = docs(11L -> "a b c x", 13L -> "x b c")
    val out = NGramLm.backoffScore(train, eval, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getDouble(5))).toMap
    // doc 11: (a,b,c) seen → p = 1/2; (b,c,x) unseen trigram AND unseen
    // bigram (c,x) → unigram floor p = 0.25·(0+1)/(6+4) = 0.025
    //   m = round(ln(0.5)e6) + round(ln(0.025)e6) = -693147 + -3688879
    assert(out(11L) == (2L, 1L, 0L, 1L, -2.191))
    // doc 13: (x,b,c): trigram unseen, bigram (b,c) seen →
    //   p = 0.5·1/c1(b)=2 → 0.25 → avg -1.3863
    assert(out(13L) == (1L, 0L, 1L, 0L, -1.3863))
  }

  test("backoffScore on training text itself never backs off") {
    val train = docs(1L -> "a b c d e f g")
    val out = NGramLm.backoffScore(train, train, "doc_id", "text")
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(out.toSeq == Seq((5L, 5L, 0L, 0L)))
  }
}
