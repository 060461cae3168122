package graft.functions

import org.scalacheck.{Gen, Prop, Properties}

/** Property laws for the winnowing scheme against a pure-JVM reference
  * of the same selection (md5-60 gram hashes, sliding-w minima, full
  * windows, distinct). [[WinnowSpec]] separately pins the Spark
  * expression pipeline to this reference, so the laws transfer.
  */
object WinnowLaws extends Properties("Winnow") {

  private val K = 8
  private val W = 4

  /** JVM reference selection — mirrors `Winnow.fingerprints` (1-based
    * SQL substring becomes 0-based substring here).
    */
  private[functions] def select(text: String, k: Int = K, w: Int = W): Set[Long] = {
    val g = text.length - k + 1
    if (g < w) Set.empty
    else {
      val hs = Array.tabulate(g)(i =>
        Hash60.digest60(text.substring(i, i + k).getBytes("UTF-8")))
      (0 to g - w).map(j => {
        var m = Long.MaxValue
        var t = j
        while (t < j + w) { if (hs(t) < m) m = hs(t); t += 1 }
        m
      }).toSet
    }
  }

  private val chunk: Gen[String] =
    Gen.chooseNum(0, 24).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf(('a' to 'z') :+ ' ' :+ 'é' :+ '中')).map(_.mkString))

  property("a shared span of k+w-1 chars yields a shared fingerprint") =
    Prop.forAll(chunk, chunk, chunk, chunk,
      Gen.listOfN(K + W - 1, Gen.alphaNumChar).map(_.mkString)) {
      (p1, s1, p2, s2, span) =>
        val a = p1 + span + s1
        val b = p2 + span + s2
        (select(a) intersect select(b)).nonEmpty
    }

  property("every fingerprint is the hash of one of the text's k-grams") =
    Prop.forAll(chunk, chunk) { (a, b) =>
      val text = a + b
      val grams = (0 to text.length - K)
        .map(i => Hash60.digest60(text.substring(i, i + K).getBytes("UTF-8")))
        .toSet
      select(text).subsetOf(grams)
    }

  property("selection density stays within the winnowing band") =
    Prop.forAll(Gen.listOfN(400, Gen.alphaNumChar).map(_.mkString)) { text =>
      val g = text.length - K + 1
      val n = select(text).size
      // ~2/(w+1) expected; distinct-ing collapses repeats
      n >= g / 8 && n <= g / 2 + 1
    }

  property("short texts select nothing, k+w-1 selects exactly one") =
    Prop.forAll(Gen.listOfN(K + W - 2, Gen.alphaChar).map(_.mkString)) { s =>
      select(s).isEmpty && select(s + "x").size == 1
    }
}
