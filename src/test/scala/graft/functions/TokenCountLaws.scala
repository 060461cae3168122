package graft.functions

import org.scalacheck.{Gen, Prop, Properties}

/** Property laws for the [[TokenCount]] byte kernel vs the JVM reference
  * semantics of `split(trim(s), "\\s+")` with Java limit -1 (what Spark's
  * `split` does), over arbitrary unicode and whitespace-heavy strings.
  */
object TokenCountLaws extends Properties("TokenCount") {

  private def viaSplit(s: String): Int = {
    var lo = 0
    var hi = s.length
    while (lo < hi && s.charAt(lo) == ' ') lo += 1
    while (hi > lo && s.charAt(hi - 1) == ' ') hi -= 1
    val t = s.substring(lo, hi)
    if (t.isEmpty) 1 else t.split("\\s+", -1).length
  }

  private val wsHeavy: Gen[String] = Gen.listOf(Gen.oneOf(
    ' ', '\t', '\n', '\u000b', '\f', '\r', 'a', 'b', '中', 'é')).map(_.mkString)

  property("kernel == split semantics (arbitrary strings)") =
    Prop.forAll { (s: String) =>
      TokenCount.count(s.getBytes("UTF-8")) == viaSplit(s)
    }

  property("kernel == split semantics (whitespace-heavy)") =
    Prop.forAll(wsHeavy) { s =>
      TokenCount.count(s.getBytes("UTF-8")) == viaSplit(s)
    }
}
