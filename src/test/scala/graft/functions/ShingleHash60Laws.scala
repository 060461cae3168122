package graft.functions

import java.security.MessageDigest

import org.scalacheck.{Gen, Prop, Properties}

/** Property laws for the [[ShingleHash60]] byte kernel vs the JVM model
  * of the columnar formula: tokens via `split(trim(s), "\\s+")` with Java
  * limit -1, windows of n, md5 of the space-joined shingle string, first
  * 60 bits — over arbitrary unicode and whitespace-heavy strings and
  * n in 1..4.
  */
object ShingleHash60Laws extends Properties("ShingleHash60") {

  private def model(s: String, n: Int): Seq[Long] = {
    var lo = 0
    var hi = s.length
    while (lo < hi && s.charAt(lo) == ' ') lo += 1
    while (hi > lo && s.charAt(hi - 1) == ' ') hi -= 1
    val t = s.substring(lo, hi)
    val toks = if (t.isEmpty) Array("") else t.split("\\s+", -1)
    (0 to toks.length - n).map { i =>
      val shingle = toks.slice(i, i + n).mkString(" ")
      val d = MessageDigest.getInstance("MD5").digest(shingle.getBytes("UTF-8"))
      var v = 0L
      var b = 0
      while (b < 8) { v = (v << 8) | (d(b) & 0xffL); b += 1 }
      v >>> 4
    }
  }

  private def kernel(s: String, n: Int): Seq[Long] =
    ShingleHash60.hashes(s.getBytes("UTF-8"), n).toLongArray().toSeq

  private val wsHeavy: Gen[String] = Gen.listOf(Gen.oneOf(
    ' ', '\t', '\n', '\u000b', '\f', '\r', 'a', 'b', '中', 'é')).map(_.mkString)

  private val nGen = Gen.choose(1, 4)

  property("kernel == split+md5 model (arbitrary strings)") =
    Prop.forAll(Gen.asciiPrintableStr, nGen) { (s, n) =>
      kernel(s, n) == model(s, n)
    }

  property("kernel == split+md5 model (unicode)") =
    Prop.forAll { (s: String) => kernel(s, 3) == model(s, 3) }

  property("kernel == split+md5 model (whitespace-heavy)") =
    Prop.forAll(wsHeavy, nGen) { (s, n) => kernel(s, n) == model(s, n) }
}
