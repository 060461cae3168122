package graft.functions

import java.security.MessageDigest

import org.scalacheck.{Gen, Prop, Properties}

/** Property laws for the [[DsirBuckets60Expr]] / [[Segment60Expr]] byte
  * kernels vs the JVM model of their columnar formulas, over arbitrary
  * unicode and whitespace-heavy strings — the same contract family as
  * [[ShingleHash60Laws]], extended with the salt prefix, the bucket
  * modulus, and the ragged-tail stride.
  */
object DsirSegmentLaws extends Properties("DsirSegment60") {

  private def toks(s: String): Array[String] = {
    var lo = 0
    var hi = s.length
    while (lo < hi && s.charAt(lo) == ' ') lo += 1
    while (hi > lo && s.charAt(hi - 1) == ' ') hi -= 1
    val t = s.substring(lo, hi)
    if (t.isEmpty) Array("") else t.split("\\s+", -1)
  }

  private def h60(s: String): Long = {
    val d = MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
    var v = 0L
    var b = 0
    while (b < 8) { v = (v << 8) | (d(b) & 0xffL); b += 1 }
    v >>> 4
  }

  private def dsirModel(s: String, salt: String, b: Int): Seq[Long] = {
    val t = toks(s)
    val uni = t.toSeq.map(x => h60(salt + x) % b)
    val big = t.toSeq.sliding(2).filter(_.size == 2)
      .map(w => h60(salt + w.mkString(" ")) % b).toSeq
    if (t.length >= 2) uni ++ big else uni
  }

  private def segModel(s: String, salt: String, n: Int): Seq[Long] = {
    val t = toks(s)
    t.grouped(n).map(g => h60(salt + g.mkString(" "))).toSeq
  }

  private def dsirKernel(s: String, salt: String, b: Int): Seq[Long] =
    ShingleHash60.dsirBuckets(s.getBytes("UTF-8"),
      salt.getBytes("UTF-8"), b).toLongArray().toSeq

  private def segKernel(s: String, salt: String, n: Int): Seq[Long] =
    ShingleHash60.segmentHashes(s.getBytes("UTF-8"),
      salt.getBytes("UTF-8"), n).toLongArray().toSeq

  private val wsHeavy: Gen[String] = Gen.listOf(Gen.oneOf(
    ' ', '\t', '\n', '', '\f', '\r', 'a', 'b', '中', 'é')).map(_.mkString)

  private val bGen = Gen.oneOf(7, 64, 1024)
  private val nGen = Gen.choose(1, 4)

  property("dsir kernel == salted uni+bigram model (arbitrary strings)") =
    Prop.forAll(Gen.asciiPrintableStr, bGen) { (s, b) =>
      dsirKernel(s, "dsir:", b) == dsirModel(s, "dsir:", b)
    }

  property("dsir kernel == model (unicode)") =
    Prop.forAll { (s: String) =>
      dsirKernel(s, "dsir:", 1024) == dsirModel(s, "dsir:", 1024)
    }

  property("dsir kernel == model (whitespace-heavy)") =
    Prop.forAll(wsHeavy, bGen) { (s, b) =>
      dsirKernel(s, "dsir:", b) == dsirModel(s, "dsir:", b)
    }

  property("segment kernel == grouped model (arbitrary strings)") =
    Prop.forAll(Gen.asciiPrintableStr, nGen) { (s, n) =>
      segKernel(s, "seg:", n) == segModel(s, "seg:", n)
    }

  property("segment kernel == model (whitespace-heavy)") =
    Prop.forAll(wsHeavy, nGen) { (s, n) =>
      segKernel(s, "seg:", n) == segModel(s, "seg:", n)
    }

  property("segment count is ceil(m/n)") =
    Prop.forAll(Gen.asciiPrintableStr, nGen) { (s, n) =>
      val m = toks(s).length
      segKernel(s, "seg:", n).size == (m + n - 1) / n
    }
}
