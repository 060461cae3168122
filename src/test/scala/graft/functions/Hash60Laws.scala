package graft.functions

import org.scalacheck.{Prop, Properties}

/** Property laws for the [[Hash60]] digest-byte kernel: bit-equality with
  * the md5-hex formula (`parseLong(hex.take(15), 16)`) on arbitrary
  * unicode strings — the JVM-side contract backing the Spark/DuckDB
  * cross-engine equality pinned in `Hash60Spec`.
  */
object Hash60Laws extends Properties("Hash60") {

  private def viaHex(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8")).take(8)
      .map(b => f"${b & 0xff}%02x").mkString
    java.lang.Long.parseLong(hex.take(15), 16)
  }

  property("digest60 == md5-hex prefix parse") = Prop.forAll { (s: String) =>
    Hash60.digest60(s.getBytes("UTF-8")) == viaHex(s)
  }

  property("range [0, 2^60)") = Prop.forAll { (s: String) =>
    val v = Hash60.digest60(s.getBytes("UTF-8"))
    v >= 0L && v < (1L << 60)
  }
}
