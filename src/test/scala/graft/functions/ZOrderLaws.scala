package graft.functions

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

import graft.SparkSpec

/** ScalaCheck laws for the Morton-layout kernels: the codegen'd
  * magic-number chain against the bit-by-bit reference, and tile-cover
  * completeness for arbitrary boxes.
  */
object ZOrderLaws extends Properties("ZOrder") {

  override def overrideParameters(p: org.scalacheck.Test.Parameters): org.scalacheck.Test.Parameters =
    p.withMinSuccessfulTests(20)

  private lazy val spark = SparkSpec.spark
  import spark.implicits._

  private val dim = Gen.choose(0L, 65535L)

  property("column zkey == bit-by-bit reference on random 16-bit pairs") =
    forAll(Gen.listOfN(24, Gen.zip(dim, dim))) { pts =>
      val got = pts.toDF("x", "y")
        .select(ZOrder.zkey($"x", $"y")).as[Long].collect().toSeq
      got == pts.map { case (x, y) => ZOrder.interleaveRef(x, y) }
    }

  property("zkey is injective on the 16-bit grid (deinterleave recovers)") =
    forAll(dim, dim) { (x, y) =>
      val z = ZOrder.interleaveRef(x, y)
      var (rx, ry) = (0L, 0L)
      (0 until 16).foreach { i =>
        rx |= ((z >> (2 * i)) & 1L) << i
        ry |= ((z >> (2 * i + 1)) & 1L) << i
      }
      rx == x && ry == y
    }

  property("boxTiles covers the tile of every in-box point") = {
    val bound = Gen.choose(0L, 255L)
    forAll(bound, bound, bound, bound, Gen.oneOf(2, 4, 6, 8)) {
      (a, b, c, d, shift) =>
        val (xLo, xHi) = (a min b, a max b)
        val (yLo, yHi) = (c min d, c max d)
        val tiles = ZOrder.boxTiles(xLo, xHi, yLo, yHi, shift).toSet
        val k = shift / 2
        // sample points across the box incl. corners
        val pts = for {
          x <- Seq(xLo, xHi, (xLo + xHi) / 2)
          y <- Seq(yLo, yHi, (yLo + yHi) / 2)
        } yield (x, y)
        pts.forall { case (x, y) =>
          tiles.contains(ZOrder.interleaveRef(x >> k, y >> k))
        }
    }
  }
}
