package graft.functions

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

import graft.SparkSpec

/** ScalaCheck laws for the Bloom prefilter: the composition law (the
  * prefiltered join equals the plain join) and the no-false-negative
  * guarantee, over random key universes, selectivities and fpp targets.
  */
object BloomJoinLaws extends Properties("BloomJoin") {

  override def overrideParameters(p: org.scalacheck.Test.Parameters): org.scalacheck.Test.Parameters =
    p.withMinSuccessfulTests(12)

  private lazy val spark = SparkSpec.spark
  import spark.implicits._

  private val genCase = for {
    n <- Gen.choose(50, 400)
    step <- Gen.choose(2, 40)
    fpp <- Gen.oneOf(0.01, 0.05, 0.2)
  } yield (n, step, fpp)

  property("prefiltered join == plain join (any universe/selectivity/fpp)") =
    forAll(genCase) { case (n, step, fpp) =>
      val probe = (1L to n.toLong).map(i => (i, i * 31 % 7)).toDF("k", "v")
      val build = (1L to n.toLong by step.toLong).map(i => Tuple1(i)).toDF("bk")
      val plain = probe.join(build, probe("k") === build("bk"))
        .select("k").as[Long].collect().sorted.toSeq
      val pre = BloomJoin.join(probe, "k", build, "bk", fpp = fpp)
        .select("k").as[Long].collect().sorted.toSeq
      pre == plain
    }

  property("no false negatives: every build key survives the prefilter") =
    forAll(genCase) { case (n, step, fpp) =>
      val probe = (1L to n.toLong).map(Tuple1(_)).toDF("k")
      val build = (1L to n.toLong by step.toLong).map(Tuple1(_)).toDF("bk")
      val kept = BloomJoin.prefilter(probe, "k", build, "bk", fpp = fpp)
        .as[Long].collect().toSet
      val keys = build.as[Long].collect().toSet
      keys.subsetOf(kept)
    }
}
