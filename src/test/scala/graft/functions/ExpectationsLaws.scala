package graft.functions

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

import graft.SparkSpec

/** ScalaCheck laws for the one-pass expectations gate against a direct
  * in-memory evaluation of the same constraints.
  */
object ExpectationsLaws extends Properties("Expectations") {
  import Expectations._

  override def overrideParameters(p: org.scalacheck.Test.Parameters): org.scalacheck.Test.Parameters =
    p.withMinSuccessfulTests(12)

  private lazy val spark = SparkSpec.spark
  import spark.implicits._

  private val genRows: Gen[List[(Option[String], Long)]] =
    Gen.listOf(Gen.zip(
      Gen.option(Gen.oneOf("en", "de", "xx", "yy")),
      Gen.choose(-50L, 150L)))

  property("one-pass report == direct per-check evaluation") =
    forAll(genRows) { rows =>
      val df = rows.map { case (l, v) => (l.orNull, v) }.toDF("lang", "len")
      val checks = Seq(
        Complete("lang", 8000),
        InSet("lang", Seq("en", "de"), 2500),
        InRange("len", 0, 100, 5000),
        MinCount(3))
      val got = report(df, checks).collect()
        .map(r => r.getString(0) -> ((r.getLong(1), r.getBoolean(3)))).toMap

      val n = rows.size.toLong
      val langs = rows.flatMap(_._1)
      def bp(x: Long, of: Long) = if (of == 0) 10000L else x * 10000L / of
      // violation ratios define the empty denominator as ZERO violations
      def violBp(x: Long, of: Long) = if (of == 0) 0L else x * 10000L / of
      val completeBp = bp(langs.size.toLong, n)
      val inSetViol = violBp(langs.count(l => l != "en" && l != "de").toLong,
        langs.size.toLong)
      val rangeViol = violBp(rows.count(r => r._2 < 0 || r._2 > 100).toLong, n)

      got("complete(lang)>=8000") == ((completeBp, completeBp >= 8000)) &&
        got("in_set(lang)<=2500") == ((inSetViol, inSetViol <= 2500)) &&
        got("in_range(len,0,100)<=5000") == ((rangeViol, rangeViol <= 5000)) &&
        got("count>=3") == ((n, n >= 3))
    }
}
