package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class CurationConfigSpec extends SparkSpec {
  import SparkSpec.spark.implicits._

  private val conf =
    """curation {
      |  text-col: text
      |  min-tokens: 5
      |  min-distinct-pct: 30
      |  decont-shingle: 3
      |  max-bucket: 50
      |  sample-rates-bp { en: 10000, de: 10000, default: 10000 }
      |}""".stripMargin

  private def corpus = (0 until 60).map { i =>
    val toks = (0 until 12).map(j => s"w${(i * 5 + j) % 40}")
    (i.toLong, toks.mkString(" "), if (i % 2 == 0) "en" else "de", s"s${i % 3}")
  }.toDF("doc_id", "text", "lang", "source")

  private def eval = Seq((9000L, "w1 w2 w3 w4 w5 w6"))
    .toDF("doc_id", "text")

  test("parse fills defaults and reads the rate table") {
    val s = CurationConfig.parse(conf)
    assert(s.minTokens == 5 && s.maxBucket == 50 && s.decontShingle == 3)
    assert(s.sampleRatesBp == Seq("de" -> 10000L, "en" -> 10000L))
    assert(s.defaultRateBp == 10000L)
    val d = CurationConfig.parse("curation { }")
    assert(d.minTokens == 30 && d.textCol == "text" &&
      d.defaultRateBp == 10000L)
  }

  test("config-driven run is identical to the code-driven call") {
    val spec = CurationConfig.parse(conf)
    val viaConfig = CurationConfig.run(corpus, eval, spec)
    val viaCode = CurationPipeline.curate(corpus, eval,
      minTokens = 5, minDistinctPct = 30, decontShingle = 3,
      sampleRateBp = lit(10000L), maxBucket = 50)
    try {
      assert(viaConfig.kept.select("doc_id").as[Long].collect().sorted.toSeq ==
        viaCode.kept.select("doc_id").as[Long].collect().sorted.toSeq)
      assert(viaConfig.ledger().map(_._2) == viaCode.ledger().map(_._2))
    } finally { viaConfig.release(); viaCode.release() }
  }

  test("rates route by language with the default as fallback") {
    val s = CurationConfig.parse(
      """curation { sample-rates-bp { en: 2, default: 7 } }""")
    val rates = Seq("en", "zz").toDF("lang")
      .select(s.rateColumn(col("lang"))).as[Long].collect().toSeq
    assert(rates == Seq(2L, 7L))
  }

  test("missing curation block fails loudly") {
    intercept[IllegalArgumentException] {
      CurationConfig.parse("something-else { }")
    }
  }
}
