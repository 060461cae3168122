package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.core.HoconLite

/** Config-declared curation pipeline — the reference's declarative
  * philosophy (entities/families/transformations in HOCON,
  * reference: ConfigRepository) extended to the LLM-curation layer, so a
  * pipeline operator tunes gates/rates/caps in config instead of code:
  *
  * {{{
  * curation {
  *   text-col: text
  *   min-tokens: 30
  *   min-distinct-pct: 35
  *   decont-shingle: 4
  *   max-bucket: 200
  *   sample-rates-bp { en: 8000, de: 5000, fr: 2500, default: 1000 }
  * }
  * }}}
  *
  * [[run]] lowers the spec onto [[CurationPipeline.curate]] — the config
  * layer adds ZERO execution machinery (same plan, same drop ledger),
  * only a parsed parameterization, which is what keeps it honest: a
  * config-driven run is bit-identical to the equivalent code-driven one
  * (CurationConfigSpec pins this).
  */
object CurationConfig {

  final case class Spec(
      textCol: String,
      minTokens: Int,
      minDistinctPct: Int,
      decontShingle: Int,
      maxBucket: Int,
      sampleRatesBp: Seq[(String, Long)],
      defaultRateBp: Long) {

    /** The per-language rate column the spec's table compiles to. */
    def rateColumn(langCol: Column): Column =
      sampleRatesBp.foldLeft(null.asInstanceOf[Column]) { (acc, kv) =>
        val (lang, bp) = kv
        if (acc == null) when(langCol === lang, lit(bp))
        else acc.when(langCol === lang, lit(bp))
      } match {
        case null => lit(defaultRateBp)
        case c    => c.otherwise(lit(defaultRateBp))
      }
  }

  def parse(hocon: String): Spec = {
    val top = HoconLite.parse(hocon)
    require(top.contains("curation"), "missing `curation { ... }` block")
    val root = HoconLite.obj(top("curation"))
    def int(k: String, dflt: Int): Int =
      root.get(k).map(v => HoconLite.str(v).toInt).getOrElse(dflt)
    val rates = HoconLite.obj(root.getOrElse("sample-rates-bp", Map.empty))
    val (dflt, langs) = rates.partition(_._1 == "default")
    Spec(
      textCol = root.get("text-col").map(HoconLite.str).getOrElse("text"),
      minTokens = int("min-tokens", 30),
      minDistinctPct = int("min-distinct-pct", 35),
      decontShingle = int("decont-shingle", 4),
      maxBucket = int("max-bucket", BucketedPairs.DefaultMaxBucket),
      sampleRatesBp = langs.toSeq.sortBy(_._1)
        .map { case (k, v) => k -> HoconLite.str(v).toLong },
      defaultRateBp = dflt.headOption
        .map { case (_, v) => HoconLite.str(v).toLong }.getOrElse(10000L))
  }

  /** Execute the declared pipeline (see [[CurationPipeline.curate]]). */
  def run(docs: DataFrame, eval: DataFrame, spec: Spec): CurationPipeline.Result =
    CurationPipeline.curate(docs, eval,
      textCol = spec.textCol,
      minTokens = spec.minTokens,
      minDistinctPct = spec.minDistinctPct,
      decontShingle = spec.decontShingle,
      sampleRateBp = spec.rateColumn(col("lang")),
      maxBucket = spec.maxBucket)
}
