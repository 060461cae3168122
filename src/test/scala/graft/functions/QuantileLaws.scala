package graft.functions

import org.apache.spark.sql.functions.col
import org.scalacheck.{Gen, Prop, Properties, Test}

import graft.SparkSpec

/** Property law for the histogram+cumulative-rank quantile engine: for
  * arbitrary weighted multisets, [[Curation.exactQuantilesWeighted]]
  * equals the sorted-multiset model (smallest value whose cumulative
  * weight reaches ceil(p·W/100)) on every group and percentile. A Spark
  * job per case, so the case count is kept modest.
  */
object QuantileLaws extends Properties("ExactQuantiles") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(12)

  private val rowsGen: Gen[List[(String, Long, Long)]] =
    Gen.nonEmptyListOf(for {
      g <- Gen.oneOf("en", "de")
      v <- Gen.choose(0L, 30L)
      w <- Gen.choose(1L, 5L)
    } yield (g, v, w))

  private val pctGen = Gen.choose(1, 100)

  private def model(rows: Seq[(Long, Long)], p: Int): Long = {
    val sorted = rows.sortBy(_._1)
    val total = sorted.map(_._2).sum
    val rank = (total * p + 99) / 100
    var cum = 0L
    sorted.find { case (_, w) => cum += w; cum >= rank }
      .map(_._1).getOrElse(sorted.last._1)
  }

  property("weighted quantile == sorted-multiset model") =
    Prop.forAllNoShrink(rowsGen, pctGen) { (rows, p) =>
      val spark = SparkSpec.spark
      import spark.implicits._
      val df = rows.toDF("g", "v", "w")
      val got = Curation.exactQuantilesWeighted(df, "g", "v", col("w"), Seq(p))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      rows.groupBy(_._1).forall { case (g, rs) =>
        got(g) == model(rs.map(t => (t._2, t._3)), p)
      }
    }
}
