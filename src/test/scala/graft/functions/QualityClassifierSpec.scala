package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class QualityClassifierSpec extends SparkSpec {
  import SparkSpec.spark.implicits._

  // two disjoint vocabularies: "good" docs speak alpha, "bad" speak beta
  private def corpus(n: Int) = (0 until n).map { i =>
    val good = i % 2 == 0
    val toks = (0 until 12).map(j =>
      if (good) s"alpha${(i + j) % 7}" else s"beta${(i + j) % 7}")
    (i.toLong, toks.mkString(" "), good)
  }.toDF("id", "text", "good")

  test("generalizes to held-out docs (train on first half, score second)") {
    val docs = corpus(200)
    val m = QualityClassifier.train(
      docs.filter($"id" < 100), "text", $"good")
    val held = QualityClassifier.withScores(
      docs.filter($"id" >= 100), "text", m)
    val wrong = held.filter($"pred_pos" =!= $"good").count()
    assert(wrong == 0, s"$wrong of 100 held-out docs misclassified")
  }

  test("scores are partitioning-invariant exact integers") {
    val docs = corpus(80)
    val m = QualityClassifier.train(docs, "text", $"good")
    val a = QualityClassifier.withScores(docs, "text", m)
      .select("id", "score_micros").as[(Long, Long)].collect().toMap
    val b = QualityClassifier.withScores(docs.repartition(13), "text", m)
      .select("id", "score_micros").as[(Long, Long)].collect().toMap
    assert(a == b)
  }

  test("prior shifts every score uniformly") {
    val docs = corpus(40)
    val m = QualityClassifier.train(docs, "text", $"good")
    val shifted = m.copy(priorMicros = m.priorMicros + 500000L)
    val base = QualityClassifier.withScores(docs, "text", m)
      .select("id", "score_micros").as[(Long, Long)].collect().toMap
    val up = QualityClassifier.withScores(docs, "text", shifted)
      .select("id", "score_micros").as[(Long, Long)].collect().toMap
    assert(up == base.map { case (k, v) => k -> (v + 500000L) })
  }

  test("imbalanced labels push the prior toward the majority class") {
    val docs = corpus(100)
    val skewPos = QualityClassifier.train(docs, "text", $"id" < 90).priorMicros
    val skewNeg = QualityClassifier.train(docs, "text", $"id" < 10).priorMicros
    assert(skewPos > 0 && skewNeg < 0 && skewPos > skewNeg)
  }
}
