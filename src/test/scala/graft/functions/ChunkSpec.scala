package graft.functions

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

import graft.SparkSpec

/** Chunking laws: the in-row prefix-sum plan must agree with a plain
  * Scala reference fold on arbitrary corpora, and satisfy the structural
  * invariants (first chunk id 0, conserved token/char totals).
  */
object ChunkLaws extends Properties("Chunk") {

  // each sample runs Spark jobs; keep the count modest
  override def overrideParameters(p: org.scalacheck.Test.Parameters): org.scalacheck.Test.Parameters =
    p.withMinSuccessfulTests(10)

  private lazy val spark = SparkSpec.spark

  private val wordGen = Gen.chooseNum(1, 14).flatMap(n =>
    Gen.stringOfN(n, Gen.alphaLowerChar))
  private val docGen = Gen.chooseNum(1, 60).flatMap(n =>
    Gen.listOfN(n, wordGen).map(_.mkString(" ")))

  /** The definition, folded sequentially. */
  private def reference(text: String, budget: Int): Map[Long, (Long, Long)] = {
    var before = 0L
    text.trim.split("\\s+").toSeq
      .foldLeft(Map.empty[Long, (Long, Long)]) { (acc, t) =>
        val id = before / budget
        before += t.length
        val (n, c) = acc.getOrElse(id, (0L, 0L))
        acc.updated(id, (n + 1, c + t.length))
      }
  }

  property("in-row plan == sequential reference fold") =
    forAll(Gen.listOfN(6, docGen), Gen.chooseNum(5, 50)) {
      (docs: List[String], budget: Int) =>
        import spark.implicits._
        val df = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
          .toDF("doc_id", "text")
        val got = Chunk.byCharBudget(df, "doc_id", "text", budget)
          .collect()
          .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3)))
          .toMap
        val want = docs.zipWithIndex.flatMap { case (t, i) =>
          reference(t, budget).map { case (cid, v) => (i.toLong, cid) -> v }
        }.toMap
        got == want
    }

  property("first chunk is 0 and totals are conserved") =
    forAll(docGen, Gen.chooseNum(10, 40)) { (doc: String, budget: Int) =>
      import spark.implicits._
      val chunks = Chunk.byCharBudget(
        Seq((1L, doc)).toDF("doc_id", "text"), "doc_id", "text", budget)
        .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
      val toks = doc.trim.split("\\s+")
      chunks.map(_._1).min == 0L &&
        chunks.map(_._2).sum == toks.length.toLong &&
        chunks.map(_._3).sum == toks.map(_.length.toLong).sum
    }
}
