package graft.functions

import graft.SparkSpec

/** Posting construction: hand tf/first_pos, tokenizer agreement with
  * BM25 (lowercasing both sides), vocabulary restriction.
  */
class PostingsSpec extends SparkSpec {
  import SparkSpec.spark.implicits._

  private def docs = Seq(
    (1L, "Dup scan dup other dup"),
    (2L, "  vector  "),
    (3L, "nothing matches here")
  ).toDF("doc_id", "text")

  test("tf and 1-based first position per (term, doc)") {
    val out = Postings.forTerms(docs, "doc_id", "text",
        Seq("dup", "vector", "scan"))
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    assert(out == Map(
      ("dup", 1L) -> (3L, 1L),   // "Dup" lowercases; positions 1,3,5
      ("scan", 1L) -> (1L, 2L),
      ("vector", 2L) -> (1L, 1L))) // trim kills the padding
  }

  test("uppercase query terms normalize like the documents") {
    val out = Postings.forTerms(docs, "doc_id", "text", Seq("DUP"))
      .collect()
    assert(out.length == 1 && out(0).getLong(2) == 3L)
  }

  test("empty vocabulary is rejected") {
    intercept[IllegalArgumentException] {
      Postings.forTerms(docs, "doc_id", "text", Nil)
    }
  }
}
