package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Reciprocal-rank fusion: exact integer scores, absence handling,
  * multi-list agreement beating any single first place, deterministic
  * tiebreak, and input validation.
  */
class RrfSpec extends SparkSpec {
  import SparkSpec.spark.implicits._

  // kw: docs 10,20,30 at ranks 1,2,3 — vec: 20,30,40 at ranks 1,2,3
  private def kw = Seq((10L, 1L), (20L, 2L), (30L, 3L)).toDF("doc_id", "rk")
  private def vec = Seq((20L, 1L), (30L, 2L), (40L, 3L)).toDF("doc_id", "rk")

  private def r(rank: Long): Long = 1000000000L / (60L + rank)

  test("fused scores are exact integer reciprocal sums") {
    val out = Rrf.fuse(Seq("kw" -> kw, "vec" -> vec), "doc_id", 10)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getLong(3)))
    val expected = Seq(
      (20L, 2L, 1L, r(2) + r(1)), // both lists, near top of each
      (30L, 3L, 2L, r(3) + r(2)),
      (10L, 1L, 0L, r(1)),        // kw only — single first place loses
      (40L, 0L, 3L, r(3)))
    assert(out.toSeq == expected, s"got ${out.toSeq}")
    // two-list agreement at ranks (2,1) beats the solo rank-1:
    assert(r(2) + r(1) > r(1))
  }

  test("k truncates after the fused ordering") {
    val out = Rrf.fuse(Seq("kw" -> kw, "vec" -> vec), "doc_id", 2)
      .select("doc_id").as[Long].collect()
    assert(out.toSeq == Seq(20L, 30L))
  }

  test("ties break ascending on id") {
    // two docs present in exactly one list at the same rank
    val a = Seq((7L, 1L)).toDF("doc_id", "rk")
    val b = Seq((3L, 1L)).toDF("doc_id", "rk")
    val out = Rrf.fuse(Seq("a" -> a, "b" -> b), "doc_id", 10)
      .select("doc_id").as[Long].collect()
    assert(out.toSeq == Seq(3L, 7L))
  }

  test("duplicate list names are rejected") {
    intercept[IllegalArgumentException] {
      Rrf.fuse(Seq("x" -> kw, "x" -> vec), "doc_id", 5)
    }
  }

  test("scoreSql floor division matches the engine's div") {
    // spot-check the boundary the integer form exists for: adjacent
    // ranks stay distinguishable deep into the list
    assert(r(999) != r(1000))
    assert(Rrf.scoreSql("kw_rk").contains("// "))
  }
}
