package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.SparkSpec.spark.implicits._

/** Pins [[Shingle60Expr]] (single-byte-scan window hashing) bit-equal to
  * the columnar formula it replaces — shingle strings via
  * split/transform/concat_ws, hashed with the md5-hex reference — over
  * ASCII, unicode, whitespace-edge and short/empty documents, and checks
  * the expression stays inside whole-stage codegen.
  */
final class ShingleHash60Spec extends SparkSpec {

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "a b"),                        // fewer tokens than n
    (3L, ""),                           // empty
    (4L, "   "),                        // spaces only
    (5L, "\ttab lead and trail\t"),     // non-space ws at ends
    (6L, "élève 中文 😀 tokens here"),   // unicode
    (7L, "  double  spaced  words  "),
    (8L, (1 to 50).map(i => s"t$i").mkString(" "))
  ).toDF("doc_id", "text")

  private def hashSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("native shingle hashes equal the columnar formula (n = 1, 2, 3)") {
    for (n <- 1 to 3) {
      val native = hashSet(docs.select(col("doc_id"),
        explode(ShingleHash60.column(col("text"), n)).as("h")))
      val columnar = hashSet(
        MinHashLsh.shingles(docs, "text", n, dedupe = false)
          .select(col("doc_id"),
            MinHashLsh.hash60Reference(col("shingle")).as("h")))
      assert(native == columnar, s"mismatch at n=$n")
    }
  }

  test("hashedShingles is the distinct of the native expression") {
    val viaHelper = hashSet(MinHashLsh.hashedShingles(docs, "text", 3))
    val manual = hashSet(docs.select(col("doc_id"),
      explode(ShingleHash60.column(col("text"), 3)).as("h")).distinct())
    assert(viaHelper == manual)
  }

  test("shingle hashing stays inside whole-stage codegen") {
    val plan = spark.range(100)
      .select(ShingleHash60.column(concat(lit("doc tok "), col("id")), 3).as("hs"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [graft_shingle60"), plan)
  }
}
