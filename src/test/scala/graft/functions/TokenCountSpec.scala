package graft.functions

import graft.SparkSpec
import graft.SparkSpec.spark.implicits._
import org.apache.spark.sql.functions._

/** Pins [[TokenCountExpr]] (byte-scan counter) equal to the split-based
  * formula `size(split(trim(c), "\\s+"))` the oracles replay — including
  * the awkward edges: empty, all-spaces, interior tabs/newlines (which
  * trim does NOT strip), unicode.
  */
final class TokenCountSpec extends SparkSpec {

  private val samples = Seq(
    "", " ", "   ", "a", " a", "a ", "  a  b  ", "a b c",
    "\ta", "a\t", " \ta\t ", "a\nb", "\t", " \t ",
    "élève 中文 😀 done", "x" * 500,
    "the quick  brown\tfox") ++ (0 until 100).map(i => s"doc $i tail ${"t " * (i % 7)}")

  test("TokenCountExpr equals size(split(trim(c), \\s+)) on all samples") {
    val rows = samples.toDF("s")
      .select(col("s"), TokenCount.column(col("s")).as("fast"),
        size(split(trim(col("s")), "\\s+")).as("ref"))
      .collect()
    assert(rows.length == samples.length)
    rows.foreach { r =>
      assert(r.getInt(1) == r.getInt(2),
        s"mismatch for ${r.getString(0).take(30).replace("\t", "\\t")}")
    }
  }

  test("token count stays inside whole-stage codegen") {
    val plan = spark.range(50)
      .select(TokenCount.column(concat(lit("a b "), col("id"))).as("n"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [graft_token_count"), plan)
  }
}
