package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.{MinHashLsh, TokenCount}

/** The formula→native optimizer rule: portable spellings of the 60-bit
  * hash and the token count compile to the native expressions, results
  * bit-identical, and near-miss formulas are left alone.
  */
class NativeHashRewriteSpec extends SparkSpec {

  // parquet-backed (NOT a local Seq): ConvertToLocalRelation folds local
  // projections eagerly and the plan degenerates to LocalTableScan,
  // hiding the expression under test
  private lazy val docsPath: String = {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-rw-").toString + "/docs"
    Seq("alpha beta", " padded  text ", "", "\tedge\t", "中文 mixed")
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "s")
      .write.parquet(dir)
    dir
  }

  private def docs = spark.read.parquet(docsPath)

  test("column-API hash formula rewrites to graft_hash60, same values") {
    val q = docs.select(col("id"), MinHashLsh.hash60Reference(col("s")).as("h"))
    assert(q.queryExecution.executedPlan.toString.contains("graft_hash60"),
      q.queryExecution.executedPlan.toString)
    val formula = q.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val native = docs.select(col("id"), MinHashLsh.hash60(col("s")).as("h"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(formula == native)
  }

  test("SQL-text hash formula rewrites too") {
    docs.createOrReplaceTempView("rw_docs")
    try {
      val q = spark.sql(
        "SELECT id, CAST(conv(substring(md5(s), 1, 15), 16, 10) AS BIGINT) AS h " +
          "FROM rw_docs")
      assert(q.queryExecution.executedPlan.toString.contains("graft_hash60"),
        q.queryExecution.executedPlan.toString)
      val got = q.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val native = docs.select(col("id"), MinHashLsh.hash60(col("s")).as("h"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == native)
    } finally spark.catalog.dropTempView("rw_docs")
  }

  test("token-count formula rewrites to graft_token_count, same values") {
    val q = docs.select(col("id"),
      size(split(trim(col("s")), "\\s+")).as("n"))
    assert(q.queryExecution.executedPlan.toString.contains("graft_token_count"),
      q.queryExecution.executedPlan.toString)
    val formula = q.collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val native = docs.select(col("id"), TokenCount.column(col("s")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(formula == native)
  }

  test("near-miss formulas are NOT rewritten") {
    // 14 hex nibbles is a different hash — must stay a conv chain
    val q1 = docs.select(
      expr("CAST(conv(substring(md5(s), 1, 14), 16, 10) AS BIGINT)").as("h"))
    assert(!q1.queryExecution.executedPlan.toString.contains("graft_hash60"),
      q1.queryExecution.executedPlan.toString)
    // a non-default split limit changes trailing-empty semantics
    val q2 = docs.select(size(split(trim(col("s")), "\\s+", 2)).as("n"))
    assert(!q2.queryExecution.executedPlan.toString.contains("graft_token_count"),
      q2.queryExecution.executedPlan.toString)
  }
}
