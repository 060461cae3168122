package graft.functions

import graft.SparkSpec
import graft.SparkSpec.spark.implicits._
import org.apache.spark.sql.functions._

/** Pins [[Hash60Expr]] (codegen digest-byte kernel) bit-equal to the
  * functions-only formula `conv(substring(md5(c),1,15),16,10)` that the
  * DuckDB oracles replay — over ASCII, unicode, empty and long strings,
  * in both codegen and interpreted evaluation.
  */
final class Hash60Spec extends SparkSpec {

  private val samples = Seq(
    "", "a", "the quick brown fox", "shingle one two three",
    "élève 中文 😀", "0", " ", "  double  space",
    "x" * 10000) ++ (0 until 200).map(i => s"doc $i token ${i * 37} tail")

  test("Hash60Expr equals the md5-hex reference formula on all samples") {
    val df = samples.toDF("s")
      .select(col("s"), Hash60.column(col("s")).as("fast"),
        MinHashLsh.hash60Reference(col("s")).as("ref"))
    val rows = df.collect()
    assert(rows.length == samples.length)
    rows.foreach { r =>
      assert(r.getLong(1) == r.getLong(2), s"mismatch for '${r.getString(0).take(40)}'")
      assert(r.getLong(1) >= 0L && r.getLong(1) < (1L << 60))
    }
  }

  test("Hash60Expr matches under interpreted (non-codegen) evaluation") {
    val prev = spark.conf.getOption("spark.sql.codegen.wholeStage")
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      val bad = samples.toDF("s")
        .select(Hash60.column(col("s")).as("fast"),
          MinHashLsh.hash60Reference(col("s")).as("ref"))
        .where(col("fast") =!= col("ref")).count()
      assert(bad == 0L)
    } finally {
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
      prev.fold(spark.conf.unset("spark.sql.codegen.wholeStage"))(
        v => spark.conf.set("spark.sql.codegen.wholeStage", v))
    }
  }

  test("per-row streaming kernel agrees with the columnar expression") {
    samples.foreach { s =>
      val viaBytes = Hash60.digest60(s.getBytes("UTF-8"))
      assert(viaBytes == graft.streaming.StreamingDedup.hash60(s))
    }
  }

  test("Column wrappers self-register when GraftExtensions is absent") {
    val classic = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val reg = classic.sessionState.functionRegistry
    val descs = Seq(Hash60.functionDescription, TokenCount.functionDescription)
    // simulate a vanilla session: the registry has no graft functions
    descs.foreach(d => reg.dropFunction(d._1))
    try {
      assert(descs.forall(d => !reg.functionExists(d._1)))
      val r = Seq("one two three").toDF("s")
        .select(Hash60.column(col("s")).as("h"),
          TokenCount.column(col("s")).as("t"))
        .head()
      assert(r.getLong(0) == Hash60.digest60("one two three".getBytes("UTF-8")))
      assert(r.getInt(1) == 3)
      assert(descs.forall(d => reg.functionExists(d._1)))
    } finally
      // restore unconditionally for the other suites in this JVM
      descs.foreach { case (id, info, b) =>
        if (!reg.functionExists(id)) reg.registerFunction(id, info, b)
      }
  }

  test("hash60 stays inside whole-stage codegen") {
    val plan = spark.range(100)
      .select(Hash60.column(concat(lit("doc "), col("id"))).as("h"))
      .queryExecution.executedPlan.toString
    // `*(n)` marks a WholeStageCodegen stage in the simple plan string.
    assert(plan.contains("*(1) Project [graft_hash60"), plan)
  }
}
