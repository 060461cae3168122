package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class DotProductSpec extends SparkSpec {
  import SparkSpec.spark.implicits._

  private def loopDot(a: Array[Double], b: Array[Double]): Double = {
    val n = math.min(a.length, b.length)
    var s = 0.0; var i = 0
    while (i < n) { s += a(i) * b(i); i += 1 }
    s
  }

  test("graft_dot is bit-equal to the while-loop kernel (fold order law)") {
    val rnd = new scala.util.Random(42)
    val rows = (0 until 200).map { i =>
      (i.toLong,
        Array.fill(16)(rnd.nextDouble() * 2e6 - 1e6),
        Array.fill(16)(rnd.nextDouble() * 2e6 - 1e6))
    }
    val got = rows.toDF("id", "a", "b")
      .select(col("id"), DotProduct.column(col("a"), col("b")).as("d"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    rows.foreach { case (id, a, b) =>
      assert(java.lang.Double.doubleToLongBits(got(id)) ==
        java.lang.Double.doubleToLongBits(loopDot(a, b)), s"row $id")
    }
  }

  test("registered as SQL function; null ARRAY propagates as SQL NULL") {
    val df = Seq(
      (1L, Array(1.0, 2.0), Array(4.0, 5.0)),
      (2L, null, Array(1.0))
    ).toDF("id", "a", "b")
    df.createOrReplaceTempView("dots")
    val rows = spark.sql("SELECT id, graft_dot(a, b) AS d FROM dots ORDER BY id")
      .collect()
    assert(rows(0).getDouble(1) == 1.0 * 4.0 + 2.0 * 5.0)
    assert(rows(1).isNullAt(1))
  }

  test("dimension mismatch and null elements refuse loudly, never score") {
    // the Similarity kernels this expression is bit-equal to assume
    // equal-length non-null arrays; scoring a truncated or holey vector
    // silently would diverge from them on exactly the malformed inputs
    def messages(t: Throwable): Seq[String] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(10)
        .flatMap(c => Option(c.getMessage)).toSeq
    val ragged = Seq((1L, Array(1.0, 2.0, 3.0), Array(4.0, 5.0)))
      .toDF("id", "a", "b")
      .select(DotProduct.column(col("a"), col("b")))
    val e1 = intercept[Exception] { ragged.collect() }
    assert(messages(e1).exists(_.contains("dimension mismatch")), e1.toString)
    val holey = Seq((1L, Array[java.lang.Double](1.0, null), Array[java.lang.Double](2.0, 3.0)))
      .toDF("id", "a", "b")
      .select(DotProduct.column(col("a"), col("b")))
    val e2 = intercept[Exception] { holey.collect() }
    assert(messages(e2).exists(_.contains("null element")), e2.toString)
  }

  test("whole-stage codegen and interpreted eval agree") {
    val df = (0 until 100).map(i =>
      (i.toLong, Array.tabulate(8)(j => (i * 7 + j) * 0.25),
        Array.tabulate(8)(j => (i * 3 + j) * 0.5)))
      .toDF("id", "a", "b")
    def run(codegen: String): Seq[(Long, Double)] = {
      val prev = spark.conf.get("spark.sql.codegen.wholeStage")
      spark.conf.set("spark.sql.codegen.wholeStage", codegen)
      try df.select(col("id"), DotProduct.column(col("a"), col("b")).as("d"))
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      finally spark.conf.set("spark.sql.codegen.wholeStage", prev)
    }
    assert(run("true") == run("false"))
  }
}
