package graft

/** Bench failure honesty (VERDICT r7 §Next #2): a throwing query must be
  * impossible to mistake for a fast success — -1 in `queries`, its message
  * in `errors`, counted in `failed`, excluded from `value`.
  */
class BenchSpec extends SparkSpec {

  test("a deliberately broken query records -1 and an error, never a time") {
    val boom: (org.apache.spark.sql.SparkSession, String) =>
        org.apache.spark.sql.DataFrame =
      (_, _) => throw new IllegalStateException("deliberate analysis failure")
    val (sec, err) = Bench.runOne(spark, boom, "/nowhere")
    assert(sec == -1.0)
    assert(err.exists(_.contains("deliberate analysis failure")))
  }

  test("a working query records positive elapsed time and no error") {
    val ok: (org.apache.spark.sql.SparkSession, String) =>
        org.apache.spark.sql.DataFrame =
      (s, _) => s.range(10).toDF()
    val (sec, err) = Bench.runOne(spark, ok, "/nowhere")
    assert(sec > 0.0 && err.isEmpty)
  }

  test("renderJson: failures surface in queries=-1, failed count, errors") {
    val json = Bench.renderJson(Seq(
      ("q_ok", 1.5, None),
      ("q_bad", -1.0, Some("""boom "quoted"
	tabbed"""))), "/sf")
    assert(json.contains(""""q_ok":1.500"""))
    assert(json.contains(""""q_bad":-1.000"""))
    assert(json.contains(""""failed":1"""))
    assert(json.contains(""""q_bad":"boom \"quoted\"\n\ttabbed""""))
    // total sums only successes
    assert(json.contains(""""value":1.5"""))
    // the line must stay machine-parseable
    assert(json.startsWith("{") && json.endsWith("}"))
  }
}
