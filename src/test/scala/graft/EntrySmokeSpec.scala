package graft

/** Driver-shaped smoke: `SparkEntry.entry` must work on a session that did
  * NOT go through GraftSession (the driver builds its own), i.e. without
  * the nanos-as-long parquet setting preconfigured.
  */
class EntrySmokeSpec extends SparkSpec {

  test("entry() runs on a vanilla session and returns rows") {
    val vanilla = spark.newSession()
    vanilla.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
    val df = SparkEntry.entry(vanilla)
    assert(df.count() > 0)
  }

  test("every declared query has a full DuckDB oracle") {
    assert((SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet).isEmpty)
    // and no oracle without a query
    assert((SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet).isEmpty)
  }
}
