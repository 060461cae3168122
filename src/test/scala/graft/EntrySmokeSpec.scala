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

  test("every query has either an oracle or is explicitly rows-only") {
    val noOracle = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(noOracle == Set("q_ann_lsh_pairs")) // the only rows-only query
    // and no oracle without a query
    assert((SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet).isEmpty)
  }
}
