package graft.streaming

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec

/** Liveness proof for the state-store regime the suite believes it is
  * running under. In the normal suite this pins "default provider, no
  * rocksdb metrics"; inside RocksDbSuitePhaseSpec's child JVM
  * (`-Dgraft.stateProvider=rocksdb`) it pins the opposite — WITHOUT this
  * a typo'd provider conf would silently compare default against
  * default, the failure mode the RocksDbSmoke listener exists for.
  */
class StateProviderProofSpec extends SparkSpec {

  test("the live state store matches the requested regime (custom " +
      "metrics prove which provider actually engaged)") {
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    import graft.SparkSpec.spark.implicits._
    val input = MemoryStream[(String, Long)]
    val q = input.toDS().groupBy($"_1").count()
      .writeStream.format("memory").queryName("provider_proof")
      .outputMode("update").start()
    try {
      input.addData(("a", 1L), ("b", 2L))
      q.processAllAvailable()
      val metrics = q.lastProgress.stateOperators.head
        .customMetrics.keySet().asScala.toSet
      val rocks = metrics.exists(_.toLowerCase.contains("rocksdb"))
      sys.props.get(graft.GraftSession.StateProviderProp) match {
        case Some("rocksdb") =>
          assert(rocks, s"rocksdb requested but the engaged provider " +
            s"reports no rocksdb metrics: $metrics")
        case Some(other) => fail(s"unrecognized test regime: $other")
        case None =>
          assert(!rocks, s"default regime expected but rocksdb metrics " +
            s"present: $metrics")
      }
    } finally {
      q.stop()
      spark.catalog.dropTempView("provider_proof")
      ()
    }
  }
}
