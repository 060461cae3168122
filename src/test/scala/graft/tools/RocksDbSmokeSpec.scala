package graft.tools

import scala.sys.process.{Process, ProcessLogger}

import org.scalatest.funsuite.AnyFunSuite

/** Drives [[RocksDbSmoke]] in a CHILD JVM: the smoke needs a session
  * whose `spark.sql.streaming.stateStore.providerClass` is RocksDB plus
  * a default-provider truth session, neither of which can coexist with
  * the suite's shared context.
  *
  * The child re-runs every stateful streaming query row under
  * `RocksDBStateStoreProvider` (the spill-capable regime 100 TB key
  * cardinality requires — the default provider keeps all per-key state
  * in executor heap), asserts bit-identical rows vs the default
  * provider, proves the provider actually engaged (rocksdb custom
  * metrics in progress events), and checkpoint-RESTARTS two
  * state-revealing ops mid-feed: restored RocksDB state must continue
  * running sums and remember first-claim owners.
  */
@org.scalatest.tags.Slow
class RocksDbSmokeSpec extends AnyFunSuite {

  test("stateful streaming ops are provider-independent (RocksDB == " +
      "default, bit-identical) and survive checkpoint restart") {
    val cmd = Seq(ChildJvm.javaBin) ++ ChildJvm.addOpens ++ Seq(
      "-Xmx4g", "-Dspark.ui.enabled=false",
      "-cp", System.getProperty("java.class.path"),
      "graft.tools.RocksDbSmoke", "/root/testdata/sf0.001")
    val out = new StringBuilder
    val rc = Process(cmd).!(ProcessLogger(
      l => out.synchronized { out.append(l).append('\n') }, _ => ()))
    val text = out.toString
    val lines = text.linesIterator.filter(_.startsWith("ROCKS")).toSeq
    val queryLines = lines.filter(_.startsWith("ROCKS query:"))
    val restartLines = lines.filter(_.startsWith("ROCKS restart:"))
    assert(queryLines.size == RocksDbSmoke.StatefulQueries.size,
      s"expected one line per stateful query; got:\n$text")
    assert(restartLines.size == 2, s"expected 2 restart scenarios; got:\n$text")
    lines.foreach(l => assert(l.endsWith("MATCH"), l))
    // the liveness line proves the provider engaged — without it the
    // whole comparison could be default-vs-default
    val proof = lines.find(_.startsWith("ROCKS provider_liveness"))
      .getOrElse(fail(s"no provider_liveness line in:\n$text"))
    assert(proof.endsWith("MATCH"), proof)
    assert(rc == 0, s"smoke exited $rc:\n${lines.mkString("\n")}")
  }
}
