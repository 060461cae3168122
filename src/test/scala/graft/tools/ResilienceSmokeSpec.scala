package graft.tools

import scala.sys.process.{Process, ProcessLogger}

import org.scalatest.funsuite.AnyFunSuite

/** Drives [[ResilienceSmoke]] in a CHILD JVM: the smoke needs a
  * `local[4,3]` master (task retries enabled — the suite's shared
  * session runs with maxFailures=1, where any injected failure kills the
  * job instead of retrying) and then a second, Kryo-configured session,
  * neither of which can coexist with the suite's shared context.
  *
  * The child injects a first-attempt task failure into every scenario —
  * pass through the whole partition, THEN throw, so a sink sees a
  * complete-looking partial output that must still be discarded — and
  * asserts bit-identical results vs an uninjected truth run, plus a
  * per-scenario proof that the injection actually fired. This is the
  * cluster certainty the rest of the suite cannot exercise: on a
  * 1000-executor cluster tasks are re-attempted as a matter of course,
  * and a sink that leaks a failed attempt's output double-writes there
  * while passing every local[32] run forever.
  *
  * Runs TWICE: under the default state-store provider and under
  * RocksDB (`-Dgraft.stateProvider=rocksdb`) — chaos retries inside a
  * stateful micro-batch are exactly where a provider's abort/replay
  * behavior (SST cleanup, changelog replay) could diverge, and
  * production streaming state is RocksDB.
  */
@org.scalatest.tags.Slow
class ResilienceSmokeSpec extends AnyFunSuite {

  private def run(provider: Option[String]): Unit = {
    val providerProps = provider.toSeq.map(p => s"-Dgraft.stateProvider=$p")
    val cmd = Seq(ChildJvm.javaBin) ++ ChildJvm.addOpens ++ Seq(
      "-Xmx4g", "-Dspark.ui.enabled=false") ++ providerProps ++ Seq(
      "-cp", System.getProperty("java.class.path"),
      "graft.tools.ResilienceSmoke", "/root/testdata/sf0.001")
    val out = new StringBuilder
    val rc = Process(cmd).!(ProcessLogger(
      l => out.synchronized { out.append(l).append('\n') }, _ => ()))
    val text = out.toString
    val lines = text.linesIterator.filter(_.startsWith("RESIL")).toSeq
    val scenarioLines = lines.filterNot(_.startsWith("RESIL kryo:"))
    val kryoLines = lines.filter(_.startsWith("RESIL kryo:"))
    assert(scenarioLines.size == 11,
      s"expected 11 chaos scenarios; got:\n$text")
    assert(kryoLines.size == LocalClusterSmoke.DefaultQueries.size,
      s"expected one kryo line per slice query; got:\n$text")
    lines.foreach(l => assert(l.endsWith("MATCH"), l))
    // every scenario must PROVE its injection fired — a scenario whose
    // chaos stopped firing is a vacuous truth==truth comparison (the
    // child also hard-fails on this; double-checked here for the report)
    scenarioLines.foreach { l =>
      val injected = l.split(" ").collectFirst {
        case s if s.startsWith("injected=") => s.stripPrefix("injected=").toLong
      }
      assert(injected.exists(_ > 0), s"no injected failures in: $l")
    }
    assert(rc == 0, s"smoke exited $rc:\n${lines.mkString("\n")}")
  }

  test("task retries are transparent and sinks isolate failed attempts " +
      "under local[4,3]; query slice is serializer-independent (Kryo)") {
    run(provider = None)
  }

  test("the same 11 chaos scenarios hold under RocksDBStateStoreProvider " +
      "(production streaming state + task retries)") {
    run(provider = Some("rocksdb"))
  }
}
