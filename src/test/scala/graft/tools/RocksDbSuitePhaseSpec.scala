package graft.tools

import scala.sys.process.{Process, ProcessLogger}

import org.scalatest.funsuite.AnyFunSuite

/** The RocksDB SUITE PHASE: re-runs every stateful streaming spec suite
  * in a child JVM whose sessions are pinned to
  * `RocksDBStateStoreProvider` (`-Dgraft.stateProvider=rocksdb`, see
  * [[graft.GraftSession.StateProviderProp]]).
  *
  * RocksDbSmoke proves 16 query rows bit-identical under RocksDB; this
  * phase makes the FULL stateful law set (StateOps lowerings + cleanup
  * horizons, RetractJoin + its recovery, StreamingDedup, CachedView,
  * event-time window machinery, checkpoint recovery, unbounded-stream
  * carriers) run under the production provider EVERY round — a
  * semantics bug that only reproduces on RocksDB's serialization or
  * eviction behavior fails the suite, not a once-a-round smoke.
  * StateProviderProofSpec runs first inside the phase as the liveness
  * gate (rocksdb custom metrics must be present), so a typo'd provider
  * can never silently demote the phase to default-vs-default.
  */
@org.scalatest.tags.Slow
class RocksDbSuitePhaseSpec extends AnyFunSuite {

  /** Stateful suites re-run under RocksDB. StreamConfSpec is included
    * because its scoped-clone starts must inherit the provider conf.
    */
  val Suites: Seq[String] = Seq(
    "graft.streaming.StateProviderProofSpec", // liveness gate
    "graft.streaming.StreamingSpec",          // StateOps, CachedView, windows
    "graft.streaming.StreamingDedupSpec",
    "graft.streaming.RetractJoinSpec",
    "graft.streaming.RetractJoinRecoverySpec",
    "graft.streaming.StateCleanupSpec",
    // (StateCutLaws is a ScalaCheck Properties object — not runnable by
    // the scalatest Runner; its cut-invariance laws are batch-side)
    "graft.streaming.StreamingRecoverySpec",
    "graft.StreamingSemantics",               // dual-mode streaming half
    "graft.streaming.StreamingCurationSpec",
    "graft.streaming.StreamConfSpec",
    "graft.api.UnboundedStreamSpec")

  test("every stateful streaming suite passes under RocksDBStateStore" +
      "Provider (the production state regime)") {
    val cmd = Seq(ChildJvm.javaBin) ++ ChildJvm.addOpens ++ Seq(
      "-Xmx6g", "-Dspark.ui.enabled=false",
      "-Dgraft.stateProvider=rocksdb",
      "-Dspark.sql.session.timeZone=UTC",
      "-cp", System.getProperty("java.class.path"),
      "org.scalatest.tools.Runner", "-oW", "-P1") ++
      Suites.flatMap(s => Seq("-s", s))
    val out = new StringBuilder
    val rc = Process(cmd).!(ProcessLogger(
      l => out.synchronized { out.append(l).append('\n') }, _ => ()))
    val text = out.synchronized { out.toString }
    val summary = text.linesIterator
      .find(_.startsWith("Tests: succeeded"))
      .getOrElse(fail(s"no scalatest summary in child output:\n" +
        text.linesIterator.toSeq.takeRight(60).mkString("\n")))
    // e.g. "Tests: succeeded 123, failed 0, canceled 0, ignored 0, pending 0"
    val succeeded = "succeeded (\\d+)".r.findFirstMatchIn(summary)
      .map(_.group(1).toInt).getOrElse(0)
    assert(text.linesIterator.exists(_.startsWith(
        s"Suites: completed ${Suites.size}, aborted 0")),
      s"child must complete all ${Suites.size} suites:\n$summary\n" +
        text.linesIterator.filter(_.contains("ABORTED")).mkString("\n"))
    // 47 at r15 (46 suite tests + the proof); floor guards against the
    // child silently running a shrunken selection
    assert(summary.contains("failed 0") && succeeded >= 40,
      s"RocksDB phase summary: $summary\n" +
        text.linesIterator.filter(l => l.contains("FAILED") ||
          l.contains("*** "))
          .mkString("\n"))
    assert(rc == 0, s"RocksDB phase exited $rc: $summary")
    info(s"RocksDB phase: $succeeded tests green across " +
      s"${Suites.size} suites")
  }
}
