package graft.tools

import scala.sys.process.{Process, ProcessLogger}

import org.scalatest.funsuite.AnyFunSuite

/** Drives [[ExecutorLossSmoke]] in a CHILD JVM (it owns a local-cluster
  * SparkContext, which cannot coexist with the suite's shared session).
  * The child halts one executor JVM per scenario — exit 137, the SIGKILL
  * analog: no shutdown hooks, no abort callbacks — and asserts
  * bit-identical results vs an unkilled truth run: lost shuffle map
  * outputs must be resubmitted and re-fetched (the FetchFailed recovery
  * path), and a sink attempt that died with its process must leak
  * nothing into the committed output. The smoke hard-fails if no
  * executor was actually removed, so it can never degrade into a vacuous
  * truth==truth comparison.
  *
  * Runs TWICE: default provider and RocksDB
  * (`-Dgraft.stateProvider=rocksdb`). An executor dying mid-micro-batch
  * of a stateful query is the crash-restart path where providers
  * genuinely differ — the replacement executor must rebuild RocksDB
  * state from the checkpointed SST/changelog files, not from the dead
  * process's heap.
  */
@org.scalatest.tags.Slow
class ExecutorLossSmokeSpec extends AnyFunSuite {

  private def run(provider: Option[String]): Unit = {
    val providerProps = provider.toSeq.map(p => s"-Dgraft.stateProvider=$p")
    val cmd = Seq(ChildJvm.javaBin) ++ ChildJvm.addOpens ++ Seq(
      "-Xmx4g", "-Dspark.ui.enabled=false") ++ providerProps ++ Seq(
      "-cp", System.getProperty("java.class.path"),
      "graft.tools.ExecutorLossSmoke", "/root/testdata/sf0.001")
    val out = new StringBuilder
    val rc = Process(cmd, cwd = None, "SPARK_HOME" -> "/opt/spark")
      .!(ProcessLogger(l => out.synchronized { out.append(l).append('\n') }, _ => ()))
    val text = out.toString
    val lines = text.linesIterator.filter(_.startsWith("EXECLOSS")).toSeq
    assert(lines.size == 4, s"expected 4 executor-loss scenarios; got:\n$text")
    lines.foreach(l => assert(l.endsWith("MATCH"), l))
    val summary = text.linesIterator
      .find(_.startsWith("""{"smoke":"executor-loss""""))
      .getOrElse(fail(s"no summary line:\n$text"))
    assert(!summary.contains("\"executorsRemoved\":0"), summary)
    assert(rc == 0, s"smoke exited $rc:\n${lines.mkString("\n")}")
  }

  test("executor loss mid-query: shuffle outputs are recovered and dead " +
      "sink attempts leak nothing under local-cluster[2,2,2048]") {
    run(provider = None)
  }

  test("the same 4 executor-loss scenarios hold under " +
      "RocksDBStateStoreProvider (state rebuilt from checkpoint files, " +
      "not the dead executor's heap)") {
    run(provider = Some("rocksdb"))
  }
}
