package graft.tools

import scala.sys.process.{Process, ProcessLogger}

import org.scalatest.funsuite.AnyFunSuite

/** Drives [[LocalClusterSmoke]] in a CHILD JVM: the smoke must own its
  * SparkContexts (a plain-local one, then a local-cluster one), which
  * cannot coexist with the suite's shared session in this JVM. The child
  * runs the serialization-sensitive query slice under
  * `local-cluster[2,2,2048]` — real separate executor JVMs — and exits
  * nonzero on any divergence from plain local mode.
  *
  * This is the regression gate for the executor-boundary bug class the
  * smoke caught on its first run: the Kafka DSv2 reader resolved the
  * embedded broker's JVM-static registry executor-side, which is EMPTY
  * in a real executor process — five expected rows became zero, silently
  * (KafkaSource.scala now plans record-carrying splits on the driver and
  * routes writes through commit messages).
  */
@org.scalatest.tags.Slow
class LocalClusterSmokeSpec extends AnyFunSuite {

  test("serialization-sensitive queries are bit-identical under " +
      "local-cluster[2,2,2048] (separate executor JVMs)") {
    // the child needs the same JDK17 --add-opens set Spark needs here
    val cmd = Seq(ChildJvm.javaBin) ++ ChildJvm.addOpens ++ Seq(
      "-Xmx4g", "-Dspark.ui.enabled=false",
      "-cp", System.getProperty("java.class.path"),
      "graft.tools.LocalClusterSmoke", "/root/testdata/sf0.001")
    val out = new StringBuilder
    val rc = Process(cmd, cwd = None, "SPARK_HOME" -> "/opt/spark")
      .!(ProcessLogger(l => out.synchronized { out.append(l).append('\n') }, _ => ()))
    val text = out.toString
    val smokeLines = text.linesIterator.filter(_.startsWith("SMOKE")).toSeq
    assert(smokeLines.size == LocalClusterSmoke.DefaultQueries.size,
      s"expected one SMOKE line per query; got:\n$text")
    smokeLines.foreach(l => assert(l.endsWith("MATCH"), l))
    assert(rc == 0, s"smoke exited $rc:\n${smokeLines.mkString("\n")}")
  }
}
