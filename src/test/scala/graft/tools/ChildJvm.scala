package graft.tools

/** Shared plumbing for specs that drive a smoke `main` in a CHILD JVM. */
object ChildJvm {

  /** The current JVM's `--add-opens` flags, normalized for re-use on a
    * child's command line. The runtime MX bean reports module options in
    * the single-token `--add-opens=MODULE/PKG=TARGET` form even when the
    * JVM was launched with the two-token form — a scrape that only
    * pattern-matches the pair form silently collects NOTHING, and the
    * child then runs with no opens at all (caught when the Kryo phase of
    * ResilienceSmoke hard-failed on java.nio.HeapByteBuffer reflection:
    * Java-serializer paths merely warn without opens, so the gap was
    * invisible until a hard-requiring path ran).
    */
  def addOpens: Seq[String] = {
    val args = java.lang.management.ManagementFactory.getRuntimeMXBean
      .getInputArguments.toArray.map(String.valueOf).toSeq
    val singleToken = args.filter(_.startsWith("--add-opens="))
    val pairs = args.sliding(2).collect {
      case Seq("--add-opens", v) => Seq("--add-opens", v)
    }.toSeq.flatten
    val collected = singleToken ++ pairs
    require(collected.nonEmpty,
      "no --add-opens flags found on this JVM — Spark on JDK 17 cannot " +
        "start in the child without them (check build.sbt javaOptions)")
    collected
  }

  def javaBin: String = new java.io.File(
    new java.io.File(System.getProperty("java.home"), "bin"), "java").getPath
}
