package graft

import org.scalatest.funsuite.AnyFunSuite

/** README's query index must match `SparkEntry.queries` 1:1 (VERDICT r10
  * item #7) — a stale docs index silently misrepresents the driver-checked
  * surface, so the parity is a test, not a convention. No Spark session
  * needed: the registries are plain maps.
  */
class DocsIndexSpec extends AnyFunSuite {

  private def readmeIndex: Set[String] = {
    val readme = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("README.md")), "UTF-8")
    val begin = readme.indexOf("<!-- QUERY-INDEX-BEGIN")
    val end = readme.indexOf("<!-- QUERY-INDEX-END")
    assert(begin >= 0 && end > begin, "README query-index markers missing")
    "`(q[a-z0-9_]+)`".r.findAllMatchIn(readme.substring(begin, end))
      .map(_.group(1)).toSet
  }

  test("README query index == SparkEntry.queries, name for name") {
    val registry = SparkEntry.queries.keySet
    val docs = readmeIndex
    val missing = registry -- docs
    val stale = docs -- registry
    assert(missing.isEmpty && stale.isEmpty,
      s"README index drifted — missing: ${missing.toSeq.sorted.mkString(", ")}; " +
        s"stale: ${stale.toSeq.sorted.mkString(", ")}")
  }

  test("per-category counts in the README index match their name lists") {
    // name-set parity alone lets a stale "(11)" head a 17-name list
    // (VERDICT r11 item #1): gate the parenthetical counts too
    val readme = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("README.md")), "UTF-8")
    val begin = readme.indexOf("<!-- QUERY-INDEX-BEGIN")
    val end = readme.indexOf("<!-- QUERY-INDEX-END")
    val lines = readme.substring(begin, end).linesIterator
      .filter(_.startsWith("**")).toSeq
    assert(lines.nonEmpty, "no category lines found in the query index")
    val header = """\*\*([A-Za-z]+) \((\d+)\)\*\*""".r
    lines.foreach { line =>
      val m = header.findFirstMatchIn(line).getOrElse(
        fail(s"category line without a (count) header: $line"))
      val names = "`(q[a-z0-9_]+)`".r.findAllMatchIn(line).size
      assert(m.group(2).toInt == names,
        s"${m.group(1)} header says (${m.group(2)}) but lists $names names")
    }
  }

  test("every query has an oracle (or is consciously rows-only)") {
    // the driver records a weaker rows-only check for queries without
    // oracle SQL; the engine's bar is an oracle for EVERY query — a new
    // query landing without one should fail here, not be silently weak
    val noOracle = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(noOracle.isEmpty,
      s"queries without oracle SQL: ${noOracle.toSeq.sorted.mkString(", ")}")
  }
}
