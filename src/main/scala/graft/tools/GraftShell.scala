package graft.tools

import java.io.{BufferedReader, InputStream, InputStreamReader, PrintStream}
import java.nio.charset.StandardCharsets
import java.util.Base64

import graft.core.{GraftOperator, StreamElement}
import graft.streaming.StreamCollector

/** Interactive console over a repository — the reference's operator shell
  * (reference: tools/.../Console.java:44, the Groovy REPL with
  * put/get/delete/stream/batchSnapshot closures over the config model).
  * No scripting-engine jars exist in this build, so the shell is a
  * line-oriented command console with the same verbs, reading commands
  * from any input stream (interactive stdin or a script) and printing to
  * any sink — which also makes it fully testable.
  *
  * Commands:
  *   put <entity> <key> <attribute> <stamp> <utf8-value>
  *   delete <entity> <key> <attribute> <stamp>
  *   deleteWildcard <entity> <key> <prefix.> <stamp>
  *   get <entity> <key> <attribute>
  *   list <entity> <key> [prefix]
  *   entities <entity> [offset limit]
  *   snapshot <entity>          (row count + first rows of the compacted view)
  *   stream <entity> <attr> <n> (first n elements of the commit log stream)
  *   eval <expression>          (scripted pipeline, see [[ShellExpr]] —
  *                               e.g. user.filter(value == "on").count())
  *   help | exit
  */
final class GraftShell(op: GraftOperator, in: InputStream, out: PrintStream) {

  private def valueStr(e: StreamElement): String =
    Option(e.value)
      .map(v => new String(v, StandardCharsets.UTF_8))
      .filter(_.forall(c => c >= ' ' && c < 127))
      .getOrElse(Option(e.value)
        .map(v => "base64:" + Base64.getEncoder.encodeToString(v))
        .getOrElse("<null>"))

  private def render(e: StreamElement): String =
    s"${e.key} ${e.attribute} @${e.stamp} = ${valueStr(e)}"

  /** Process commands until EOF or `exit`; returns the number executed. */
  def run(): Int = {
    val reader = new BufferedReader(new InputStreamReader(in, StandardCharsets.UTF_8))
    var n = 0
    var line = reader.readLine()
    var done = false
    while (line != null && !done) {
      val trimmed = line.trim
      if (trimmed.nonEmpty && !trimmed.startsWith("#")) {
        n += 1
        // `eval <expression>` keeps its spaces; everything else tokenizes
        val cmd =
          if (trimmed.startsWith("eval ")) Seq("eval", trimmed.substring(5))
          else trimmed.split("\\s+", 6).toSeq
        try exec(cmd) match {
          case Left(_) => done = true
          case Right(msg) => out.println(msg)
        } catch {
          case e: Exception =>
            out.println(s"error: ${Option(e.getMessage).getOrElse(e.getClass.getSimpleName)}")
        }
      }
      if (!done) line = reader.readLine()
    }
    n
  }

  private def exec(args: Seq[String]): Either[Unit, String] = args match {
    case Seq("exit") | Seq("quit") => Left(())
    case Seq("help") => Right(
      "commands: put delete deleteWildcard get list entities snapshot stream " +
        "eval help exit\n" +
        "eval: <entity>[.updates()].filter(...).map(...).take(n)|.count()|.sum(...)\n" +
        "      windowed/grouped: .timeWindow(stampUnits — engine stamps are micros).groupBy(key, window)" +
        ".reduce(init, accExpr)|.count()|.sum(e)|.min(e)|.max(e)|.avg(e)\n" +
        "      closures: filter(scala('value.rlike(\"x.*\")')) | " +
        "transform(scala('df => ...')) | filter(sql(\"...\"))")
    // scripted expressions (Console.java closures): predicates compile to
    // Catalyst columns, so filter+count runs distributed
    case Seq("eval", expression) =>
      Right(ShellExpr.eval(op, expression))
    case Seq("put", entity, key, attr, stamp, value) =>
      op.write(StreamElement.upsert(entity, key, attr,
        java.util.UUID.randomUUID().toString, stamp.toLong,
        value.getBytes(StandardCharsets.UTF_8)))
      Right("ok")
    case Seq("delete", entity, key, attr, stamp) =>
      op.write(StreamElement.delete(entity, key, attr,
        java.util.UUID.randomUUID().toString, stamp.toLong))
      Right("ok")
    case Seq("deleteWildcard", entity, key, prefix, stamp) =>
      op.write(StreamElement.deleteWildcard(entity, key, prefix,
        java.util.UUID.randomUUID().toString, stamp.toLong))
      Right("ok")
    case Seq("get", entity, key, attr) =>
      Right(op.getRandomAccess(entity, attr).get(key, attr)
        .map(render).getOrElse("(not found)"))
    case Seq("list", entity, key) =>
      Right(listOf(entity, key, ""))
    case Seq("list", entity, key, prefix) =>
      Right(listOf(entity, key, prefix))
    case Seq("entities", entity) =>
      Right(entitiesOf(entity, 0, 20))
    case Seq("entities", entity, offset, limit) =>
      Right(entitiesOf(entity, offset.toInt, limit.toInt))
    case Seq("snapshot", entity) =>
      // bounded driver memory: count + a 20-row sorted page — collecting
      // the whole snapshot to print 20 rows OOMed the shell on any
      // sizable family
      val snap = op.getBatchSnapshot(entity)
      val n = snap.count()
      val page = snap
        .orderBy(snap.col("key"), snap.col("attribute"))
        .limit(20).collect()
      Right(s"$n row(s)\n" + page.map(render).mkString("\n"))
    case Seq("stream", entity, attr, n) =>
      val elems = StreamCollector.collect(op.getStream(entity, attr), n.toInt)
      Right(elems.map(render).mkString("\n"))
    case other =>
      Right(s"unknown command: ${other.mkString(" ")} (try 'help')")
  }

  private def listOf(entity: String, key: String, prefix: String): String = {
    // every random-access family, not attributes.head's — a multi-family
    // entity's other attributes were silently absent
    val truncatedBefore =
      graft.core.Metrics.counter("graft.randomaccess.truncated")
    val attrs = op.scanAllAttributes(entity, key)
      .filter(_.attribute.startsWith(prefix))
    val body = if (attrs.isEmpty) "(none)" else attrs.map(render).mkString("\n")
    // a capped scan must never read as a complete listing: surface the
    // reader's truncation in the printed output itself
    if (graft.core.Metrics.counter("graft.randomaccess.truncated") > truncatedBefore)
      body + "\n(TRUNCATED: scan hit " +
        graft.randomaccess.RandomAccessReader.MaxScanRowsKey +
        "; raise it or page with offset/limit)"
    else body
  }

  private def entitiesOf(entity: String, offset: Int, limit: Int): String = {
    val keys = op.listAllEntityKeys(entity, offset, limit)
    if (keys.isEmpty) "(none)" else keys.mkString("\n")
  }
}
