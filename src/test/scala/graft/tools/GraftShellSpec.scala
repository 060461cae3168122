package graft.tools

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, PrintStream}

import graft.SparkSpec
import graft.core.{GraftOperator, Repository}

/** Scripted-session exercise of the console shell (the reference's
  * Console/GroovyEnv tests drive the REPL the same way).
  */
class GraftShellSpec extends SparkSpec {

  private def runScript(script: String): String = {
    val repo = Repository.parse(
      """entities { user { attributes {
        |  "status" { scheme: string }
        |  "device.*" { scheme: string }
        |} } }
        |attributeFamilies {
        |  user-primary {
        |    entity: user
        |    attributes: [ "*" ]
        |    storage: "inmem://shell"
        |    type: primary
        |    access: [ commit-log, batch-updates, batch-snapshot, random-access ]
        |  }
        |}""".stripMargin)
    val op = new GraftOperator(spark, repo)
    val out = new ByteArrayOutputStream()
    val shell = new GraftShell(op,
      new ByteArrayInputStream(script.getBytes("UTF-8")),
      new PrintStream(out, true, "UTF-8"))
    shell.run()
    new String(out.toByteArray, "UTF-8")
  }

  test("put/get/list/delete/snapshot session") {
    val out = runScript(
      """# seed some data
        |put user u1 status 1 online
        |put user u1 device.a 2 phone
        |put user u1 device.b 3 tablet
        |put user u2 status 4 offline
        |get user u1 status
        |list user u1 device.
        |entities user
        |delete user u2 status 5
        |get user u2 status
        |deleteWildcard user u1 device. 6
        |list user u1 device.
        |snapshot user
        |badcommand
        |exit
        |""".stripMargin)
    assert(out.contains("u1 status @1 = online"))
    assert(out.contains("u1 device.a @2 = phone"))
    assert(out.contains("u1 device.b @3 = tablet"))
    assert(out.split("\n").count(_ == "u1") == 1)
    assert(out.contains("u2"))
    assert(out.contains("(not found)"), "deleted cell must read as missing")
    assert(out.contains("(none)"), "wildcard-deleted relation must list empty")
    assert(out.contains("1 row(s)"), s"snapshot must show only the live cell:\n$out")
    assert(out.contains("unknown command"))
  }

  test("eval: scripted filter/map/count expressions over a family") {
    val out = runScript(
      """put user u1 status 1 online
        |put user u2 status 2 offline
        |put user u3 status 3 online
        |put user v9 status 4 online
        |eval user.filter(value == "online").count()
        |eval user.filter(key.startsWith("u") && value != "offline").count()
        |eval user.filter(stamp > 1 && stamp <= 3).count()
        |eval user.map(key).distinct().count()
        |eval user.sum(stamp)
        |eval user.updates().count()
        |eval user.filter(value.contains("line")).map(key).take(10)
        |""".stripMargin)
    val lines = out.linesIterator.filterNot(_ == "ok").toSeq
    assert(lines(0) == "3", s"online count: $out")
    assert(lines(1) == "2", s"u-prefix online count: $out")
    assert(lines(2) == "2", s"stamp range count: $out")
    assert(lines(3) == "4", s"distinct keys: $out")
    assert(lines(4) == "10", s"sum of stamps: $out")
    assert(lines(5) == "4", s"updates count: $out")
    assert(lines.drop(6).toSet == Set("u1", "u2", "u3", "v9"), s"mapped keys: $out")
  }

  test("eval: scripted flatMap explodes 1:N, groupReduce ranks top-n per group") {
    val out = runScript(
      """put user u1 status 1 online
        |put user u1 device.a 2 red_phone
        |put user u1 device.b 3 blue_tablet
        |put user u2 status 4 offline
        |eval user.flatMap(split(value, "_")).count()
        |eval user.flatMap(split(value, "_")).distinct().take(10)
        |eval user.updates().groupBy(key).groupReduce(top(1, stamp)).map(value).take(10)
        |eval user.updates().groupBy(key).groupReduce(top(2, stamp)).count()
        |""".stripMargin)
    val lines = out.linesIterator.filterNot(_ == "ok").toSeq
    // flatMap(split): online | red phone | blue tablet | offline -> 6 tokens
    assert(lines(0) == "6", s"flatMap token count: $out")
    assert(lines.slice(1, 7).toSet ==
      Set("online", "offline", "red", "phone", "blue", "tablet"),
      s"flatMap distinct tokens: $out")
    // groupReduce(top(1, stamp)): latest element per key — u1's stamp-3
    // write and u2's stamp-4 write
    assert(lines.slice(7, 9).toSet == Set("blue_tablet", "offline"),
      s"top-1 per key: $out")
    // top(2): u1 contributes 2 rows, u2 has only 1
    assert(lines(9) == "3", s"top-2 count: $out")
  }

  test("eval: scripted windowed reduce folds groups in event-time order") {
    val out = runScript(
      """put user u1 status 1 a
        |put user u1 status 2 b
        |put user u1 status 12 c
        |put user u2 status 3 x
        |eval user.updates().timeWindow(10).groupBy(key, window).reduce("", acc.concat(value)).take(10)
        |eval user.updates().timeWindow(10).groupBy(key, window).reduce(0, acc + 1).sum(reduced)
        |eval user.updates().groupBy(key).count().sum(count)
        |eval user.updates().timeWindow(10).groupBy(window).sum(stamp).take(10)
        |""".stripMargin)
    val lines = out.linesIterator.filterNot(_ == "ok").toSeq
    // fold 1: concat in stamp order — u1/win0 = "ab" (1 then 2), u1/win10
    // = "c", u2/win0 = "x"; row order is not fixed, membership is
    val folded = lines.take(3).toSet
    assert(folded == Set("u1 0 ab", "u1 10 c", "u2 0 x"), s"windowed fold: $out")
    // fold 2: counting fold over 3 groups = 4 elements total
    assert(lines(3) == "4", s"count-fold total: $out")
    // grouped count chained into a further aggregation
    assert(lines(4) == "4", s"count chain: $out")
    // windowed sum: window 0 -> stamps 1+2+3=6, window 10 -> 12
    assert(lines.drop(5).toSet == Set("0 6", "10 12"), s"windowed sum: $out")
  }

  test("eval: sql() escape hatch runs free-form Spark SQL no DSL verb covers") {
    val out = runScript(
      """put user u1 status 2 online
        |put user u2 status 3 offline
        |put user u3 status 4 advent
        |eval user.filter(sql("regexp_like(CAST(value AS STRING), '^o.+e$')")).count()
        |eval user.map(sql("concat(upper(key), ':', CAST(stamp % 2 AS STRING))")).take(10)
        |eval user.filter(sql("stamp % 2 = 0")).count()
        |eval user.filter(sql(42)).count()
        |eval user.flatMap(split(value, stamp)).count()
        |""".stripMargin)
    val lines = out.linesIterator.filterNot(_ == "ok").toSeq
    // regexp matching: no DSL verb does regexes — only sql() can
    assert(lines(0) == "2", s"regexp filter: $out")
    assert(lines.slice(1, 4).toSet == Set("U1:0", "U2:1", "U3:0"),
      s"sql-mapped projection: $out")
    assert(lines(4) == "2", s"modulo filter: $out")
    // wrong-shaped arguments get targeted messages, not 'unknown function'
    assert(out.contains("sql needs one string literal"), out)
    assert(out.contains("split needs (expression, separator)"), out)
  }

  test("eval: scala() closures compile free-form Scala at the prompt") {
    val out = runScript(
      """put user u1 status 2 online
        |put user u2 status 3 offline
        |put user u3 status 4 advent
        |eval user.filter(scala('value.rlike("^o.+e$")')).count()
        |eval user.map(scala('concat_ws(":", upper(key), stamp % 2)')).take(10)
        |eval user.filter(scala('{ val evens = stamp % 2 === lit(0); evens || length(value) <= 7 }')).count()
        |eval user.transform(scala('df => df.groupBy("attribute").count()')).take(5)
        |eval user.filter(scala('this does not compile')).count()
        |eval user.transform(split(value, "x")).count()
        |eval user.count()
        |""".stripMargin)
    val lines = out.linesIterator.filterNot(_ == "ok").toSeq
    // a real regex closure — same power as the reference's Groovy
    // closures, compiled to a Catalyst column
    assert(lines(0) == "2", s"rlike closure filter: $out")
    assert(lines.slice(1, 4).toSet == Set("U1:0", "U2:1", "U3:0"),
      s"scala-mapped projection: $out")
    // multi-statement Scala (a block with locals) also compiles
    assert(lines(4) == "3", s"block closure filter: $out")
    // whole-pipeline DataFrame => DataFrame closure
    assert(lines(5) == "status 3", s"transform closure: $out")
    // a broken closure reports a compile error and the session continues
    assert(out.contains("does not compile"), out)
    assert(out.contains("transform needs scala("), out)
    assert(lines.last == "3", s"session must continue: $out")
  }

  test("eval: string escapes let one literal carry both quote kinds") {
    val out = runScript(
      """put user u1 status 1 it's_on
        |put user u2 status 2 plain
        |eval user.filter(scala('value.contains("it\'s")')).count()
        |eval user.filter(value == "it\'s_on").count()
        |""".stripMargin)
    val lines = out.linesIterator.filterNot(_ == "ok").toSeq
    assert(lines == Seq("1", "1"), s"escaped-quote closures: $out")
  }

  test("eval: bad expressions report errors without killing the session") {
    val out = runScript(
      """put user u1 status 1 on
        |eval user.filter(nosuchfield == 1).count()
        |eval user.explode()
        |eval user.count()
        |""".stripMargin)
    assert(out.contains("unknown field 'nosuchfield'"), out)
    assert(out.contains("unknown pipeline method 'explode'"), out)
    assert(out.linesIterator.toSeq.last == "1", "session must continue")
  }

  test("errors do not kill the session") {
    val out = runScript(
      """get nosuch u1 status
        |put user u1 status 1 ok
        |get user u1 status
        |""".stripMargin)
    assert(out.contains("error:"))
    assert(out.contains("u1 status @1 = ok"), "session must continue after an error")
  }
}
