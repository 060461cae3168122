package graft.tools

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.core.GraftOperator

/** Scripted expressions for the console — the reference console
  * evaluates user closures over the entity model (reference:
  * tools/.../Console.java:44, GroovyEnv.java:42 — `env.user.filter {...}
  * .count()` at the prompt). No scripting-engine jars exist in this
  * build (the JDK's JavaScript engine was removed in JDK 15), so this is
  * a small expression language with the same shape:
  *
  * {{{
  *   user.filter(value == "on" && stamp > 5).count()
  *   user.updates().filter(key.startsWith("u1")).take(10)
  *   user.map(key).distinct().count()
  * }}}
  *
  * Crucially the predicates COMPILE TO CATALYST COLUMNS: a scripted
  * filter+count runs as a distributed Spark job over the family, not a
  * driver-side loop over collected rows (the Groovy console's closures
  * are driver-side; this is the Spark-first version of the same UX).
  *
  * Grammar: pipeline = entity [.updates()] chain; chain methods
  * filter(expr) / map(expr) / flatMap(arrayExpr) / distinct() / take(n)
  * / count() / sum(expr) / timeWindow(ms) / groupBy(expr...). The 1:N
  * closure shapes of the reference console both script and stay
  * distributed: `flatMap(split(value, " "))` lowers to `explode`, and
  * `groupBy(key).groupReduce(top(2, stamp))` lowers to a ranked window
  * (row_number over the group keys — one shuffle, groups never
  * materialize on the driver). A grouped pipeline supports
  * count() / sum(e) / min(e) / max(e) / avg(e) / groupReduce(top(n, e))
  * and — the fold-shaped closure of the reference console —
  * reduce(init, accExpr): an EVENT-TIME-SORTED fold of each group where
  * `accExpr` references `acc` plus the element fields, e.g.
  *
  * {{{
  *   user.updates().timeWindow(10).groupBy(key, window)
  *       .reduce("", acc.concat(value)).take(10)
  * }}}
  *
  * The fold compiles to Catalyst higher-order functions
  * (`aggregate(array_sort(collect_list(struct(...))), init, merge)`), so
  * a scripted reduce runs distributed with one shuffle — each group is
  * materialized as a sorted array first, exactly the reference reduce's
  * contract (non-commutative folds are safe; reference:
  * tools/.../WindowedStream.java:40 reduce "materializes groups").
  *
  * Expressions: element fields (key, attribute, entity, uuid, stamp,
  * seqId, value — value reads as UTF-8 text; window after timeWindow;
  * derived columns like `reduced` chain onward), literals, comparisons,
  * boolean and arithmetic operators, and string methods startsWith /
  * contains / endsWith / concat / length / lower / upper.
  *
  * Escape hatch: `sql("...")` embeds ANY Spark SQL expression over the
  * element schema in a map/filter position — the pragmatic stand-in for
  * the reference console's arbitrary closures (Console.java:44 compiles
  * free-form Groovy; here the free form is Spark SQL, which keeps the
  * scripted step distributed instead of a driver-side lambda):
  *
  * {{{
  *   user.updates().filter(sql("stamp % 2 = 0 AND length(CAST(value AS STRING)) > 1")).count()
  *   user.map(sql("concat(upper(key), ':', CAST(stamp AS STRING))")).take(5)
  * }}}
  *
  * Full closures: `scala("...")` compiles REAL Scala at the prompt (the
  * reference console's arbitrary-Groovy-closure parity,
  * Console.java:44 / Compiler.java) via [[ShellCompiler]]. In an
  * expression position the source evaluates to a Catalyst `Column` with
  * the element fields and `functions._` in scope; the pipeline verb
  * `transform(scala("df => ..."))` takes a whole `DataFrame =>
  * DataFrame`. Either way the compiled closure IS a plan — scripted
  * steps stay distributed, nothing runtime-compiled ships to executors:
  *
  * {{{
  *   user.filter(scala('value.rlike("^o.+e$")')).count()
  *   user.transform(scala('df => df.groupBy("attribute").count()')).take(5)
  * }}}
  */
object ShellExpr {

  // ---- lexer ----
  private sealed trait Tok
  private final case class TId(s: String) extends Tok
  private final case class TNum(v: Long) extends Tok
  private final case class TStr(s: String) extends Tok
  private final case class TSym(s: String) extends Tok

  private val Syms2 = Set("==", "!=", "<=", ">=", "&&", "||")

  private def tokenize(s: String): Vector[Tok] = {
    val out = Vector.newBuilder[Tok]
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c.isWhitespace) i += 1
      else if (c.isLetter || c == '_') {
        val st = i
        while (i < s.length && (s.charAt(i).isLetterOrDigit || s.charAt(i) == '_')) i += 1
        out += TId(s.substring(st, i))
      } else if (c.isDigit) {
        val st = i
        while (i < s.length && s.charAt(i).isDigit) i += 1
        out += TNum(s.substring(st, i).toLong)
      } else if (c == '"' || c == '\'') {
        // backslash escapes: \" \' \\ (plus \n \t) — a scala()/sql()
        // closure often needs BOTH quote kinds in one literal, e.g.
        // scala('value.contains("it\'s")')
        i += 1
        val sb = new StringBuilder
        while (i < s.length && s.charAt(i) != c) {
          if (s.charAt(i) == '\\' && i + 1 < s.length) {
            s.charAt(i + 1) match {
              case 'n'   => sb.append('\n')
              case 't'   => sb.append('\t')
              case other => sb.append(other) // \" \' \\ and any other char
            }
            i += 2
          } else { sb.append(s.charAt(i)); i += 1 }
        }
        require(i < s.length, "unterminated string literal")
        i += 1
        out += TStr(sb.toString)
      } else if (i + 1 < s.length && Syms2(s.substring(i, i + 2))) {
        out += TSym(s.substring(i, i + 2)); i += 2
      } else { out += TSym(c.toString); i += 1 }
    }
    out.result()
  }

  // ---- AST ----
  private sealed trait Expr
  private final case class Lit(v: Any) extends Expr
  private final case class Ref(name: String) extends Expr
  private final case class Bin(op: String, l: Expr, r: Expr) extends Expr
  private final case class Un(op: String, e: Expr) extends Expr
  private final case class Call(target: Expr, name: String, args: Seq[Expr]) extends Expr
  /** Bare function form `f(args)` — `split(value, " ")`, `top(2, stamp)`. */
  private final case class Fn(name: String, args: Seq[Expr]) extends Expr

  private final class P(ts: Vector[Tok]) {
    private var i = 0
    private def peek: Option[Tok] = if (i < ts.length) Some(ts(i)) else None
    private def next(): Tok = {
      require(i < ts.length, "unexpected end of expression")
      val t = ts(i); i += 1; t
    }
    private def expectSym(s: String): Unit = next() match {
      case TSym(`s`) => ()
      case other => throw new IllegalArgumentException(s"expected '$s', got $other")
    }
    def parse(): Expr = {
      val e = or()
      require(i == ts.length, s"trailing input after expression (token $i)")
      e
    }
    private def or(): Expr = {
      var l = and()
      while (peek.contains(TSym("||"))) { next(); l = Bin("||", l, and()) }
      l
    }
    private def and(): Expr = {
      var l = cmp()
      while (peek.contains(TSym("&&"))) { next(); l = Bin("&&", l, cmp()) }
      l
    }
    private def cmp(): Expr = {
      val l = add()
      peek match {
        case Some(TSym(op)) if Set("==", "!=", "<", "<=", ">", ">=")(op) =>
          next(); Bin(op, l, add())
        case _ => l
      }
    }
    private def add(): Expr = {
      var l = mul()
      var go = true
      while (go) peek match {
        case Some(TSym(op @ ("+" | "-"))) => next(); l = Bin(op, l, mul())
        case _ => go = false
      }
      l
    }
    private def mul(): Expr = {
      var l = unary()
      var go = true
      while (go) peek match {
        case Some(TSym(op @ ("*" | "/" | "%"))) => next(); l = Bin(op, l, unary())
        case _ => go = false
      }
      l
    }
    private def unary(): Expr = peek match {
      case Some(TSym("!")) => next(); Un("!", unary())
      case Some(TSym("-")) => next(); Un("-", unary())
      case _ => postfix()
    }
    private def postfix(): Expr = {
      var e = primary()
      var go = true
      while (go) peek match {
        case Some(TSym(".")) =>
          next()
          val name = next() match {
            case TId(n) => n
            case other => throw new IllegalArgumentException(s"expected method after '.', got $other")
          }
          expectSym("(")
          val args = ArrayBuffer.empty[Expr]
          if (!peek.contains(TSym(")"))) {
            args += or()
            while (peek.contains(TSym(","))) { next(); args += or() }
          }
          expectSym(")")
          e = Call(e, name, args.toSeq)
        case _ => go = false
      }
      e
    }
    private def primary(): Expr = next() match {
      case TId("true")  => Lit(true)
      case TId("false") => Lit(false)
      case TId(n) if peek.contains(TSym("(")) =>
        next()
        val args = ArrayBuffer.empty[Expr]
        if (!peek.contains(TSym(")"))) {
          args += or()
          while (peek.contains(TSym(","))) { next(); args += or() }
        }
        expectSym(")")
        Fn(n, args.toSeq)
      case TId(n)       => Ref(n)
      case TNum(v)      => Lit(v)
      case TStr(s)      => Lit(s)
      case TSym("(")    => val e = or(); expectSym(")"); e
      case other => throw new IllegalArgumentException(s"unexpected $other")
    }
  }

  private val Fields = Set("key", "attribute", "entity", "uuid", "stamp", "seqId", "value")

  /** Pipeline-derived column names referenceable downstream of the step
    * that creates them (timeWindow / map / grouped aggregations).
    */
  private val Derived = Set("window", "_mapped", "count", "sum", "min", "max",
    "avg", "reduced", "rank")

  /** Compile an element-level expression to a Catalyst Column. `env`
    * overrides name resolution (the reduce fold binds `acc` and the
    * element fields to lambda variables); outside an env, `value` reads
    * as UTF-8 text and any other name resolves to the pipeline column of
    * that name (fields, `window`, derived aggregates like `reduced`).
    */
  private def toColumn(e: Expr, env: Map[String, Column] = Map.empty): Column = e match {
    case Lit(v)        => lit(v)
    case Ref(n) if env.contains(n) => env(n)
    case Ref(n) if env.nonEmpty => throw new IllegalArgumentException(
      s"unknown name '$n' in fold expression " +
        s"(bound: ${env.keys.toSeq.sorted.mkString(", ")})")
    case Ref("value")  => col("value").cast("string") // UTF-8 text view
    case Ref(n) if Fields(n) || Derived(n) => col(n)
    case Ref(n) => throw new IllegalArgumentException(
      s"unknown field '$n' (fields: ${(Fields ++ Derived).toSeq.sorted.mkString(", ")})")
    case Un("!", x) => !toColumn(x, env)
    case Un("-", x) => -toColumn(x, env)
    case Un(op, _)  => throw new IllegalArgumentException(s"unknown operator '$op'")
    case Bin(op, l, r) =>
      val (a, b) = (toColumn(l, env), toColumn(r, env))
      op match {
        case "==" => a === b
        case "!=" => a =!= b
        case "<"  => a < b
        case "<=" => a <= b
        case ">"  => a > b
        case ">=" => a >= b
        case "&&" => a && b
        case "||" => a || b
        case "+"  => a + b
        case "-"  => a - b
        case "*"  => a * b
        case "/"  => a / b
        case "%"  => a % b
      }
    // literal-separator split (the regex is quoted) — the 1:N building
    // block: flatMap(split(value, " "))
    case Fn("split", Seq(a, Lit(sep: String))) =>
      split(toColumn(a, env), java.util.regex.Pattern.quote(sep))
    case Fn("split", _) => throw new IllegalArgumentException(
      "split needs (expression, separator) where the separator is a " +
        "string literal, e.g. split(value, \" \")")
    // free-form Spark SQL passthrough — the remaining distance to the
    // reference console's arbitrary Groovy closures (Console.java:44):
    // any SQL expression over the element schema scripts inline, e.g.
    //   user.filter(sql("regexp_like(CAST(value AS STRING), '^o.')")).count()
    //   user.map(sql("substring(key, 1, 2)")).distinct().count()
    // The expression compiles through Catalyst like every other verb, so
    // a scripted sql() step still runs as a distributed plan. `value` is
    // BINARY in the element schema — SQL text must cast it explicitly.
    case Fn("sql", Seq(Lit(sqlText: String))) if env.isEmpty =>
      expr(sqlText)
    case Fn("sql", Seq(Lit(_: String))) => throw new IllegalArgumentException(
      "sql(...) is not available inside a reduce fold — the fold binds " +
        "lambda variables a SQL string cannot reference; use the " +
        "expression operators instead")
    case Fn("sql", _) => throw new IllegalArgumentException(
      "sql needs one string literal containing a Spark SQL expression")
    // free-form SCALA closure (Console.java:44 arbitrary-closure parity):
    // the source compiles to a Catalyst Column with the element fields
    // and functions._ in scope (ShellCompiler), so even a runtime-
    // compiled closure still runs as a distributed plan
    case Fn("scala", Seq(Lit(src: String))) if env.isEmpty =>
      ShellCompiler.columnClosure(src)
    case Fn("scala", Seq(Lit(_: String))) => throw new IllegalArgumentException(
      "scala(...) is not available inside a reduce fold — the fold binds " +
        "lambda variables the compiled source cannot reference; use the " +
        "expression operators instead")
    case Fn("scala", _) => throw new IllegalArgumentException(
      "scala needs one string literal containing Scala source that " +
        "evaluates to a Column, e.g. scala('value.rlike(\"x.*\")')")
    case Fn(n, _) => throw new IllegalArgumentException(
      s"unknown function '$n' (functions: split(expr, sep), sql(\"...\"), " +
        "scala(\"...\"))")
    case Call(t, "startsWith", Seq(a)) => toColumn(t, env).startsWith(toColumn(a, env))
    case Call(t, "contains", Seq(a))   => toColumn(t, env).contains(toColumn(a, env))
    case Call(t, "endsWith", Seq(a))   => toColumn(t, env).endsWith(toColumn(a, env))
    case Call(t, "concat", Seq(a))     => concat(toColumn(t, env), toColumn(a, env))
    case Call(t, "length", Seq())      => length(toColumn(t, env))
    case Call(t, "lower", Seq())       => lower(toColumn(t, env))
    case Call(t, "upper", Seq())       => upper(toColumn(t, env))
    case Call(_, n, _) => throw new IllegalArgumentException(
      s"unknown method '$n' in expression")
  }

  private def renderRows(df: DataFrame, n: Int): String = {
    val rows = df.limit(n).collect()
    if (rows.isEmpty) "(none)"
    else rows.map(_.toSeq.map {
      case b: Array[Byte] => new String(b, java.nio.charset.StandardCharsets.UTF_8)
      case null => "<null>"
      case x => x.toString
    }.mkString(" ")).mkString("\n")
  }

  // pipeline evaluation states: a flat DataFrame, a grouped pipeline
  // awaiting its aggregation, or a rendered terminal result
  private sealed trait St
  private final case class DfSt(df: DataFrame) extends St
  private final case class GrSt(df: DataFrame, keys: Seq[Column],
      rawKeys: Seq[Column]) extends St
  private final case class DoneSt(s: String) extends St

  /** Per-element struct carried into the reduce fold: stamp first and
    * seqId second, so `array_sort` orders each group's fold by event
    * time (ties by sequential id, then the remaining fields) — the
    * time-sorted-input discipline the reference's reduce relies on.
    */
  private def elemStruct: Column = struct(col("stamp"), col("seqId"),
    col("key"), col("attribute"), col("entity"), col("uuid"),
    col("value").cast("string").as("value"))

  private def keyName(e: Expr, i: Int): String = e match {
    case Ref(n) => n
    case _ => s"k$i"
  }

  /** Evaluate a scripted pipeline; returns the rendered result. */
  def eval(op: GraftOperator, input: String): String = {
    val ast = new P(tokenize(input)).parse()
    def run(e: Expr): St = e match {
      case Ref(entity) => DfSt(op.getBatchSnapshot(entity).toDF())
      case Call(Ref(entity), "updates", Seq()) =>
        DfSt(op.getBatchUpdates(entity).toDF())
      case Call(t, name, args) => run(t) match {
        case DfSt(df) => name match {
          case "filter"   => DfSt(df.filter(toColumn(args.head)))
          case "map"      => DfSt(df.select(toColumn(args.head).as("_mapped")))
          // the 1:N closure shape, lowered to explode (generator stays
          // distributed — no driver loop): flatMap(split(value, " "))
          case "flatMap"  =>
            DfSt(df.select(explode(toColumn(args.head)).as("_mapped")))
          case "distinct" => DfSt(df.distinct())
          case "count" if args.isEmpty => DoneSt(df.count().toString)
          case "sum" =>
            // sum over zero rows is SQL NULL — render it as such instead
            // of NPEing on null.toString
            DoneSt(Option(df.agg(sum(toColumn(args.head))).head().get(0))
              .map(_.toString).getOrElse("null"))
          // event-time bucketing: window = start of the stamp's bucket,
          // in the STAMP's unit (engine stamps are MICROSECONDS — the
          // old help text said ms, silently making windows 1000x
          // smaller than a user following it expected).
          // stamp - pmod(stamp, size) FLOORS for pre-epoch stamps too
          // (truncating division would put stamp -5 into window 0)
          case "timeWindow" => args.head match {
            case Lit(size: Long) if size > 0 =>
              DfSt(df.withColumn("window", expr(s"stamp - pmod(stamp, $size)")))
            case other => throw new IllegalArgumentException(
              "timeWindow needs a positive stamp-unit literal " +
                s"(engine stamps are micros), got $other")
          }
          case "groupBy" =>
            require(args.nonEmpty, "groupBy needs at least one key expression")
            GrSt(df, args.zipWithIndex.map { case (a, i) =>
              toColumn(a).as(keyName(a, i)) }, args.map(toColumn(_)))
          case "take" => args.head match {
            case Lit(n: Long) => DoneSt(renderRows(df, n.toInt))
            case other => throw new IllegalArgumentException(s"take needs a count, got $other")
          }
          // whole-pipeline closure: any DataFrame => DataFrame, compiled
          // at the prompt (the full generality of the reference
          // console's scripted Groovy pipelines, Console.java:44)
          case "transform" => args match {
            case Seq(Fn("scala", Seq(Lit(src: String)))) =>
              DfSt(ShellCompiler.dfClosure(src)(df))
            case _ => throw new IllegalArgumentException(
              "transform needs scala(\"df => ...\") — Scala source for a " +
                "DataFrame => DataFrame closure")
          }
          case other => throw new IllegalArgumentException(
            s"unknown pipeline method '$other' " +
              "(filter, map, flatMap, distinct, take, count, sum, timeWindow, " +
              "groupBy, transform)")
        }
        case GrSt(df, keys, rawKeys) => name match {
          case "count" if args.isEmpty =>
            DfSt(df.groupBy(keys: _*).agg(count(lit(1)).as("count")))
          case "sum" =>
            DfSt(df.groupBy(keys: _*).agg(sum(toColumn(args.head)).as("sum")))
          case "min" =>
            DfSt(df.groupBy(keys: _*).agg(min(toColumn(args.head)).as("min")))
          case "max" =>
            DfSt(df.groupBy(keys: _*).agg(max(toColumn(args.head)).as("max")))
          case "avg" =>
            DfSt(df.groupBy(keys: _*).agg(avg(toColumn(args.head)).as("avg")))
          // the closure-shaped fold: reduce(init, accExpr) — each group
          // collected as an event-time-sorted array, folded by a Catalyst
          // higher-order aggregate; accExpr sees `acc` + element fields
          case "reduce" => args match {
            case Seq(Lit(init), accExpr) =>
              val folded = aggregate(
                array_sort(collect_list(elemStruct)),
                lit(init),
                (acc, el) => toColumn(accExpr,
                  Map("acc" -> acc) ++
                    Seq("stamp", "seqId", "key", "attribute", "entity",
                      "uuid", "value").map(f => f -> el.getField(f))))
              DfSt(df.groupBy(keys: _*).agg(folded.as("reduced")))
            case _ => throw new IllegalArgumentException(
              "reduce needs (initLiteral, accumulatorExpression)")
          }
          // the other 1:N closure shape of the reference console —
          // groupReduce emitting N element rows per group
          // (WindowedStream.java:129) — scripted as top(n, orderExpr)
          // and lowered to a ranked window (one shuffle, spill-safe;
          // groups are never materialized on the driver)
          case "groupReduce" => args match {
            case Seq(Fn("top", Seq(Lit(n: Long), orderExpr))) =>
              val w = org.apache.spark.sql.expressions.Window
                .partitionBy(rawKeys: _*)
                .orderBy(toColumn(orderExpr).desc, col("stamp"), col("seqId"))
              DfSt(df
                .withColumn("rank", row_number().over(w))
                .filter(col("rank") <= n.toInt))
            case _ => throw new IllegalArgumentException(
              "groupReduce needs top(nLiteral, orderExpression)")
          }
          case other => throw new IllegalArgumentException(
            s"unknown grouped method '$other' " +
              "(count, sum, min, max, avg, reduce, groupReduce)")
        }
        case DoneSt(_) =>
          throw new IllegalArgumentException("terminal operation must be last")
      }
      case _ => throw new IllegalArgumentException(
        "pipeline must start with an entity name")
    }
    run(ast) match {
      case DoneSt(s)  => s
      case DfSt(df)   => renderRows(df, 20)
      case GrSt(_, _, _) => throw new IllegalArgumentException(
        "grouped pipeline needs an aggregation (count, sum, min, max, avg, reduce, groupReduce)")
    }
  }
}
