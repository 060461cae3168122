package graft.tools

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.{Column, DataFrame}

/** Runtime compiler for free-form console closures — the reference
  * console compiles arbitrary Groovy closures typed at the prompt
  * (reference: tools/.../Console.java:44, compiler/lib/.../Compiler.java;
  * `env.user.filter { it.value == "on" }`). The Spark-first counterpart
  * compiles SCALA source with the runtime ToolBox (scala-compiler ships
  * on the classpath), but the closure's TYPE keeps execution
  * distributed: instead of a per-element lambda (which the reference
  * ships to workers — driver-side eval on Beam's direct runner), a
  * console closure here evaluates to a Catalyst [[Column]] (element
  * fields and `org.apache.spark.sql.functions._` in scope) or to a
  * whole-pipeline `DataFrame => DataFrame`. The compiled result is pure
  * plan — codegen'd, serializable, nothing ToolBox-classloaded ever
  * crosses an executor boundary, which is exactly the property that
  * makes runtime-compiled code safe under Spark's closure serialization
  * (a ToolBox-compiled per-element lambda would need its synthetic
  * classes on every executor's classpath).
  *
  * Compilation is cached per source string (a console replays the same
  * snippets), and the single ToolBox is synchronized (scalac is not
  * thread-safe).
  */
object ShellCompiler {

  private lazy val toolbox = {
    import scala.tools.reflect.ToolBox
    scala.reflect.runtime.universe.runtimeMirror(getClass.getClassLoader).mkToolBox()
  }

  private val cache = TrieMap.empty[String, Any]

  /** Cache bound: a console session replays a handful of snippets, but
    * a SCRIPT generating unique source per line would otherwise grow
    * the cache (and the ToolBox's loaded classes) without limit — at
    * the cap the cache resets wholesale (recompiling a snippet is
    * cheap; the compiled-class accumulation inside the ToolBox
    * classloader is the JVM-lifetime cost this cannot reclaim, which
    * is inherent to runtime compilation).
    */
  private val MaxCached = 512

  private def compile(src: String, what: String): Any = {
    if (cache.size >= MaxCached) cache.clear()
    cache.getOrElseUpdate(src,
      try toolbox.synchronized(toolbox.eval(toolbox.parse(src)))
      catch {
        case e: scala.tools.reflect.ToolBoxError =>
          // first line only: scalac's full message quotes the template
          throw new IllegalArgumentException(
            s"scala($what) does not compile: " +
              e.getMessage.linesIterator.take(2).mkString(" "))
      })
  }

  /** Compile a column-level closure: `body` is Scala source evaluating
    * to a [[Column]], with the element fields bound as Columns (`value`
    * reads as UTF-8 text like the DSL's `value`; `rawValue` is the
    * binary column) and `functions._` imported.
    */
  def columnClosure(body: String): Column = {
    val src =
      s"""{
         |  import org.apache.spark.sql.functions._
         |  import org.apache.spark.sql.Column
         |  val key: Column = col("key")
         |  val attribute: Column = col("attribute")
         |  val entity: Column = col("entity")
         |  val uuid: Column = col("uuid")
         |  val stamp: Column = col("stamp")
         |  val seqId: Column = col("seqId")
         |  val rawValue: Column = col("value")
         |  val value: Column = col("value").cast("string")
         |  ($body): Column
         |}""".stripMargin
    compile(src, "column closure").asInstanceOf[Column]
  }

  /** Compile a pipeline-level closure: `body` is Scala source evaluating
    * to a `DataFrame => DataFrame` — the whole Dataset API at the
    * prompt, the full generality of the reference console's scripted
    * pipelines.
    */
  def dfClosure(body: String): DataFrame => DataFrame = {
    val src =
      s"""{
         |  import org.apache.spark.sql.functions._
         |  import org.apache.spark.sql.{Column, DataFrame}
         |  ($body): (DataFrame => DataFrame)
         |}""".stripMargin
    compile(src, "pipeline closure").asInstanceOf[DataFrame => DataFrame]
  }
}
