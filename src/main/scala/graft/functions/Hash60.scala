package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.sql.{Column, SparkSessionExtensions}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the 60-bit md5-prefix base hash used by
  * every sketch operator ([[MinHashLsh]], [[DedupPipeline]], [[Curation]]).
  *
  * Semantically identical to `conv(substring(md5(c), 1, 15), 16, 10)
  * .cast("long")` — the first 15 hex nibbles of the md5 digest read as an
  * unsigned integer — but computed straight from the digest bytes
  * (big-endian first 8 bytes `>>> 4`), skipping three string
  * materialisations per row (32-char hex encode, substring copy, conv
  * radix parse). Participates in whole-stage codegen via [[doGenCode]];
  * falls back to [[nullSafeEval]] in interpreted mode with the identical
  * arithmetic.
  *
  * Registered through the public `SparkSessionExtensions.injectFunction`
  * hook (see [[GraftExtensions]]) as SQL function `graft_hash60`, so both
  * the Column API ([[Hash60.column]]) and `spark.sql("... graft_hash60(s)
  * ...")` reach the same expression.
  *
  * Cross-engine determinism (the DuckDB oracles recompute the identical
  * integers from the md5 hex string) is pinned by `Hash60Spec`, which
  * proves bit-equality against the functions-only formula
  * [[MinHashLsh.hash60Reference]] on arbitrary strings.
  */
final case class Hash60Expr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_hash60"

  override protected def nullSafeEval(input: Any): Any =
    Hash60.digest60(input.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Hash60.digest60($c.getBytes())")

  override protected def withNewChildInternal(newChild: Expression): Hash60Expr =
    copy(child = newChild)
}

object Hash60 {

  private val digests = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** First 60 bits of md5(bytes): big-endian read of digest bytes 0..7,
    * unsigned-shifted right 4 to drop the 16th nibble. Always in
    * [0, 2^60), hence never negative. Called from generated code — keep
    * the signature Java-primitive.
    */
  def digest60(bytes: Array[Byte]): Long = {
    val md = digests.get()
    md.reset()
    val d = md.digest(bytes)
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    v >>> 4
  }

  /** Column wrapper: `hash60(c)` as the native expression, resolved through
    * the session function registry. [[GraftExtensions]] (installed by
    * [[graft.GraftSession]]) registers it at session build; for a vanilla
    * `SparkSession` the wrapper registers into the active session's
    * registry on first use, so the Column API never needs the extension.
    */
  def column(c: Column): Column = {
    GraftExtensions.ensureRegistered()
    call_function("graft_hash60", c)
  }

  /** Function registration for `SparkSessionExtensions.injectFunction`.
    * The builder casts its argument to string, mirroring `md5(c)`'s
    * implicit cast in the reference formula.
    */
  val functionDescription: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_hash60"),
    new ExpressionInfo(classOf[Hash60Expr].getName, "graft_hash60"),
    (children: Seq[Expression]) => {
      require(children.length == 1, "graft_hash60 takes exactly one argument")
      Hash60Expr(Cast(children.head, StringType))
    })
}

/** Engine extensions installed via the public
  * `SparkSession.builder().withExtensions` hook: native graft expressions
  * become session SQL functions usable from both the Column API and raw
  * SQL. A cluster deployment can equivalently set
  * `spark.sql.extensions=graft.functions.GraftExtensions`.
  */
final class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.install(ext)
}

object GraftExtensions {
  def install(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(Hash60.functionDescription)
    ext.injectFunction(TokenCount.functionDescription)
    ext.injectFunction(ShingleHash60.functionDescription)
    ext.injectFunction(ShingleHash60.dsirFunctionDescription)
    ext.injectFunction(ShingleHash60.segmentFunctionDescription)
    ext.injectFunction(Winnow60.functionDescription)
    ext.injectFunction(MightContain.functionDescription)
    ext.injectFunction(DotProduct.functionDescription)
    // portable formula -> native expression rewrites (see NativeHashRewrite)
    ext.injectOptimizerRule(_ => graft.plans.NativeHashRewrite)
  }

  /** Fallback for sessions built WITHOUT the extension: register the graft
    * functions into the active (or default) session's own registry if they
    * are absent, so [[Hash60.column]] / [[TokenCount.column]] analyze on a
    * vanilla `SparkSession` too. Session-scoped and idempotent; a column
    * built with no session at all is left to resolve at analysis time
    * against whatever session runs it (where `GraftSession` installs the
    * extension anyway).
    */
  def ensureRegistered(): Unit =
    org.apache.spark.sql.classic.SparkSession.getActiveSession
      .orElse(org.apache.spark.sql.classic.SparkSession.getDefaultSession)
      .foreach { s =>
        val reg = s.sessionState.functionRegistry
        Seq(Hash60.functionDescription, TokenCount.functionDescription,
          ShingleHash60.functionDescription,
          ShingleHash60.dsirFunctionDescription,
          ShingleHash60.segmentFunctionDescription,
          Winnow60.functionDescription,
          MightContain.functionDescription,
          DotProduct.functionDescription).foreach {
          case (ident, info, builder) =>
            if (!reg.functionExists(ident)) reg.registerFunction(ident, info, builder)
        }
        // the extension hook is gone on an already-built session; the
        // experimental batch runs the same rewrite rule
        if (!s.experimental.extraOptimizations.contains(graft.plans.NativeHashRewrite))
          s.experimental.extraOptimizations =
            s.experimental.extraOptimizations :+ graft.plans.NativeHashRewrite
      }
}
