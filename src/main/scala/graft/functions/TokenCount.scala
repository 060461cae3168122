package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for whitespace token counting — the
  * text-statistics hot path (token counts, quality gates, sequence
  * packing).
  *
  * Semantically identical to `size(split(trim(c), "\\s+"))` — trim
  * strips 0x20 only (Spark `trim` semantics), then the count follows
  * Java `split(regex, -1)`: an empty trimmed string is ONE (empty)
  * token; otherwise each maximal non-whitespace run is a token, plus a
  * leading/trailing empty token when the trimmed string still starts/
  * ends with non-space whitespace. Computed as a single byte scan — no
  * per-row string array, no regex machinery. ASCII whitespace classes
  * only, matching Java's default `\s`; UTF-8 continuation bytes never
  * collide with them. Registered as SQL function `graft_token_count`
  * via [[GraftExtensions]]; bit-equality with the split-based formula
  * is pinned by `TokenCountSpec` (columnar) and `TokenCountLaws`
  * (arbitrary strings).
  */
final case class TokenCountExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_token_count"

  override protected def nullSafeEval(input: Any): Any =
    TokenCount.count(input.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TokenCount.count($c.getBytes())")

  override protected def withNewChildInternal(newChild: Expression): TokenCountExpr =
    copy(child = newChild)
}

object TokenCount {

  private def isWs(b: Byte): Boolean =
    b == 0x20 || b == 0x09 || b == 0x0a || b == 0x0b || b == 0x0c || b == 0x0d

  /** Token count of the space-trimmed byte string (see class doc for the
    * exact `split`-matching semantics). Called from generated code.
    */
  def count(bytes: Array[Byte]): Int = {
    var lo = 0
    var hi = bytes.length
    while (lo < hi && bytes(lo) == 0x20) lo += 1
    while (hi > lo && bytes(hi - 1) == 0x20) hi -= 1
    if (hi == lo) return 1
    var runs = 0
    var inRun = false
    var i = lo
    while (i < hi) {
      val ws = isWs(bytes(i))
      if (!ws && !inRun) { runs += 1; inRun = true }
      else if (ws) inRun = false
      i += 1
    }
    runs + (if (isWs(bytes(lo))) 1 else 0) + (if (isWs(bytes(hi - 1))) 1 else 0)
  }

  /** Column wrapper: token count of `trim(c)` as the native expression.
    * Registers into the active session's registry on first use if the
    * [[GraftExtensions]] hook was not installed (vanilla sessions).
    */
  def column(c: Column): Column = {
    GraftExtensions.ensureRegistered()
    call_function("graft_token_count", c)
  }

  val functionDescription: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_token_count"),
    new ExpressionInfo(classOf[TokenCountExpr].getName, "graft_token_count"),
    (children: Seq[Expression]) => {
      require(children.length == 1, "graft_token_count takes exactly one argument")
      TokenCountExpr(Cast(children.head, StringType))
    })
}
