package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expression for the dense dot product — the scoring
  * kernel of the distributed ANN join ([[IvfStore.searchTopKJoin]]),
  * where both alternatives measured an order of magnitude slower at
  * 250k candidate pairs: a typed `mapPartitions` deserializes two
  * 64-element arrays per pair through the encoder, and the
  * `zip_with`/`aggregate` higher-order form pays an interpreted lambda
  * invocation per ELEMENT. This expression loops over the unsafe
  * ArrayData in generated code — no per-element closures, no encoder
  * round trip — with the identical left-to-right addition order as the
  * [[Similarity]] while-loop kernels (bit-equal results, spec-pinned).
  *
  * Registered as SQL function `graft_dot` (see [[GraftExtensions]]).
  */
final case class DotProductExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_dot takes two array<double> arguments; got " +
          s"${left.dataType.simpleString}, ${right.dataType.simpleString}")
  }

  /** Left-to-right fold in the [[Similarity]] kernel order, over
    * EQUAL-LENGTH arrays only — a dimension mismatch (or a NULL element)
    * throws IllegalArgumentException rather than scoring a truncated
    * prefix (see [[DotProduct.dot]] for the rationale). Called from
    * generated code too.
    */
  override protected def nullSafeEval(a: Any, b: Any): Any =
    DotProduct.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.DotProduct.dot($a, $b)")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): DotProductExpr =
    copy(left = newLeft, right = newRight)
}

object DotProduct {

  /** Primitive kernel shared by interpreted eval and generated code:
    * ArrayData.getDouble avoids materializing a scala Array per row.
    *
    * The [[Similarity]] kernels this is documented bit-equal to assume
    * equal-length, non-null-element arrays — so those preconditions are
    * ENFORCED, not papered over: a dimension mismatch throws (a silent
    * min-length fold would score a truncated vector as if it were the
    * real one), and a NULL element throws (ArrayData implementations
    * disagree on what getDouble(null) even does — 0.0 on unsafe rows, an
    * NPE on generic ones — so "defined by accident" is the alternative).
    * A null ARRAY still yields SQL NULL via the nullSafeEval contract.
    * The null-bit test is a branch that never mispredicts on clean data;
    * q_ann_join's bench row guards the cost.
    */
  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    if (b.numElements() != n)
      throw new IllegalArgumentException(
        s"graft_dot: dimension mismatch — ${n} vs ${b.numElements()} " +
          "elements (embeddings scored together must share one dimension)")
    var s = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i))
        throw new IllegalArgumentException(
          s"graft_dot: null element at index $i — a vector with missing " +
            "dimensions cannot be scored; filter or impute upstream")
      s += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    s
  }

  /** `dot(a, b)` as the native expression (both columns array<double>). */
  def column(a: Column, b: Column): Column = {
    GraftExtensions.ensureRegistered()
    call_function("graft_dot", a, b)
  }

  val functionDescription: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_dot"),
    new ExpressionInfo(classOf[DotProductExpr].getName, "graft_dot"),
    (children: Seq[Expression]) => {
      require(children.length == 2, "graft_dot takes exactly two arguments")
      DotProductExpr(children.head, children(1))
    })
}
