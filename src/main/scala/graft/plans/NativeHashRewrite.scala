package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Cast, Conv, Expression, Literal, Md5, Size, StringSplit, StringTrim, Substring}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{IntegerType, LongType, StringType}

import graft.functions.{Hash60Expr, TokenCountExpr}

/** Optimizer rule: rewrite the PORTABLE hash/count formulas into their
  * native graft expressions.
  *
  * The engine's cross-engine determinism story rests on functions-only
  * formulas every engine can replay — `conv(substring(md5(x), 1, 15),
  * 16, 10)::bigint` for the 60-bit base hash, `size(split(trim(x),
  * '\s+'))` for the whitespace token count. Users (and the DuckDB
  * oracle SQL) write THOSE; the graft Column API compiles to the native
  * byte-scan expressions directly. This rule closes the gap for SQL and
  * formula-written plans: a query arriving with the portable spelling is
  * rewritten to the native expression, so `spark.sql("... conv(substring(
  * md5(t),1,15),16,10) ...")` runs the same single-digest code path as
  * `hash60(col)` — three string materialisations per row (hex encode,
  * substring copy, radix parse) disappear without the author opting in.
  *
  * Bit-equality of the two spellings is spec-pinned (`Hash60Spec`,
  * `TokenCountSpec` prove it on arbitrary strings), so the rewrite can
  * never change a result — the precondition for ANY optimizer identity.
  * Registered via the public `SparkSessionExtensions.injectOptimizerRule`
  * hook ([[graft.functions.GraftExtensions]]); sessions without the
  * extension simply keep the portable plan.
  *
  * Reference provenance: the reference engine exposes no comparable
  * optimizer surface (its transforms are config-declared, e.g.
  * core/src/main/java/cz/o2/proxima/core/transform/Transformation.java);
  * plan rewriting is the Spark-native expression of "the engine picks
  * the fast implementation of a declared computation".
  */
object NativeHashRewrite extends Rule[LogicalPlan] {

  private def intLit(e: Expression, v: Int): Boolean = e match {
    case Literal(x: Int, IntegerType) => x == v
    case _ => false
  }

  /** `conv(substring(md5(x), 1, 15), 16, 10)` with x's ORIGINAL (pre
    * binary-cast) expression. The analyzer inserts `Cast(x, BinaryType)`
    * under `md5` for string inputs; either shape hashes the same bytes
    * ([[graft.functions.Hash60]] hashes the UTF-8 bytes of its string
    * child, and binary→string casts are byte-preserving).
    */
  private object Hash60Formula {
    def unapply(e: Expression): Option[Expression] = e match {
      case Conv(Substring(Md5(inner), pos, len), from, to, _)
          if intLit(pos, 1) && intLit(len, 15) &&
            intLit(from, 16) && intLit(to, 10) =>
        Some(inner match {
          case c: Cast if c.child.dataType == StringType => c.child
          case other if other.dataType == StringType => other
          case other => Cast(other, StringType)
        })
      case _ => None
    }
  }

  /** `size(split(trim(x), '\s+'))` — Spark's `trim` (space-only) under a
    * `\s+` split with the default -1 limit, the exact tokenization
    * [[graft.functions.TokenCount]] reimplements byte-wise.
    */
  private object TokenCountFormula {
    def unapply(e: Expression): Option[Expression] = e match {
      // legacySizeOfNull must be FALSE: under the legacy flag size(NULL)
      // is -1 while TokenCountExpr null-propagates — rewriting would
      // change a null row's result from -1 to NULL
      case Size(StringSplit(StringTrim(x, None), Literal(re, StringType), limit), false)
          if re != null && re.toString == "\\s+" &&
            (limit match {
              case Literal(l: Int, IntegerType) => l == -1
              case _ => false
            }) =>
        Some(x)
      case _ => None
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      // the formula is always consumed through a long cast (conv emits a
      // string); any eval mode is fine — 15 hex nibbles always parse
      case c: Cast if c.dataType == LongType =>
        c.child match {
          case Hash60Formula(x) => Hash60Expr(x)
          case _ => c
        }
      case Hash60Formula(x) =>
        // uncast consumers compare/join on the decimal STRING — preserve
        // the type by rendering the native hash back to string
        Cast(Hash60Expr(x), StringType)
      case TokenCountFormula(x) => TokenCountExpr(x)
    }
}
