package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, ExpressionInfo, Literal, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.{call_function, lit}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the hashed-shingle pass — THE cost
  * center of the dedup family (minhash signatures, LSH candidates,
  * Jaccard verification, the dedup/curation pipelines all start from
  * 60-bit hashes of n-token shingles).
  *
  * Semantically identical to
  * `transform(windows of split(trim(c), "\\s+"), w -> hash60(concat_ws(" ", w)))`
  * — i.e. per window of n consecutive tokens, the first 60 bits of the
  * md5 of the space-joined shingle string — but computed in ONE pass over
  * the UTF-8 bytes: token spans are byte offsets into the input, each
  * window's digest is fed the token slices plus 0x20 separators directly,
  * and no shingle string, token array or per-window allocation ever
  * materializes. Tokenization follows Spark `split` with Java limit -1
  * (space-only trim; a leading/trailing empty token when the trimmed
  * string starts/ends with non-space whitespace; ASCII whitespace
  * classes), so the hashes are bit-identical to the functions-only
  * formula the DuckDB oracles replay — pinned by `ShingleHash60Laws`
  * (JVM model) and `ShingleHash60Spec` (columnar formula).
  *
  * Registered as SQL function `graft_shingle60(text, n)` via
  * [[GraftExtensions]]; `n` must be a literal (it shapes the output).
  */
final case class Shingle60Expr(child: Expression, n: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_shingle60"

  override protected def nullSafeEval(input: Any): Any =
    ShingleHash60.hashes(input.asInstanceOf[UTF8String].getBytes, n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.ShingleHash60.hashes($c.getBytes(), $n)")

  override protected def withNewChildInternal(newChild: Expression): Shingle60Expr =
    copy(child = newChild)
}

object ShingleHash60 {

  private val digests = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  private def isWs(b: Byte): Boolean =
    b == 0x20 || b == 0x09 || b == 0x0a || b == 0x0b || b == 0x0c || b == 0x0d

  /** 60-bit hashes of all n-token shingles of the space-trimmed byte
    * string (see class doc for the exact split-matching tokenization).
    * Called from generated code — keep the signature Java-friendly.
    */
  def hashes(bytes: Array[Byte], n: Int): ArrayData = {
    var lo = 0
    var hi = bytes.length
    while (lo < hi && bytes(lo) == 0x20) lo += 1
    while (hi > lo && bytes(hi - 1) == 0x20) hi -= 1
    // token spans (start, end) into `bytes`; `\s+` splitting leaves no
    // interior empties — only a leading/trailing empty token when the
    // trimmed string starts/ends with non-space whitespace
    val starts = new java.util.ArrayList[Int]()
    val ends = new java.util.ArrayList[Int]()
    if (hi == lo) { starts.add(lo); ends.add(lo) } // "" -> one empty token
    else {
      if (isWs(bytes(lo))) { starts.add(lo); ends.add(lo) }
      var i = lo
      while (i < hi) {
        if (!isWs(bytes(i))) {
          val st = i
          while (i < hi && !isWs(bytes(i))) i += 1
          starts.add(st); ends.add(i)
        } else i += 1
      }
      if (isWs(bytes(hi - 1))) { starts.add(hi); ends.add(hi) }
    }
    val m = starts.size()
    if (m < n) return new GenericArrayData(Array.empty[Long])
    val out = new Array[Long](m - n + 1)
    val md = digests.get()
    var w = 0
    while (w < out.length) {
      md.reset()
      var j = 0
      while (j < n) {
        if (j > 0) md.update(0x20.toByte)
        val s = starts.get(w + j)
        md.update(bytes, s, ends.get(w + j) - s)
        j += 1
      }
      val d = md.digest()
      var v = 0L
      var b = 0
      while (b < 8) { v = (v << 8) | (d(b) & 0xffL); b += 1 }
      out(w) = v >>> 4
      w += 1
    }
    new GenericArrayData(out)
  }

  /** Column wrapper: array of 60-bit shingle hashes of `c` with window
    * size `n`. Self-registers on vanilla sessions like the other graft
    * expressions.
    */
  def column(c: Column, n: Int): Column = {
    GraftExtensions.ensureRegistered()
    call_function("graft_shingle60", c, lit(n))
  }

  val functionDescription: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_shingle60"),
    new ExpressionInfo(classOf[Shingle60Expr].getName, "graft_shingle60"),
    (children: Seq[Expression]) => {
      require(children.length == 2, "graft_shingle60 takes (text, n)")
      val n = children(1) match {
        case Literal(v: Int, IntegerType) => v
        case other => throw new IllegalArgumentException(
          s"graft_shingle60 needs a literal window size, got $other")
      }
      require(n >= 1, s"shingle size must be >= 1, got $n")
      Shingle60Expr(Cast(children.head, StringType), n)
    })
}
