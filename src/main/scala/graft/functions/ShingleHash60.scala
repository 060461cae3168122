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

/** Native DSIR feature extraction ([[Dsir.featureBuckets]] semantics):
  * per document, the `[0, b)` buckets of `hash60(salt ++ gram)` for every
  * word unigram followed by every word bigram — ONE byte scan, no token
  * array, no gram strings, no interpreted higher-order functions in the
  * model-build/scoring hot path. Bit-equality with the functions-only
  * formula (`transform`/`zip_with` over `split`) is spec-pinned.
  */
final case class DsirBuckets60Expr(child: Expression, salt: String, b: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_dsir_buckets"

  private val saltBytes = salt.getBytes(java.nio.charset.StandardCharsets.UTF_8)

  override protected def nullSafeEval(input: Any): Any =
    ShingleHash60.dsirBuckets(
      input.asInstanceOf[UTF8String].getBytes, saltBytes, b)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val saltRef = ctx.addReferenceObj("salt", saltBytes, "byte[]")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.ShingleHash60.dsirBuckets($c.getBytes(), $saltRef, $b)")
  }

  override protected def withNewChildInternal(newChild: Expression): DsirBuckets60Expr =
    copy(child = newChild)
}

/** Native segment hashing ([[Curation.segmentDedup]] semantics): 60-bit
  * hashes of `hash60(salt ++ segment)` for NON-overlapping `n`-token
  * windows (stride = n), ragged tail included — `ceil(m/n)` hashes for an
  * `m`-token document, one byte scan, no segment strings.
  */
final case class Segment60Expr(child: Expression, n: Int, salt: String)
    extends UnaryExpression {
  require(n >= 1, s"segment size must be >= 1, got $n")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_segment60"

  private val saltBytes = salt.getBytes(java.nio.charset.StandardCharsets.UTF_8)

  override protected def nullSafeEval(input: Any): Any =
    ShingleHash60.segmentHashes(
      input.asInstanceOf[UTF8String].getBytes, saltBytes, n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val saltRef = ctx.addReferenceObj("salt", saltBytes, "byte[]")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.ShingleHash60.segmentHashes($c.getBytes(), $saltRef, $n)")
  }

  override protected def withNewChildInternal(newChild: Expression): Segment60Expr =
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
    val (starts, ends) = spans(bytes)
    val m = starts.size()
    if (m < n) return new GenericArrayData(Array.empty[Long])
    val out = new Array[Long](m - n + 1)
    fill(out, 0, out.length, bytes, starts, ends, EmptySalt, n,
      stride = 1, mod = 0L)
    new GenericArrayData(out)
  }

  private val EmptySalt = Array.emptyByteArray

  /** Token spans (start, end) into `bytes` after space-only trim; `\s+`
    * splitting leaves no interior empties — only a leading/trailing empty
    * token when the trimmed string starts/ends with non-space whitespace,
    * and a single empty token for the all-space string.
    */
  private def spans(
      bytes: Array[Byte]): (java.util.ArrayList[Int], java.util.ArrayList[Int]) = {
    var lo = 0
    var hi = bytes.length
    while (lo < hi && bytes(lo) == 0x20) lo += 1
    while (hi > lo && bytes(hi - 1) == 0x20) hi -= 1
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
    (starts, ends)
  }

  /** Hash `count` `stride`-spaced `n`-token windows into `out` starting
    * at `off`: digest = md5(salt ++ tokens joined by 0x20), hash = first
    * 60 bits, `% mod` applied when mod > 0. Windows whose tail would pass
    * the last token are CLAMPED (ragged-tail segments).
    */
  private def fill(out: Array[Long], off: Int, count: Int,
      bytes: Array[Byte],
      starts: java.util.ArrayList[Int], ends: java.util.ArrayList[Int],
      salt: Array[Byte], n: Int, stride: Int, mod: Long): Unit = {
    val m = starts.size()
    val md = digests.get()
    var w = 0
    while (w < count) {
      md.reset()
      if (salt.length > 0) md.update(salt)
      var j = 0
      val base = w * stride
      val limit = math.min(n, m - base)
      while (j < limit) {
        if (j > 0) md.update(0x20.toByte)
        val s = starts.get(base + j)
        md.update(bytes, s, ends.get(base + j) - s)
        j += 1
      }
      val d = md.digest()
      var v = 0L
      var b = 0
      while (b < 8) { v = (v << 8) | (d(b) & 0xffL); b += 1 }
      val h = v >>> 4
      out(off + w) = if (mod > 0) h % mod else h
      w += 1
    }
  }

  /** DSIR feature buckets: `[0, b)` buckets of all salted unigram hashes
    * followed by all salted bigram hashes — one span scan, one output
    * array. Called from generated code.
    */
  def dsirBuckets(bytes: Array[Byte], salt: Array[Byte], b: Int): ArrayData = {
    val (starts, ends) = spans(bytes)
    val m = starts.size()
    val nBig = math.max(m - 1, 0)
    val out = new Array[Long](m + nBig)
    fill(out, 0, m, bytes, starts, ends, salt, n = 1, stride = 1,
      mod = b.toLong)
    fill(out, m, nBig, bytes, starts, ends, salt, n = 2, stride = 1,
      mod = b.toLong)
    new GenericArrayData(out)
  }

  /** Segment hashes: salted hashes of non-overlapping `n`-token windows,
    * ragged tail included — `ceil(m/n)` entries. Called from generated
    * code.
    */
  def segmentHashes(bytes: Array[Byte], salt: Array[Byte], n: Int): ArrayData = {
    val (starts, ends) = spans(bytes)
    val m = starts.size()
    val out = new Array[Long]((m + n - 1) / n)
    fill(out, 0, out.length, bytes, starts, ends, salt, n = n, stride = n,
      mod = 0L)
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

  /** Column wrapper for [[DsirBuckets60Expr]]. */
  def dsirBucketsColumn(c: Column, salt: String, b: Int): Column = {
    GraftExtensions.ensureRegistered()
    call_function("graft_dsir_buckets", c, lit(salt), lit(b))
  }

  /** Column wrapper for [[Segment60Expr]]. */
  def segmentColumn(c: Column, n: Int, salt: String): Column = {
    GraftExtensions.ensureRegistered()
    call_function("graft_segment60", c, lit(n), lit(salt))
  }

  private def litString(e: Expression, what: String): String = e match {
    case Literal(v: UTF8String, StringType) => v.toString
    case other =>
      throw new IllegalArgumentException(s"$what must be a literal string, got $other")
  }

  private def litInt(e: Expression, what: String): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case other =>
      throw new IllegalArgumentException(s"$what must be a literal int, got $other")
  }

  val dsirFunctionDescription: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_dsir_buckets"),
    new ExpressionInfo(classOf[DsirBuckets60Expr].getName, "graft_dsir_buckets"),
    (children: Seq[Expression]) => {
      require(children.length == 3, "graft_dsir_buckets takes (text, salt, b)")
      val b = litInt(children(2), "bucket count")
      require(b >= 1, s"bucket count must be >= 1, got $b")
      DsirBuckets60Expr(Cast(children.head, StringType),
        litString(children(1), "salt"), b)
    })

  val segmentFunctionDescription: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_segment60"),
    new ExpressionInfo(classOf[Segment60Expr].getName, "graft_segment60"),
    (children: Seq[Expression]) => {
      require(children.length == 3, "graft_segment60 takes (text, n, salt)")
      val n = litInt(children(1), "segment size")
      require(n >= 1, s"segment size must be >= 1, got $n")
      Segment60Expr(Cast(children.head, StringType), n,
        litString(children(2), "salt"))
    })
}
