package graft.expr

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Shared runtime for the two set-builder expressions below. One body
  * serves both `eval` and the generated code (the codegen win here is not
  * inlining arithmetic — it is escaping the interpreted higher-order
  * `transform` path, which dispatches a lambda `Expression.eval` per
  * ELEMENT; one virtual call per ROW into this helper is free by
  * comparison).
  */
object TextSetUtil {
  private val Space = UTF8String.fromString(" ")
  private val Empty = new GenericArrayData(Array.empty[Any])

  /** Distinct character n-grams in first-occurrence order — byte-equal to
    * `array_distinct(transform(sequence(1, len-n+1), i -> substr(c,i,n)))`.
    * One pass records the byte offset of every codepoint, so each gram is
    * an O(1) zero-copy view into one private byte copy of the string —
    * the HOF form re-scans from the string head per `substr` (O(len²)).
    */
  /** Byte offset of every codepoint (offs(len) = total bytes) — the one
    * UTF-8 walk both gram forms slice from; a malformed-byte-handling
    * fix must not have to land twice.
    */
  private def codepointOffsets(bytes: Array[Byte], len: Int): Array[Int] = {
    val offs = new Array[Int](len + 1)
    var c = 0
    var b = 0
    while (b < bytes.length) {
      offs(c) = b; c += 1
      b += UTF8String.numBytesForFirstByte(bytes(b))
    }
    offs(len) = bytes.length
    offs
  }

  def charGrams(s: UTF8String, n: Int): ArrayData = {
    val len = s.numChars()
    if (len < n) return Empty
    val bytes = s.getBytes
    val offs = codepointOffsets(bytes, len)
    val seen = new java.util.LinkedHashSet[UTF8String]()
    var i = 0
    while (i + n <= len) {
      seen.add(UTF8String.fromBytes(bytes, offs(i), offs(i + n) - offs(i)))
      i += 1
    }
    new GenericArrayData(seen.toArray(Array.empty[AnyRef]))
  }

  /** Character n-gram OCCURRENCE COUNTS in first-occurrence order:
    * (gram, count) structs, one per DISTINCT gram — the aggregation-
    * ready form [[CharGramCounts]] returns. Same one-pass codepoint
    * slicing as [[charGrams]]; the count fold happens here, inside the
    * codegen'd projection, so only |distinct grams| rows (bounded by
    * alphabet^n) ever leave the expression instead of len-n+1 occurrence
    * rows — the difference between shuffling a corpus-of-characters and
    * shuffling per-doc histograms.
    */
  def charGramCounts(s: UTF8String, n: Int): ArrayData = {
    val len = s.numChars()
    if (len < n) return Empty
    val bytes = s.getBytes
    val offs = codepointOffsets(bytes, len)
    val counts = new java.util.LinkedHashMap[UTF8String, java.lang.Long]()
    var i = 0
    while (i + n <= len) {
      val g = UTF8String.fromBytes(bytes, offs(i), offs(i + n) - offs(i))
      val prev = counts.get(g)
      counts.put(g, if (prev == null) 1L else prev + 1L)
      i += 1
    }
    val out = new Array[Any](counts.size())
    val it = counts.entrySet().iterator()
    var j = 0
    while (it.hasNext) {
      val e = it.next()
      out(j) = new GenericInternalRow(Array[Any](e.getKey, e.getValue.longValue))
      j += 1
    }
    new GenericArrayData(out)
  }

  /** Distinct word k-shingles ("a b c") in first-occurrence order —
    * byte-equal to `array_distinct(transform(sequence(0, size-k), i ->
    * concat_ws(" ", element_at(t,i+1)..element_at(t,i+k))))`, including
    * concat_ws's skip-null-argument contract.
    */
  def wordShingles(arr: ArrayData, k: Int): ArrayData = {
    val n = arr.numElements()
    if (n < k) return Empty
    val toks = new Array[UTF8String](n)
    var i = 0
    while (i < n) {
      toks(i) = if (arr.isNullAt(i)) null else arr.getUTF8String(i)
      i += 1
    }
    val seen = new java.util.LinkedHashSet[UTF8String]()
    // one reused window buffer: concatWs reads its varargs without
    // retaining them, so a per-window copyOfRange would be pure churn
    val win = new Array[UTF8String](k)
    i = 0
    while (i + k <= n) {
      System.arraycopy(toks, i, win, 0, k)
      seen.add(UTF8String.concatWs(Space, win: _*))
      i += 1
    }
    new GenericArrayData(seen.toArray(Array.empty[AnyRef]))
  }
}

/** Distinct character n-gram set of a string (see [[TextSetUtil.charGrams]]).
  * Replaces the interpreted `transform`+`substr` pipeline that dominated
  * the char-gram dedup's set-build stage (measured 1.3 s of the sf0.1
  * bench for 5 k documents).
  */
case class CharGrams(child: Expression, n: Int) extends UnaryExpression {
  require(n > 0, s"char_grams window must be positive, got $n")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"char_grams requires string, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "char_grams"

  override def nullSafeEval(input: Any): Any =
    TextSetUtil.charGrams(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.expr.TextSetUtil.charGrams($a, $n);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Character n-gram occurrence histogram of a string:
  * array<struct<g: string, c: long>>, one entry per distinct gram (see
  * [[TextSetUtil.charGramCounts]]). The aggregation-ready sibling of
  * [[CharGrams]] for consumers that need COUNTS (the bigram LM), built
  * so the per-occurrence fold runs inside whole-stage codegen and only
  * the alphabet^n-bounded histogram rows reach the explode.
  */
case class CharGramCounts(child: Expression, n: Int)
    extends UnaryExpression {
  require(n > 0, s"char_gram_counts window must be positive, got $n")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"char_gram_counts requires string, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("g", StringType, nullable = false),
      StructField("c", LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "char_gram_counts"

  override def nullSafeEval(input: Any): Any =
    TextSetUtil.charGramCounts(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.expr.TextSetUtil.charGramCounts($a, $n);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Distinct word k-shingle set of a token array (see
  * [[TextSetUtil.wordShingles]]).
  */
case class WordShingles(child: Expression, k: Int) extends UnaryExpression {
  require(k > 0, s"word_shingles window must be positive, got $k")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"word_shingles requires array<string>, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_shingles"

  override def nullSafeEval(input: Any): Any =
    TextSetUtil.wordShingles(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.expr.TextSetUtil.wordShingles($a, $k);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TextSetExprs {
  /** Distinct character n-grams of a string column. */
  def charGrams(c: Column, n: Int): Column =
    GraftSqlBridge.column(CharGrams(GraftSqlBridge.expression(c), n))

  /** Per-distinct-gram occurrence counts of a string column:
    * array<struct<g, c>>.
    */
  def charGramCounts(c: Column, n: Int): Column =
    GraftSqlBridge.column(CharGramCounts(GraftSqlBridge.expression(c), n))

  /** Distinct word k-shingles of a token-array column. */
  def wordShingles(t: Column, k: Int): Column =
    GraftSqlBridge.column(WordShingles(GraftSqlBridge.expression(t), k))
}
