package graft.expr

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Fused MinHash signature: k per-permutation minima over a shingle set in
  * one codegen'd pass.
  *
  * The declarative form — `transform(sequence(0,k-1), i ->
  * array_min(transform(shingles, s -> xxhash64(i, s))))` — is semantically
  * identical but CodegenFallback-interpreted and re-hashes every shingle
  * string k times: 128 × |shingles| full string hashes per document, the
  * dominant cost of `dedup_near_minhash` (measured 12.5 s of the sf0.1
  * bench). This expression hashes each shingle ONCE (xxhash64 of the
  * bytes), then derives the k permutation values by hashing that single
  * long per permutation — an O(|shingles| · k) loop of 8-byte hashes
  * inside whole-stage codegen, no intermediate arrays.
  *
  * The hash family differs from the HOF form, which is immaterial: LSH
  * signature internals only shape the CANDIDATE set; the exact-Jaccard
  * verification step fixes the output, and the DuckDB oracle (brute-force
  * all-pairs) checks that no true pair is lost.
  */
case class MinHashSignature(child: Expression, k: Int)
    extends UnaryExpression {
  // construction-time guard like the sibling gram/shingle expressions:
  // k = 0 would silently sign every doc with an empty signature (all
  // docs collide), k < 0 would surface as a per-row
  // NegativeArraySizeException deep in generated code
  require(k > 0, s"minhash_signature k must be positive, got $k")

  // SQL-registered: a non-string-array argument must fail ANALYSIS, not
  // reach getUTF8String over arbitrary bytes at runtime
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_signature requires array<string>, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_signature"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val sig = Array.fill(k)(Long.MaxValue)
    val n = arr.numElements()
    var j = 0
    while (j < n) {
      // skip null elements: the engine pipeline never produces them, but
      // minhash_signature is SQL-registered and user SQL can pass
      // array('a', NULL) — a null contributes nothing to a set sketch
      if (!arr.isNullAt(j)) {
        val s = arr.getUTF8String(j)
        val base = XXH64.hashUnsafeBytes(
          s.getBaseObject, s.getBaseOffset, s.numBytes, 42L)
        var i = 0
        while (i < k) {
          val h = XXH64.hashLong(base, i.toLong)
          if (h < sig(i)) sig(i) = h
          i += 1
        }
      }
      j += 1
    }
    new GenericArrayData(sig)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val xxh = classOf[XXH64].getName
      val gad = classOf[GenericArrayData].getName
      val sig = ctx.freshName("sig")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val s = ctx.freshName("s")
      val base = ctx.freshName("base")
      val h = ctx.freshName("h")
      s"""
         |long[] $sig = new long[$k];
         |java.util.Arrays.fill($sig, Long.MAX_VALUE);
         |int $n = $a.numElements();
         |for (int $j = 0; $j < $n; $j++) {
         |  if ($a.isNullAt($j)) continue;  // null element: no set contribution
         |  org.apache.spark.unsafe.types.UTF8String $s = $a.getUTF8String($j);
         |  long $base = $xxh.hashUnsafeBytes(
         |    $s.getBaseObject(), $s.getBaseOffset(), $s.numBytes(), 42L);
         |  for (int $i = 0; $i < $k; $i++) {
         |    long $h = $xxh.hashLong($base, (long) $i);
         |    if ($h < $sig[$i]) $sig[$i] = $h;
         |  }
         |}
         |${ev.value} = new $gad($sig);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashExprs {
  /** k-element MinHash signature of an array<string> shingle set. */
  def minhashSignature(shingles: Column, k: Int): Column =
    GraftSqlBridge.column(
      MinHashSignature(GraftSqlBridge.expression(shingles), k))
}
