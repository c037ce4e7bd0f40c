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

/** Count of equal BYTES between two packed byte arrays stored as
  * array<long> — the comparator of the r14 packed coarse-estimate
  * prune: 64 byte-quantized minhash positions travel as 8 longs
  * through the band join's carry columns, and this expression scores a
  * candidate pair IN-STAGE (inside the join's output codegen, before
  * any exchange) so banding noise dies before the distinct shuffle and
  * the 1 KB-signature estimate join-backs ever see it. Byte b of word
  * w is position w·8+b's minhash minimum truncated to 8 bits, so
  * matches/positions estimates Jaccard with a +(1−J)/256 truncation
  * inflation (recall-helping only). Per word one SWAR zero-byte count
  * over the XOR — no loops over bytes, no allocation; mismatched
  * lengths score the common prefix (the callers always build equal
  * widths).
  */
case class PackedEqBytes(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"packed_eq_bytes requires two array<long>, got " +
          s"${l.catalogString} / ${r.catalogString}")
    }
  override def dataType: DataType =
    org.apache.spark.sql.types.IntegerType
  override def prettyName: String = "packed_eq_bytes"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var eq = 0
    var i = 0
    while (i < n) {
      eq += PackedEqBytes.eqBytes(a.getLong(i), b.getLong(i))
      i += 1
    }
    eq
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val cls = PackedEqBytes.getClass.getName.stripSuffix("$") + "$.MODULE$"
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val eq = ctx.freshName("eq")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |int $eq = 0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $eq += $cls.eqBytes($a.getLong($i), $b.getLong($i));
         |}
         |${ev.value} = $eq;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object PackedEqBytes {
  /** Equal-byte count of two longs: SWAR zero-byte detect on the XOR —
    * a zero byte in x yields exactly one set bit (its 0x80 position)
    * in ~((x & 0x7f…) + 0x7f… | x | 0x7f…).
    */
  def eqBytes(la: Long, lb: Long): Int = {
    val x = la ^ lb
    val m = 0x7f7f7f7f7f7f7f7fL
    java.lang.Long.bitCount(~(((x & m) + m) | x | m))
  }
}

object MinHashExprs {
  /** k-element MinHash signature of an array<string> shingle set. */
  def minhashSignature(shingles: Column, k: Int): Column =
    GraftSqlBridge.column(
      MinHashSignature(GraftSqlBridge.expression(shingles), k))

  /** In-stage packed-pair score — see [[PackedEqBytes]]. */
  def packedEqBytes(a: Column, b: Column): Column =
    GraftSqlBridge.column(PackedEqBytes(
      GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))
}
