package graft.expr

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** 64-bit SimHash over a feature (shingle/token) set: per bit, sum +1/-1
  * votes from every feature's hash, emit the sign vector packed into one
  * long. Near-duplicate documents differ in few features, so their
  * fingerprints differ in few BITS — hamming distance becomes the
  * similarity measure, and 4-bit band blocking turns dedup into an
  * equi-join (no all-pairs), the same candidate-generation shape as
  * MinHash-LSH but with a 1-word signature.
  *
  * Codegen'd single pass (like [[MinHashSignature]]): one byte-hash per
  * feature, 64 counter updates, packed sign at the end.
  */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash64 requires array<string>, got ${other.catalogString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val votes = new Array[Int](64)
    val n = arr.numElements()
    var j = 0
    while (j < n) {
      // skip null elements (same contract as MinHashSignature: a null
      // feature contributes nothing; guards user SQL like
      // simhash64(array('a', NULL)) against an opaque NPE)
      if (!arr.isNullAt(j)) {
        val s = arr.getUTF8String(j)
        val h = XXH64.hashUnsafeBytes(
          s.getBaseObject, s.getBaseOffset, s.numBytes, 42L)
        var i = 0
        while (i < 64) {
          if (((h >>> i) & 1L) == 1L) votes(i) += 1 else votes(i) -= 1
          i += 1
        }
      }
      j += 1
    }
    var sig = 0L
    var i = 0
    while (i < 64) { if (votes(i) > 0) sig |= (1L << i); i += 1 }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val xxh = classOf[XXH64].getName
      val votes = ctx.freshName("votes")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val s = ctx.freshName("s")
      val h = ctx.freshName("h")
      val sig = ctx.freshName("sig")
      s"""
         |int[] $votes = new int[64];
         |int $n = $a.numElements();
         |for (int $j = 0; $j < $n; $j++) {
         |  if ($a.isNullAt($j)) continue;  // null feature: no vote
         |  org.apache.spark.unsafe.types.UTF8String $s = $a.getUTF8String($j);
         |  long $h = $xxh.hashUnsafeBytes(
         |    $s.getBaseObject(), $s.getBaseOffset(), $s.numBytes(), 42L);
         |  for (int $i = 0; $i < 64; $i++) {
         |    if ((($h >>> $i) & 1L) == 1L) $votes[$i]++; else $votes[$i]--;
         |  }
         |}
         |long $sig = 0L;
         |for (int $i = 0; $i < 64; $i++) {
         |  if ($votes[$i] > 0) $sig |= (1L << $i);
         |}
         |${ev.value} = $sig;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHashExprs {
  /** 64-bit SimHash fingerprint of an array<string> feature set. */
  def simhash64(features: Column): Column =
    GraftSqlBridge.column(SimHash64(GraftSqlBridge.expression(features)))
}
