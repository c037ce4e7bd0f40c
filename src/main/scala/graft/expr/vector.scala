package graft.expr

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Native Catalyst expression for the vector hot path (SURVEY.md §7.4).
  *
  * The higher-order-function composition (`aggregate(zip_with(a,b,*),+)`)
  * is semantically right but physically interpreted: HOFs are
  * CodegenFallback, so every pair evaluation allocates a lambda frame and
  * an intermediate 64-element array — measured as the dominant cost of the
  * similarity queries. This expression is the engine's "custom Expression
  * with doGenCode beats UDF beats nothing" tier: a fused dot-product loop
  * over the two `ArrayData` values, participating in whole-stage codegen,
  * zero intermediate allocation.
  *
  * Summation order is ascending index — identical to the HOF fold it
  * replaces and to the DuckDB oracle's list order, so results are
  * bit-identical and the oracle SQL is unchanged. Null semantics also
  * mirror the HOF exactly (a requirement for [[FuseDotProduct]] to be a
  * valid rewrite): mismatched lengths or any null element yield NULL,
  * the same poisoning `zip_with` padding + null-propagating `*`/`+`
  * produce; an empty pair yields the fold's zero, 0.0.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  // SQL-registered: a non-double-array argument must fail ANALYSIS, not
  // reach getDouble over arbitrary bytes at runtime (call sites widen
  // float arrays explicitly before constructing the expression)
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"dot_product requires two array<double>, got " +
          s"${l.catalogString} and ${r.catalogString}")
    }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_product"
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      s += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = $a.numElements();
         |double $s = 0.0;
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $s += $a.getDouble($i) * $b.getDouble($i);
         |  }
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** 64-bit random-hyperplane sign sketch over an array<double> vector
  * (SimHash for the continuous case): plane j's component at dimension i
  * is ±1 drawn from bit j of `xxhash64(i)` — deterministic, shared by
  * every row, never materialized — and bit j of the sketch is the sign of
  * `Σ_i v(i) · plane_j(i)`. Vectors at angle θ collide per bit with
  * probability 1 − θ/π (Goemans–Williamson), so 4-bit bands of the sketch
  * give an equi-joinable LSH bucket key for approximate nearest-neighbor
  * search — the same candidate-generation shape as the text sketches.
  *
  * One codegen'd pass: per dimension one 8-byte hash + 64 signed
  * accumulator updates; null elements contribute nothing (same contract
  * as [[MinHashSignature]]).
  */
case class SignSketch64(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"sign_sketch64 requires array<double>, got ${other.catalogString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "sign_sketch64"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val acc = new Array[Double](64)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val x = arr.getDouble(i)
        val h = XXH64.hashLong(i.toLong, 42L)
        var j = 0
        while (j < 64) {
          if (((h >>> j) & 1L) == 1L) acc(j) += x else acc(j) -= x
          j += 1
        }
      }
      i += 1
    }
    var sig = 0L
    var j = 0
    while (j < 64) { if (acc(j) > 0) sig |= (1L << j); j += 1 }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val xxh = classOf[XXH64].getName
      val acc = ctx.freshName("acc")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val x = ctx.freshName("x")
      val h = ctx.freshName("h")
      val sig = ctx.freshName("sig")
      s"""
         |double[] $acc = new double[64];
         |int $n = $a.numElements();
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i)) continue;  // null dim: no vote
         |  double $x = $a.getDouble($i);
         |  long $h = $xxh.hashLong((long) $i, 42L);
         |  for (int $j = 0; $j < 64; $j++) {
         |    if ((($h >>> $j) & 1L) == 1L) $acc[$j] += $x; else $acc[$j] -= $x;
         |  }
         |}
         |long $sig = 0L;
         |for (int $j = 0; $j < 64; $j++) {
         |  if ($acc[$j] > 0) $sig |= (1L << $j);
         |}
         |${ev.value} = $sig;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object VectorExprs {
  /** Fused dot product over two array<double> columns. */
  def dot(a: Column, b: Column): Column =
    GraftSqlBridge.column(DotProduct(
      GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))

  /** 64-bit hyperplane sign sketch of an array<double> vector. */
  def signSketch64(v: Column): Column =
    GraftSqlBridge.column(SignSketch64(GraftSqlBridge.expression(v)))
}
