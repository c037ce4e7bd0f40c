package graft.expr

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

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

  // inputs are array<double> by construction (VectorExprs.dot call sites
  // widen floats first); analysis still type-checks children as arrays
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

object VectorExprs {
  /** Fused dot product over two array<double> columns. */
  def dot(a: Column, b: Column): Column =
    GraftSqlBridge.column(DotProduct(
      GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))
}
