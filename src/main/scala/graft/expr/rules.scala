package graft.expr

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Add, ArrayAggregate, Expression, LambdaFunction, Literal, Multiply, NamedExpression, NamedLambdaVariable, ZipWith}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType}

/** Optimizer rule: rewrite the interpreted HOF dot-product idiom
  *
  *   aggregate(zip_with(a, b, (x, y) -> x * y), 0.0d, (acc, v) -> acc + v)
  *
  * into the fused codegen'd [[DotProduct]]. Users writing the natural
  * declarative form get the fast path without knowing the custom
  * expression exists — the whole point of doing this as a `Rule
  * [LogicalPlan]` instead of an API users must call.
  *
  * Strictly semantics-preserving: [[DotProduct]] reproduces the idiom's
  * null behavior (length mismatch / null element → NULL via zip_with
  * padding and null-propagating arithmetic; empty → the 0.0 zero) and
  * folds in the same ascending order. Guards require double arrays, a
  * 0.0 zero, pure var-on-var multiply/add lambdas, and an identity
  * finish lambda.
  */
object FuseDotProduct extends Rule[LogicalPlan] {

  private def isDoubleArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  private def usesExactly(used: Seq[NamedLambdaVariable],
                          declared: Seq[NamedExpression]): Boolean =
    used.map(_.exprId).toSet == declared.collect {
      case v: NamedLambdaVariable => v.exprId
    }.toSet && used.size == declared.size

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case ArrayAggregate(
            ZipWith(l, r,
              LambdaFunction(
                Multiply(mx: NamedLambdaVariable, my: NamedLambdaVariable, _),
                zargs, _)),
            Literal(zero, DoubleType),
            LambdaFunction(
              Add(ax: NamedLambdaVariable, av: NamedLambdaVariable, _),
              aargs, _),
            LambdaFunction(fin: NamedLambdaVariable, fargs, _))
          // raw-bits check: `zero == 0.0` would also match -0.0, whose
          // empty-array fold result (-0.0) the fused +0.0 would flip
          if java.lang.Double.doubleToRawLongBits(
              zero.asInstanceOf[Double]) == 0L &&
            usesExactly(Seq(mx, my), zargs) &&
            usesExactly(Seq(ax, av), aargs) &&
            fargs.collect { case v: NamedLambdaVariable => v.exprId }
              .contains(fin.exprId) &&
            isDoubleArray(l) && isDoubleArray(r) =>
        DotProduct(l, r)
    }
}

object GraftOptimizations {
  /** Install the engine's optimizer rules into a live session (the
    * per-session complement of `GraftExtensions`' injectOptimizerRule).
    */
  def install(spark: SparkSession): Unit = {
    val cur = spark.experimental.extraOptimizations
    if (!cur.contains(FuseDotProduct))
      spark.experimental.extraOptimizations = cur :+ FuseDotProduct
  }
}
