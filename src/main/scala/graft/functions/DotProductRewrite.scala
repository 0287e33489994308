package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}

/** Optimizer rule: rewrite the interpreted higher-order dot-product fold
  *
  * {{{ aggregate(zip_with(a, b, (x, y) -> double(x) * double(y)), 0d, (acc, v) -> acc + v) }}}
  *
  * into the whole-stage-codegen [[DotProductFP64]] expression (~20x).
  * The match is deliberately strict — float arrays, double-cast multiply,
  * literal 0.0 zero, pure `acc + v` merge, identity finish — so the
  * rewrite is exactly value-preserving (same left-to-right double
  * accumulation); anything else is left untouched.
  *
  * Registered through `spark.sql.extensions=graft.GraftExtensions`, so
  * SQL users who write the idiomatic HOF formulation get the native
  * expression without knowing it exists.
  */
object DotProductRewrite extends Rule[LogicalPlan] {

  private def isFloatArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  private def isDoubleCastOf(e: Expression, v: NamedLambdaVariable): Boolean =
    e match {
      case Cast(child: NamedLambdaVariable, DoubleType, _, _) =>
        child.exprId == v.exprId
      case _ => false
    }

  private def isElemwiseProduct(f: Expression): Boolean = f match {
    case LambdaFunction(Multiply(mx, my, _), Seq(x: NamedLambdaVariable, y: NamedLambdaVariable), _) =>
      (isDoubleCastOf(mx, x) && isDoubleCastOf(my, y)) ||
        (isDoubleCastOf(mx, y) && isDoubleCastOf(my, x))
    case _ => false
  }

  private def isZeroLit(e: Expression): Boolean = e match {
    case Literal(0.0, DoubleType) => true
    case _ => false
  }

  private def isPlainSum(f: Expression): Boolean = f match {
    case LambdaFunction(Add(l: NamedLambdaVariable, r: NamedLambdaVariable, _),
        Seq(acc: NamedLambdaVariable, v: NamedLambdaVariable), _) =>
      (l.exprId == acc.exprId && r.exprId == v.exprId) ||
        (l.exprId == v.exprId && r.exprId == acc.exprId)
    case _ => false
  }

  private def isIdentityFinish(f: Expression): Boolean = f match {
    case LambdaFunction(b: NamedLambdaVariable, Seq(acc: NamedLambdaVariable), _) =>
      b.exprId == acc.exprId
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case ArrayAggregate(ZipWith(a, b, prod), zero, merge, finish)
          if isFloatArray(a) && isFloatArray(b) && isElemwiseProduct(prod) &&
            isZeroLit(zero) && isPlainSum(merge) && isIdentityFinish(finish) =>
        DotProductFP64(a, b)
    }
}
