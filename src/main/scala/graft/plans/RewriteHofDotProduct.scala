package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType}
import graft.expressions.DotProduct

/** Optimizer rule: rewrite the higher-order-function dot-product idiom
  *
  *   aggregate(zip_with(a, b, (x, y) -> x * y), 0.0D, (acc, v) -> acc + v)
  *
  * to the native codegen'd [[DotProduct]]. The two are semantically
  * identical (same sequential fold, same null propagation — see
  * VectorExpressionsSpec), but HOFs are CodegenFallback: they evaluate
  * interpreted with per-element closure dispatch. Users (and the SQL
  * oracle formulas) can keep writing the declarative idiom; the optimizer
  * upgrades it to the tight loop. Guards: both sides array<double>, the
  * zero literal exactly 0.0, lambda bodies exactly the bound variables
  * (multiply/add are commutative bit-for-bit in IEEE754, so either
  * operand order matches), and an identity finish lambda. */
object RewriteHofDotProduct extends Rule[LogicalPlan] {

  private def sameVars(body1: Expression, body2: Expression,
      args: Seq[Expression]): Boolean = (body1, body2, args) match {
    case (x: NamedLambdaVariable, y: NamedLambdaVariable,
        Seq(a: NamedLambdaVariable, b: NamedLambdaVariable)) =>
      Set(x.exprId, y.exprId) == Set(a.exprId, b.exprId)
    case _ => false
  }

  private def isIdentity(f: Expression): Boolean = f match {
    case LambdaFunction(v: NamedLambdaVariable, Seq(a: NamedLambdaVariable), _) =>
      v.exprId == a.exprId
    case _ => false
  }

  private def isDoubleArray(e: Expression): Boolean =
    e.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case ArrayAggregate(
          ZipWith(a, b, LambdaFunction(Multiply(x, y, _), mulArgs, _)),
          Literal(0.0, DoubleType),
          LambdaFunction(Add(acc, v, _), addArgs, _),
          finish)
        if isDoubleArray(a) && isDoubleArray(b) &&
          sameVars(x, y, mulArgs) && sameVars(acc, v, addArgs) &&
          isIdentity(finish) =>
      DotProduct(a, b)
  }
}
