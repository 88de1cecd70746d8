package graft.plans

import graft.functions.FloatVecDot
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}

/** Optimizer rule: rewrite the composed HOF dot-product pattern
  *
  *   aggregate(zip_with(a, b, (x, y) -> double(x) * double(y)),
  *             0.0D, (acc, v) -> acc + v)
  *
  * over float arrays into the native allocation-free FloatVecDot — users
  * writing idiomatic DataFrame code get the fused kernel automatically.
  *
  * Opt-in (GraftExtensions / experimental.extraOptimizations): on ragged
  * (unequal-length) inputs zip_with pads with nulls and yields NULL while
  * FloatVecDot truncates to the shorter array; for fixed-dimension
  * embedding columns the two are identical.
  */
object FuseVecDot extends Rule[LogicalPlan] {

  private def isFloatArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  private def isCastToDouble(e: Expression): Boolean = e match {
    case c: Cast => c.child.isInstanceOf[NamedLambdaVariable] && c.dataType == DoubleType
    case _ => false
  }

  private def isMulLambda(f: Expression): Boolean = f match {
    case LambdaFunction(m: Multiply, _, _) =>
      isCastToDouble(m.left) && isCastToDouble(m.right)
    case _ => false
  }

  private def isAddLambda(f: Expression): Boolean = f match {
    case LambdaFunction(a: Add, _, _) =>
      a.left.isInstanceOf[NamedLambdaVariable] && a.right.isInstanceOf[NamedLambdaVariable]
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case ArrayAggregate(zip: ZipWith, Literal(0.0, DoubleType), merge, _)
        if isFloatArray(zip.left) && isFloatArray(zip.right) &&
          isMulLambda(zip.function) && isAddLambda(merge) =>
      FloatVecDot(zip.left, zip.right)
  }
}
