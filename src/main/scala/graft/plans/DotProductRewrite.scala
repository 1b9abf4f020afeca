package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, LongType}

/** Optimizer rule: rewrite the COMPOSABLE higher-order dot product
  *
  *   aggregate(zip_with(a, b, (x, y) -> x * y), 0L, (acc, v) -> acc + v)
  *
  * into the codegen'd [[LongArrayDot]] expression.
  *
  * Why a Rule and not "just call the function": the HOF form is what
  * a SQL user naturally writes (it is the documented composable
  * spelling in LongArrayDot's scaladoc), but it allocates a zipped
  * array and interprets two lambdas per element — the inner loop of
  * every ANN cosine. Scala callers get the native expression through
  * `TextFns.qdot`; this rule gives SQL/DataFrame callers the same
  * plan WITHOUT changing what they write — optimize the pattern, not
  * the caller. Registered via GraftExtensions (session-build path)
  * and `spark.experimental.extraOptimizations` (live-session path).
  *
  * Soundness: the rewrite fires only when both sides are
  * `array<bigint>`, the zero is a literal long 0, the zip lambda is
  * exactly a product of its two variables, the merge is exactly a
  * sum of accumulator and element (either order — long + and * are
  * commutative), and the finish lambda is the identity. Long
  * overflow wraps in LongArrayDot where ANSI Multiply would raise —
  * identical results under the quantize contract (|v| ≤ 10⁴ ⇒ every
  * partial sum < 2⁴⁰), which is the only regime graft evaluates
  * dot products in (same contract LongArrayDot itself documents).
  * Null/length-skew semantics match the HOF form on the contract's
  * null-free equal-length arrays.
  */
object DotProductRewrite extends Rule[LogicalPlan] {

  private def isLongArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(LongType, _) => true
    case _ => false
  }

  private def isZeroLong(e: Expression): Boolean = e match {
    case Literal(0L, LongType) => true
    case Cast(Literal(v, _), LongType, _, _) => v == 0 || v == 0L
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case ArrayAggregate(
            ZipWith(a, b,
              LambdaFunction(m: Multiply, Seq(x: NamedLambdaVariable, y: NamedLambdaVariable), _)),
            zero,
            LambdaFunction(s: Add, Seq(acc: NamedLambdaVariable, v: NamedLambdaVariable), _),
            LambdaFunction(fin: NamedLambdaVariable, Seq(facc: NamedLambdaVariable), _))
          if isLongArray(a) && isLongArray(b) && isZeroLong(zero) &&
            sameVars(m.left, m.right, x, y) &&
            sameVars(s.left, s.right, acc, v) &&
            fin.exprId == facc.exprId =>
        LongArrayDot(a, b)
    }

  /** The binary op's operands are exactly the two lambda variables,
    * in either order (both ops commute on longs). */
  private def sameVars(l: Expression, r: Expression,
                       v1: NamedLambdaVariable, v2: NamedLambdaVariable): Boolean =
    (l, r) match {
      case (a: NamedLambdaVariable, b: NamedLambdaVariable) =>
        Set(a.exprId, b.exprId) == Set(v1.exprId, v2.exprId)
      case _ => false
    }
}
