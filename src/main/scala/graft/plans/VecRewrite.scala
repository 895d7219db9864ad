package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.DoubleType

/** Optimizer rule (SURVEY.md §4 tier (c): a `Rule[LogicalPlan]` injected
  * through `SparkSessionExtensions`): auto-vectorizes lambda-written vector
  * math into the native codegen'd kernels.
  *
  * Rewrites, for `array<double>` inputs:
  *  - `aggregate(zip_with(a, b, (x, y) -> x * y), 0.0, (acc, v) -> acc + v)`
  *    → [[DotProduct]](a, b)
  *  - `sqrt(aggregate(transform(a, x -> x * x), 0.0, (acc, v) -> acc + v))`
  *    → [[L2Norm]](a)
  *
  * Why this is sound: the kernels accumulate in the same left-to-right
  * IEEE order as the fold, multiplication/addition are each bitwise
  * commutative in IEEE 754 (so `x*y`/`y*x` and `acc+v`/`v+acc` all match),
  * and the `0.0` seed is exact — results are bit-identical on every dense
  * equal-dimension input (VecExprsSpec asserts this).
  *
  * The match is purely structural on the analyzed tree (NamedLambdaVariable
  * identity by exprId), so any SQL/DataFrame spelling of the pattern is
  * caught after analysis, and `transformAllExpressions` reaches it in any
  * operator (projection, filter, join condition, aggregate).
  *
  * The rewrite emits the LENIENT kernel variants ([[DotProductLenient]] /
  * [[L2NormLenient]]), which reproduce the lambda forms' null semantics
  * exactly (ragged pair or null element → SQL NULL) — an optimizer rule
  * applies to arbitrary user queries and must be observationally
  * transparent, so the fail-fast contract stays with the explicitly-called
  * `dot_product`/`l2_norm` functions only.
  */
object VecRewrite extends Rule[LogicalPlan] {

  private def isZeroD(e: Expression): Boolean = e match {
    case Literal(0.0, DoubleType) => true
    case c: Cast => isZeroD(c.child)
    case Literal(d: org.apache.spark.sql.types.Decimal, _) => d.toDouble == 0.0
    case _ => false
  }

  private def isDoubleArray(e: Expression): Boolean = e.dataType match {
    case org.apache.spark.sql.types.ArrayType(DoubleType, _) => true
    case _ => false
  }

  /** body is `p op q` over exactly the two lambda arguments (either order —
    * IEEE add and multiply are bitwise commutative).
    */
  private def usesBothArgs(
      p: Expression, q: Expression, args: Seq[NamedLambdaVariable]): Boolean =
    (p, q, args) match {
      case (a: NamedLambdaVariable, b: NamedLambdaVariable, Seq(u, v)) =>
        Set(a.exprId, b.exprId) == Set(u.exprId, v.exprId)
      case _ => false
    }

  private object FoldSum {
    /** Matches `LambdaFunction(acc + v, Seq(acc, v))`. */
    def unapply(e: Expression): Boolean = e match {
      case LambdaFunction(Add(p, q, _), args, _) =>
        usesBothArgs(p, q, args.collect { case n: NamedLambdaVariable => n })
      case _ => false
    }
  }

  private object IdentityFinish {
    def unapply(e: Expression): Boolean = e match {
      case LambdaFunction(body: NamedLambdaVariable, Seq(arg: NamedLambdaVariable), _) =>
        body.exprId == arg.exprId
      case _ => false
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    // dot product: aggregate(zip_with(a, b, (x,y) -> x*y), 0.0, (acc,v) -> acc+v)
    case agg @ ArrayAggregate(
        ZipWith(l, r, LambdaFunction(Multiply(p, q, _), args, _)),
        zero, merge, finish)
        if isDoubleArray(l) && isDoubleArray(r) && isZeroD(zero) &&
          usesBothArgs(p, q, args.collect { case n: NamedLambdaVariable => n }) &&
          FoldSum.unapply(merge) && IdentityFinish.unapply(finish) &&
          agg.dataType == DoubleType =>
      DotProductLenient(l, r)

    // l2 norm: sqrt(aggregate(transform(a, x -> x*x), 0.0, (acc,v) -> acc+v))
    case Sqrt(agg @ ArrayAggregate(
        ArrayTransform(a, LambdaFunction(Multiply(p: NamedLambdaVariable, q: NamedLambdaVariable, _), Seq(arg: NamedLambdaVariable), _)),
        zero, merge, finish))
        if isDoubleArray(a) && isZeroD(zero) &&
          p.exprId == arg.exprId && q.exprId == arg.exprId &&
          FoldSum.unapply(merge) && IdentityFinish.unapply(finish) &&
          agg.dataType == DoubleType =>
      L2NormLenient(a)
  }
}
