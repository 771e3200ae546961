package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType}
import graft.functions.DotProduct

/** Optimizer rule: recognize the declarative dot-product idiom
  *
  * {{{ aggregate(zip_with(a, b, (x, y) -> x * y), 0.0d, (acc, v) -> acc + v) }}}
  *
  * and replace it with the native codegen'd [[DotProduct]] expression.
  * Users writing the portable lambda form (the one that also runs on
  * stock Spark) get the compiled kernel automatically when the graft
  * extensions are installed.
  *
  * Soundness: DotProduct's null semantics were made to match the lambda
  * chain exactly (NULL input array, length mismatch via zip_with's null
  * padding, or a null element each yield NULL), and both sum in
  * index-ascending order — VectorOpsSpec asserts bit-identity. The
  * match is deliberately conservative: double arrays only, literal 0.0
  * seed, bare `x * y` / `acc + v` lambda bodies, identity finish.
  */
object DotProductRewrite extends Rule[LogicalPlan] {

  private def isDoubleArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  private def sameVars(body: (Expression, Expression),
      args: Seq[NamedLambdaVariable]): Boolean = (body, args) match {
    case ((l: NamedLambdaVariable, r: NamedLambdaVariable), Seq(a, b)) =>
      (l.exprId == a.exprId && r.exprId == b.exprId) ||
        (l.exprId == b.exprId && r.exprId == a.exprId)
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressionsWithPruning(_.containsPattern(
      org.apache.spark.sql.catalyst.trees.TreePattern.HIGH_ORDER_FUNCTION)) {
      case ArrayAggregate(
            ZipWith(a, b, LambdaFunction(Multiply(mx, my, _), margs, _)),
            Literal(0.0, DoubleType),
            LambdaFunction(Add(al, ar, _), aargs, _),
            LambdaFunction(fin: NamedLambdaVariable, Seq(finArg), _))
          if isDoubleArray(a) && isDoubleArray(b) &&
            sameVars((mx, my), margs.collect { case v: NamedLambdaVariable => v }) &&
            sameVars((al, ar), aargs.collect { case v: NamedLambdaVariable => v }) &&
            fin.exprId == finArg.exprId =>
        DotProduct(a, b)
    }
}
