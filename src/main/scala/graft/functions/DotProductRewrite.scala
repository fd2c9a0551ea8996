package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Add, ArrayAggregate, Expression, LambdaFunction, Literal, Multiply, NamedLambdaVariable, ZipWith}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType}

/** Optimizer rule (`SparkSessionExtensions.injectOptimizerRule`): rewrite
  * the portable higher-order-function dot product
  *
  * {{{ aggregate(zip_with(a, b, (x, y) -> x * y), 0.0d, (acc, v) -> acc + v) }}}
  *
  * into the codegen'd [[DotProduct]] kernel. Users (and this engine's own
  * fallback paths) write the portable form; sessions with
  * [[GraftExtensions]] execute the tight primitive loop instead of a
  * per-element lambda chain — the (c)-level extension point of the build
  * guide applied to an (b)-level kernel.
  *
  * The rewrite only fires when it is provably value-identical:
  *   - both sides are `array<double>` with non-nullable elements (a null
  *     element poisons the fold to null; DotProduct reads primitives);
  *   - the zero is literal 0.0 and both lambdas are exactly the
  *     multiply/add shapes over their own bound variables;
  *   - the finish lambda is the identity.
  * Sequential fold order and the null-on-length-mismatch contract are
  * preserved by [[DotProduct]] itself.
  */
object DotProductRewrite extends Rule[LogicalPlan] {

  private def nonNullDoubleArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(DoubleType, containsNull) => !containsNull
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case ArrayAggregate(
            ZipWith(a, b,
              LambdaFunction(Multiply(x: NamedLambdaVariable, y: NamedLambdaVariable, _),
                Seq(xa: NamedLambdaVariable, ya: NamedLambdaVariable), _)),
            Literal(0.0d, DoubleType),
            LambdaFunction(Add(acc: NamedLambdaVariable, v: NamedLambdaVariable, _),
              Seq(acca: NamedLambdaVariable, va: NamedLambdaVariable), _),
            LambdaFunction(fin: NamedLambdaVariable,
              Seq(fina: NamedLambdaVariable), _))
          if nonNullDoubleArray(a) && nonNullDoubleArray(b) &&
            x.exprId == xa.exprId && y.exprId == ya.exprId &&
            acc.exprId == acca.exprId && v.exprId == va.exprId &&
            fin.exprId == fina.exprId =>
        DotProduct(a, b)
    }
}
