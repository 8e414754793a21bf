package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Divide, EvalMode, Multiply, Sqrt}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule fusing the composed cosine-similarity expression
  *
  *   dot_product(a, b) / (sqrt(dot_product(a, a)) * sqrt(dot_product(b, b)))
  *
  * into the single-pass [[CosineSimFF]] kernel — one loop over the arrays
  * instead of three, inside the same WholeStageCodegen span. Users writing
  * the textbook formula (in SQL via the registered `dot_product` function,
  * or through `VectorOps.dot`) get the fused kernel for free; the rewrite
  * is bit-exact because CosineSimFF accumulates the three sums in the same
  * left-to-right double-precision order as the composed form.
  *
  * The degenerate case agrees as well — but only under the eval modes
  * whose Divide returns NULL on a zero divisor: for a zero-norm (or
  * empty) vector, LEGACY and TRY division yield NULL and CosineSimFF
  * yields NULL there too (as does DuckDB's division). An ANSI-mode
  * Divide instead raises DIVIDE_BY_ZERO on a zero norm, which the fused
  * kernel cannot reproduce — so the rule matches ONLY
  * `EvalMode.LEGACY`/`EvalMode.TRY` divides and leaves ANSI spellings
  * untouched rather than silently rewriting an error into a NULL.
  * (Spark 4's session default is ANSI; users wanting the fusion on the
  * textbook spelling write it with `try_divide` or under
  * `spark.sql.ansi.enabled=false`. Operators inside this library call
  * [[CosineSimFF]] directly and never depend on the rewrite.)
  *
  * Registered via [[GraftExtensions]] (`injectOptimizerRule`) for new
  * sessions, or `spark.experimental.extraOptimizations` on a live one.
  */
object CosineFusionRule extends Rule[LogicalPlan] {

  /** Eval modes whose zero-divisor result is NULL, matching CosineSimFF.
    * (Spark 4.1 wraps the mode in NumericEvalContext on Divide.) */
  private def nullOnZero(c: org.apache.spark.sql.catalyst.expressions.NumericEvalContext): Boolean =
    c.evalMode == EvalMode.LEGACY || c.evalMode == EvalMode.TRY

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case Divide(DotProductFF(a, b),
        Multiply(Sqrt(DotProductFF(a2, a3)), Sqrt(DotProductFF(b2, b3)), _), m)
        if nullOnZero(m) &&
          a.semanticEquals(a2) && a.semanticEquals(a3) &&
          b.semanticEquals(b2) && b.semanticEquals(b3) =>
      CosineSimFF(a, b)
    // commuted norm product: dot(a,b) / (sqrt(dot(b,b)) * sqrt(dot(a,a)))
    case Divide(DotProductFF(a, b),
        Multiply(Sqrt(DotProductFF(b2, b3)), Sqrt(DotProductFF(a2, a3)), _), m)
        if nullOnZero(m) &&
          a.semanticEquals(a2) && a.semanticEquals(a3) &&
          b.semanticEquals(b2) && b.semanticEquals(b3) =>
      CosineSimFF(a, b)
  }
}
