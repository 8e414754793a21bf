package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Divide, Multiply, Sqrt}
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
  * The degenerate case agrees as well: for a zero-norm (or empty) vector
  * the composed form's Divide returns NULL on the zero divisor, and
  * CosineSimFF yields NULL there too (as does DuckDB's division) — so the
  * rewrite changes nothing even off the embedding-table contract.
  *
  * Registered via [[GraftExtensions]] (`injectOptimizerRule`) for new
  * sessions, or `spark.experimental.extraOptimizations` on a live one.
  */
object CosineFusionRule extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case Divide(DotProductFF(a, b),
        Multiply(Sqrt(DotProductFF(a2, a3)), Sqrt(DotProductFF(b2, b3)), _), _)
        if a.semanticEquals(a2) && a.semanticEquals(a3) &&
          b.semanticEquals(b2) && b.semanticEquals(b3) =>
      CosineSimFF(a, b)
    // commuted norm product: dot(a,b) / (sqrt(dot(b,b)) * sqrt(dot(a,a)))
    case Divide(DotProductFF(a, b),
        Multiply(Sqrt(DotProductFF(b2, b3)), Sqrt(DotProductFF(a2, a3)), _), _)
        if a.semanticEquals(a2) && a.semanticEquals(a3) &&
          b.semanticEquals(b2) && b.semanticEquals(b3) =>
      CosineSimFF(a, b)
  }
}
