package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, Divide, EvalMode, Expression, Multiply, NamedExpression, Sqrt}
import org.apache.spark.sql.catalyst.plans.{Cross, Inner}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule pushing cosine NORM computation below a join: a
  * `cosine_sim(l, r)` evaluated above a join recomputes ‖l‖ and ‖r‖ for
  * EVERY joined pair — three array traversals per pair. The rewrite
  * computes `sqrt(dot_product(e, e))` once per input row on each side
  * (a projection under the join, so a broadcast side ships its norms with
  * it) and replaces the pair expression with
  * `dot_product(l, r) / (norm_l * norm_r)` — one traversal per pair. With
  * average join fan-out F this cuts the scoring work from 3·F to F + 1
  * passes per row; every bucket/candidate ANN join (fan-out = probes or
  * bucket occupancy) wins proportionally.
  *
  * Bit-exactness: CosineSimFF accumulates dot, ‖a‖², ‖b‖² in one
  * left-to-right double loop; the rewritten form computes the same three
  * sums in the same element order and combines them with the identical
  * `dot / (sqrt(na) * sqrt(nb))` expression, so results are bit-identical
  * — PROVIDED the two arrays have equal length. Zero-norm vectors agree
  * too: Divide's zero-divisor NULL is the kernel's own degenerate-case
  * semantics (CosineSimFF yields NULL, matching DuckDB's division). For ragged pairs
  * CosineSimFF truncates its norms to the shorter length while the
  * pushed-down norms cover each full array; vector columns are
  * fixed-dimension by the embedding-table contract (TableContractSpec),
  * and the rule can be disabled where that does not hold:
  * `spark.graft.cosinePrenorm.enabled = false`.
  *
  * Scope: Project over (zero or more Filters over) an Inner/Cross join,
  * where the cosine's two argument expressions each reference exactly one
  * join side. Registered via [[GraftExtensions]]; composes with
  * [[CosineFusionRule]] (the textbook spelling fuses to CosineSimFF
  * first, then this rule splits it across the join — the two rewrites
  * target disjoint shapes, so they never oscillate: fusion requires
  * inline `sqrt(dot(x,x))` norms, which the prenorm output no longer
  * contains).
  */
object CosinePrenormRule extends Rule[LogicalPlan] {

  private val FlagKey = "spark.graft.cosinePrenorm.enabled"

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!conf.getConfString(FlagKey, "true").toBoolean) return plan
    plan.transform {
      case p @ Project(_, child) =>
        unstack(child) match {
          case Some((filters, join)) if eligible(p, filters, join) =>
            rewrite(p, filters, join)
          case _ => p
        }
    }
  }

  /** The (possibly Filter-wrapped) join under the projection, outermost
    * filter first. */
  private def unstack(plan: LogicalPlan): Option[(Seq[Filter], Join)] = {
    var filters = Vector.empty[Filter]
    var cur = plan
    while (true) {
      cur match {
        case f: Filter => filters :+= f; cur = f.child
        case j: Join if j.joinType == Inner || j.joinType == Cross =>
          return Some((filters, j))
        case _ => return None
      }
    }
    None // unreachable
  }

  /** A cosine whose argument expressions land one per join side (in either
    * order), both deterministic and non-empty. Returns (leftSide,
    * rightSide) argument expressions. */
  private def split(c: CosineSimFF, join: Join): Option[(Expression, Expression)] = {
    def onLeft(e: Expression) =
      e.deterministic && e.references.nonEmpty && e.references.subsetOf(join.left.outputSet)
    def onRight(e: Expression) =
      e.deterministic && e.references.nonEmpty && e.references.subsetOf(join.right.outputSet)
    if (onLeft(c.left) && onRight(c.right)) Some((c.left, c.right))
    else if (onRight(c.left) && onLeft(c.right)) Some((c.right, c.left))
    else None
  }

  private def eligible(p: Project, filters: Seq[Filter], join: Join): Boolean = {
    val exprs = p.projectList ++ filters.map(_.condition)
    exprs.exists(_.collectFirst {
      case c: CosineSimFF if split(c, join).isDefined => c
    }.isDefined)
  }

  private def rewrite(p: Project, filters: Seq[Filter], join: Join): LogicalPlan = {
    // one norm column per distinct side expression, keyed canonically
    val leftNorms = mutable.LinkedHashMap.empty[Expression, Alias]
    val rightNorms = mutable.LinkedHashMap.empty[Expression, Alias]
    def normFor(map: mutable.LinkedHashMap[Expression, Alias], e: Expression): Attribute =
      map.getOrElseUpdate(e.canonicalized,
        Alias(Sqrt(DotProductFF(e, e)), "_graft_prenorm")()).toAttribute
    def rw(expr: Expression): Expression = expr.transform {
      case c: CosineSimFF =>
        split(c, join) match {
          case Some((l, r)) =>
            // zero-norm vectors: Divide's zero-divisor NULL is exactly the
            // kernel's own semantics (CosineSimFF yields NULL there too),
            // so the rewrite is bit-identical in the degenerate case as well
            Divide(
              DotProductFF(c.left, c.right),
              Multiply(normFor(leftNorms, l), normFor(rightNorms, r),
                EvalMode.LEGACY),
              EvalMode.LEGACY)
          case None => c
        }
    }
    val newProjList = p.projectList.map(rw(_).asInstanceOf[NamedExpression])
    val newConds = filters.map(f => rw(f.condition))
    val newJoin = join.copy(
      left = Project(join.left.output ++ leftNorms.values, join.left),
      right = Project(join.right.output ++ rightNorms.values, join.right))
    val rebuilt = newConds.foldRight(newJoin: LogicalPlan)((c, child) => Filter(c, child))
    Project(newProjList, rebuilt)
  }
}
