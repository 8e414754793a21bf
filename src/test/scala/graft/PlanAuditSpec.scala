package graft

import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, LogicalPlan, Project, Window}

/** Automated scale audit over EVERY registered query's plan (analysis +
  * optimization only — nothing executes): the two patterns that silently
  * kill a 100 TB run must never reappear.
  *
  *   - CartesianProduct: both sides materialized against each other with
  *     no key — O(n·m) rows. (BroadcastNestedLoopJoin with a bounded
  *     broadcast side is fine and intended in several probes/stats joins;
  *     a true cartesian of two corpus-sized inputs is not.)
  *   - Window with an empty partitionSpec: every row through ONE reducer
  *     (round 1's pack_builder defect). Exempted only where the window's
  *     INPUT is structurally the bounded per-slice offsets aggregate —
  *     the exemption is checked against the plan shape, not the query
  *     name, so a future edit can't hang a corpus-sized global window
  *     inside an exempted query unnoticed.
  */
class PlanAuditSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  // queries ALLOWED to carry a global window IF AND ONLY IF that window's
  // input reduces to an Aggregate grouping on the slice id ("pid") — one
  // row per shuffle partition, bounded by construction (PackBuilder.pack)
  private val boundedGlobalWindow = Set("pack_builder")

  /** The window input must be the bounded offsets aggregate: descend
    * through row-preserving unary nodes only; the first aggregation seen
    * must group on the pid slice id. Anything else — a join, a scan, a
    * union — means corpus-sized rows could reach the global window. */
  private def isBoundedOffsetsAgg(p: LogicalPlan): Boolean = p match {
    case a: Aggregate =>
      a.groupingExpressions.exists(_.references.exists(_.name == "pid"))
    case pr: Project => isBoundedOffsetsAgg(pr.child)
    case f: Filter => isBoundedOffsetsAgg(f.child)
    case w: Window => isBoundedOffsetsAgg(w.child)
    case _ => false
  }

  test("no registered query contains a cartesian product") {
    val offenders = SparkEntry.queries.flatMap { case (name, fn) =>
      val phys = fn(spark, dir).queryExecution.sparkPlan
      if (phys.toString.contains("CartesianProduct")) Some(name) else None
    }
    assert(offenders.isEmpty, s"cartesian products in: ${offenders.toSeq.sorted}")
  }

  test("no unpartitioned window outside the structurally-bounded exemption") {
    val offenders = SparkEntry.queries.flatMap { case (name, fn) =>
      val ws = fn(spark, dir).queryExecution.optimizedPlan
        .collect { case w: Window if w.partitionSpec.isEmpty => w }
      if (ws.isEmpty) None
      else if (!boundedGlobalWindow(name)) Some(s"$name (${ws.size})")
      else if (ws.forall(w => isBoundedOffsetsAgg(w.child))) None
      else Some(s"$name (exempted, but a global window's input is NOT the bounded pid offsets aggregate)")
    }
    assert(offenders.isEmpty, s"unpartitioned windows in: ${offenders.toSeq.sorted}")
  }
}
