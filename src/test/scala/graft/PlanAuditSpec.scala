package graft

import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Window}

/** Automated scale audit over EVERY registered query's plan (analysis +
  * optimization only — nothing executes): the two patterns that silently
  * kill a 100 TB run must never reappear.
  *
  *   - CartesianProduct: both sides materialized against each other with
  *     no key — O(n·m) rows. (BroadcastNestedLoopJoin with a bounded
  *     broadcast side is fine and intended in several probes/stats joins;
  *     a true cartesian of two corpus-sized inputs is not.)
  *   - Window with an empty partitionSpec: every row through ONE reducer
  *     (round 1's pack_builder defect). Whitelisted only where the window
  *     input is bounded by construction.
  */
class PlanAuditSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  // global windows over provably bounded inputs (documented at the site):
  //   pack_builder — offsets window over numShufflePartitions rows
  private val globalWindowOk = Set("pack_builder")

  test("no registered query contains a cartesian product") {
    val offenders = SparkEntry.queries.flatMap { case (name, fn) =>
      val phys = fn(spark, dir).queryExecution.sparkPlan
      if (phys.toString.contains("CartesianProduct")) Some(name) else None
    }
    assert(offenders.isEmpty, s"cartesian products in: ${offenders.toSeq.sorted}")
  }

  test("no unpartitioned window outside the bounded whitelist") {
    def globalWindows(plan: LogicalPlan): Int =
      plan.collect { case w: Window if w.partitionSpec.isEmpty => w }.size
    val offenders = SparkEntry.queries.flatMap { case (name, fn) =>
      if (globalWindowOk(name)) None
      else {
        val n = globalWindows(fn(spark, dir).queryExecution.optimizedPlan)
        if (n > 0) Some(s"$name ($n)") else None
      }
    }
    assert(offenders.isEmpty, s"unpartitioned windows in: ${offenders.toSeq.sorted}")
  }
}
