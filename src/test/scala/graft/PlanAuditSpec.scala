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

  /** Run `check` per query, isolating analysis failures: one broken loader
    * must NOT abort the loop and silently skip auditing the other ~199
    * plans (round 6: a schema drift in events.parquet killed BOTH gates
    * before they audited anything). Unanalyzable queries fail the audit by
    * name alongside any real offenders. */
  private[graft] def auditOver(
      queries: Map[String, (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame])(
      check: (String, org.apache.spark.sql.DataFrame) => Option[String]): (Seq[String], Seq[String]) =
    queries.toSeq.sortBy(_._1).foldLeft((Vector.empty[String], Vector.empty[String])) {
      case ((bad, off), (name, fn)) =>
        scala.util.Try(check(name, fn(spark, dir))) match {
          case scala.util.Success(Some(o)) => (bad, off :+ o)
          case scala.util.Success(None)    => (bad, off)
          case scala.util.Failure(e) =>
            (bad :+ s"$name: ${Option(e.getMessage).getOrElse(e.toString).linesIterator.next()}", off)
        }
    }

  /** Audit under the SAME optimizer extensions the bench/verify sessions
    * run with (cosine fusion + pre-norm pushdown), so the gate covers the
    * plans that actually execute; scoped add/remove keeps the shared spec
    * session clean for other suites. */
  private def auditAll(check: (String, org.apache.spark.sql.DataFrame) => Option[String]): Unit = {
    val rules = graft.functions.GraftFunctions.optimizerRules
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations ++ rules
    try {
      val (broken, offenders) = auditOver(SparkEntry.queries)(check)
      assert(broken.isEmpty && offenders.isEmpty,
        (if (broken.nonEmpty) s"unanalyzable queries (audit could not run): $broken\n" else "") +
        (if (offenders.nonEmpty) s"offending plans: $offenders" else ""))
    } finally spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations.filterNot(rules.contains)
  }

  test("audit isolation: one broken loader cannot silently disable the audit of the rest") {
    import org.apache.spark.sql.functions.lit
    val fake: Map[String, (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame] = Map(
      "ok_a"   -> ((s, _) => s.range(3).toDF("id")),
      "broken" -> ((_, _) => throw new IllegalStateException("simulated schema drift")),
      "ok_b"   -> ((s, _) => s.range(3).toDF("id").select(lit(1).as("x"))))
    var audited = Vector.empty[String]
    val (bad, off) = auditOver(fake) { (name, _) => audited :+= name; None }
    assert(bad == Seq("broken: simulated schema drift"), s"expected the broken query named, got $bad")
    assert(off.isEmpty)
    assert(audited.sorted == Vector("ok_a", "ok_b"),
      s"healthy queries must still be audited despite the broken one, got $audited")
  }

  test("no registered query contains a cartesian product") {
    auditAll { (name, df) =>
      val phys = df.queryExecution.sparkPlan
      if (phys.toString.contains("CartesianProduct")) Some(name) else None
    }
  }

  test("no unpartitioned window outside the structurally-bounded exemption") {
    auditAll { (name, df) =>
      val ws = df.queryExecution.optimizedPlan
        .collect { case w: Window if w.partitionSpec.isEmpty => w }
      if (ws.isEmpty) None
      else if (!boundedGlobalWindow(name)) Some(s"$name (${ws.size})")
      else if (ws.forall(w => isBoundedOffsetsAgg(w.child))) None
      else Some(s"$name (exempted, but a global window's input is NOT the bounded pid offsets aggregate)")
    }
  }
}
