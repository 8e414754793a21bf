package graft

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.plans.AsofJoin

/** The custom as-of physical operator: plan shape (AsofJoinExec present, no
  * broadcast nested loop), semantics against a brute-force reference on a
  * crafted dataset (ties, missing matches, nulls), partition-count
  * invariance, and agreement with the window-based formulation on real
  * events data. */
class AsofExecSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  // left: (id, key, ts); right: (key, ts, payload)
  private lazy val leftDf: DataFrame = {
    import spark.implicits._
    Seq(
      (1L, "a", ts("2024-01-01 10:00:00")),
      (2L, "a", ts("2024-01-01 10:05:00")),
      (3L, "a", ts("2024-01-01 09:00:00")), // before any right row: dropped
      (4L, "b", ts("2024-01-01 12:00:00")),
      (5L, "b", ts("2024-01-01 12:00:00")), // duplicate (key, ts) on the left
      (6L, "c", ts("2024-01-01 12:00:00")), // key with no right rows: dropped
      (7L, null, ts("2024-01-01 12:00:00")), // null key: dropped
      (8L, "a", null) // null ts: dropped
    ).toDF("id", "key", "ts")
  }

  private lazy val rightDf: DataFrame = {
    import spark.implicits._
    Seq(
      ("a", ts("2024-01-01 10:00:00"), "a@10:00"), // exact tie: at-or-before matches
      ("a", ts("2024-01-01 10:03:00"), "a@10:03"),
      ("b", ts("2024-01-01 11:00:00"), "b@11:00"),
      ("b", ts("2024-01-01 11:30:00"), "b@11:30"),
      ("d", ts("2024-01-01 08:00:00"), "d@08:00"), // key with no left rows
      ("b", null, "b@null"), // null ts: never matches
      (null, ts("2024-01-01 08:00:00"), "null-key") // null key: never matches
    ).toDF("key", "rts", "payload")
  }

  private val expected = Set(
    (1L, "a@10:00"), // tie at 10:00 — inclusive
    (2L, "a@10:03"),
    (4L, "b@11:30"),
    (5L, "b@11:30"))

  test("asof exec: physical plan uses AsofJoinExec, not a nested loop") {
    val out = AsofJoin.asof(leftDf, rightDf, Seq("key"), "ts", "rts")
    // the node lives under AdaptiveSparkPlanExec, whose children are hidden
    // from collect until execution — assert on the rendered plan instead
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("AsofJoin"), s"expected AsofJoinExec in:\n$plan")
    assert(!plan.contains("BroadcastNestedLoop"),
      s"inequality fell back to a nested loop:\n$plan")
  }

  test("asof exec: semantics — ties inclusive, nulls and unmatched dropped") {
    val out = AsofJoin.asof(leftDf, rightDf, Seq("key"), "ts", "rts")
      .select(col("id"), col("payload"))
    val got = out.collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got === expected)
  }

  test("asof exec: result is partition-count invariant") {
    val skewedLeft = leftDf.repartition(7)
    val skewedRight = rightDf.repartition(3)
    val out = AsofJoin.asof(skewedLeft, skewedRight, Seq("key"), "ts", "rts")
      .select(col("id"), col("payload"))
    val got = out.collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got === expected)
  }

  test("asof exec: both sides derived from the same base table (self-join lineage)") {
    import spark.implicits._
    val base = Seq(
      (1L, "p", "k", ts("2024-01-01 10:00:00")),
      (2L, "c", "k", ts("2024-01-01 09:59:00")),
      (3L, "c", "k", ts("2024-01-01 09:00:00"))
    ).toDF("id", "kind", "key", "ts")
    val l = base.filter($"kind" === "p").select($"id", $"key", $"ts")
    val r = base.filter($"kind" === "c")
      .select($"id".as("rid"), $"key", $"ts".as("rts"))
    val got = AsofJoin.asof(l, r, Seq("key"), "ts", "rts")
      .select($"id", $"rid").collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(got === Set((1L, 2L)))
  }

  test("asof exec left-outer: unmatched and null-key/ts left rows emit null right") {
    val out = AsofJoin.asof(leftDf, rightDf, Seq("key"), "ts", "rts", leftOuter = true)
      .select(col("id"), col("payload"))
    val got = out.collect().map(r => (r.getLong(0), Option(r.getString(1)))).toSet
    val outerExpected: Set[(Long, Option[String])] =
      expected.map { case (id, p) => (id, Option(p)) } ++
        Set(3L, 6L, 7L, 8L).map(id => (id, None: Option[String]))
    assert(got === outerExpected)
  }

  test("asof exec with a composite key") {
    import spark.implicits._
    val l = Seq(
      (1L, "a", 1, ts("2024-01-01 10:00:00")),
      (2L, "a", 2, ts("2024-01-01 10:00:00")), // same name, different shard
      (3L, "b", 1, ts("2024-01-01 10:00:00"))
    ).toDF("id", "k1", "k2", "ts")
    val r = Seq(
      ("a", 1, ts("2024-01-01 09:00:00"), "a1"),
      ("a", 2, ts("2024-01-01 09:30:00"), "a2"),
      ("b", 2, ts("2024-01-01 09:00:00"), "b2") // wrong shard for left (b,1)
    ).toDF("k1", "k2", "rts", "payload")
    val got = AsofJoin.asof(l, r, Seq("k1", "k2"), "ts", "rts")
      .select($"id", $"payload").collect()
      .map(x => (x.getLong(0), x.getString(1))).toSet
    assert(got === Set((1L, "a1"), (2L, "a2")))
  }

  test("asof exec tolerance: boundary inclusive, beyond-tolerance drops or null-extends") {
    // 5-minute tolerance in MICROSECONDS (timestamps are long-backed micros)
    val tol = Some(5L * 60 * 1000 * 1000)
    val out = AsofJoin.asof(leftDf, rightDf, Seq("key"), "ts", "rts", tolerance = tol)
      .select(col("id"), col("payload"))
    val got = out.collect().map(r => (r.getLong(0), r.getString(1))).toSet
    // id 1: gap 0 (tie) — inside; id 2: gap 2 min — inside;
    // id 4/5: latest b click 11:30, gap 30 min — BEYOND tolerance, and no
    // rescan may resurrect the 11:00 click (even further): dropped
    assert(got === Set((1L, "a@10:00"), (2L, "a@10:03")))
    // exact-boundary inclusivity: gap == tolerance matches
    val boundary = AsofJoin.asof(leftDf, rightDf, Seq("key"), "ts", "rts",
        tolerance = Some(30L * 60 * 1000 * 1000))
      .select(col("id"), col("payload"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(boundary.contains(4L -> "b@11:30"),
      "a gap exactly at the tolerance must match (inclusive bound)")
    // left-outer: tolerance-failed rows null-extend instead of dropping
    val outer = AsofJoin.asof(leftDf, rightDf, Seq("key"), "ts", "rts",
        leftOuter = true, tolerance = tol)
      .select(col("id"), col("payload"))
      .collect().map(r => (r.getLong(0), Option(r.getString(1)))).toSet
    val outerExpected: Set[(Long, Option[String])] =
      Set((1L, Some("a@10:00")), (2L, Some("a@10:03"))) ++
        Set(3L, 4L, 5L, 6L, 7L, 8L).map(id => (id, None: Option[String]))
    assert(outer === outerExpected)
  }

  test("asof exec tolerance registration matches a post-filtered unbounded as-of") {
    val events = sources.Tables.events(spark, "/root/testdata/sf0.001")
    // p_ts/c_ts are strftime-truncated to whole SECONDS, while the exec's
    // bound applies to raw micros — a gap within ~1 s of exactly 24 h
    // could land on different sides of the two checks (a data-dependent
    // flake, not a defect; exact boundary behavior is pinned by the
    // 144-instance tolerant property test on raw longs). Compare outside
    // a ±2 s ambiguity band on BOTH sides.
    val gap = unix_micros(to_timestamp(col("p_ts"))) -
      unix_micros(to_timestamp(col("c_ts")))
    val unambiguous = abs(gap - operators.AsOf.TolUs) > 2000000L
    val bounded = operators.AsOf.purchaseAttributionTol(events).filter(unambiguous)
    val filtered = operators.AsOf.purchaseAttributionExec(events)
      .filter(gap <= operators.AsOf.TolUs).filter(unambiguous)
    assert(bounded.count() > 0, "vacuous: no within-tolerance attributions at sf0.001")
    assert(bounded.count() < operators.AsOf.purchaseAttributionExec(events).count(),
      "vacuous: tolerance bound never exercised at sf0.001")
    assert(bounded.exceptAll(filtered).isEmpty && filtered.exceptAll(bounded).isEmpty,
      "bounded as-of diverged from post-filtered unbounded as-of")
  }

  test("asof exec registration agrees with the window formulation on real events") {
    val events = sources.Tables.events(spark, "/root/testdata/sf0.001")
    val viaExec = operators.AsOf.purchaseAttributionExec(events)
      .select(col("event_id"), col("user_id"), col("p_ts"), col("c_ts"))
    val viaWindow = operators.AsOf.purchaseAttribution(events)
    assert(viaExec.count() > 0, "vacuous: no attributed purchases at sf0.001")
    assert(viaExec.exceptAll(viaWindow).isEmpty && viaWindow.exceptAll(viaExec).isEmpty,
      "exec and window as-of formulations disagree")
  }
}
