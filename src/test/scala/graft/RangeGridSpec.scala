package graft

import org.apache.spark.sql.functions._

import graft.operators.AsOf

/** The grid-bucketed large-large range join: agreement with the broadcast
  * inequality formulation, boundary exactness on crafted values, and the
  * no-nested-loop plan shape that makes it viable when both sides are
  * corpus-sized. */
class RangeGridSpec extends SparkSpec {

  test("grid range join equals the broadcast formulation on real lineitem") {
    val li = sources.Tables.lineitem(spark, "/root/testdata/sf0.001")
    val grid = AsOf.priceRangeJoinGrid(li)
    val bcast = AsOf.priceRangeJoin(li)
    assert(grid.count() > 0, "vacuous: no bands matched at sf0.001")
    assert(grid.exceptAll(bcast).isEmpty && bcast.exceptAll(grid).isEmpty,
      "grid and broadcast range joins disagree")
  }

  test("grid range join is exact at band and cell boundaries") {
    import spark.implicits._
    // values sitting exactly on band edges (1000, 10000, 50000 — each
    // belongs to the UPPER band, lo-inclusive) and on grid-cell edges
    val vals = Seq(0.0, 999.999, 1000.0, 1000.001, 9999.999, 10000.0,
      49999.999, 50000.0, 123456.789)
    val li = vals.map(v => (1L, v)).toDF("l_orderkey", "l_extendedprice")
    val got = AsOf.priceRangeJoinGrid(li)
      .select($"band", $"n").as[(String, Long)].collect().toMap
    val expected = vals.groupBy { v =>
      AsOf.PriceBands.collectFirst { case (b, lo, hi) if v >= lo && v < hi => b }.get
    }.map { case (b, vs) => b -> vs.size.toLong }
    assert(got === expected)
  }

  test("grid range join plans an equi-join, never a nested loop") {
    val li = sources.Tables.lineitem(spark, "/root/testdata/sf0.001")
    val plan = AsOf.priceRangeJoinGrid(li).queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoop"),
      s"range predicate fell back to a nested loop:\n$plan")
    // the interval predicate must survive as a residual filter
    assert(plan.contains("Join") || plan.contains("join"), plan)
  }

  test("a width misaligned with every band edge still matches exactly") {
    import spark.implicits._
    val vals = Seq(999.5, 1000.5, 7777.77, 50000.0, 49999.0)
    val li = vals.map(v => (1L, v)).toDF("l_orderkey", "l_extendedprice")
    val aligned = AsOf.priceRangeJoinGrid(li, width = 1000.0)
    val odd = AsOf.priceRangeJoinGrid(li, width = 333.7)
    assert(aligned.exceptAll(odd).isEmpty && odd.exceptAll(aligned).isEmpty,
      "grid width changed the result — the decomposition is not lossless")
  }
}
