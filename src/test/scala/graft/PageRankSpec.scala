package graft

import graft.operators.GraphOps
import graft.sources.Tables

class PageRankSpec extends SparkSpec {
  import spark.implicits._

  test("pageRank conserves mass and is deterministic") {
    val li = Tables.lineitem(spark, "/root/testdata/sf0.001")
    val r1 = GraphOps.pageRank(li, iters = 3).as[(Long, Double)].collect().toMap
    val r2 = GraphOps.pageRank(li, iters = 3).as[(Long, Double)].collect().toMap
    assert(r1 == r2)
    assert(r1.nonEmpty)
    // scaled ranks average ≈ 1 up to dangling-mass leakage (strictly ≤ 1)
    val mean = r1.values.sum / r1.size
    assert(mean > 0.5 && mean <= 1.000001, s"mean scaled rank $mean")
    // more iterations shift mass toward hubs but keep the support
    val r5 = GraphOps.pageRank(li, iters = 5).as[(Long, Double)].collect().toMap
    assert(r5.keySet == r1.keySet)
  }
}
