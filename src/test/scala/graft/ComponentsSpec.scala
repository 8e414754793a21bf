package graft

import org.apache.spark.sql.functions._

import graft.operators.GraphOps
import graft.sources.Tables

class ComponentsSpec extends SparkSpec {
  import spark.implicits._

  test("connected components labels are edge-consistent and deterministic") {
    val li = Tables.lineitem(spark, "/root/testdata/sf0.001")
    val labels = GraphOps.connectedComponents(li)
    val l1 = labels.as[(Long, Long)].collect().toMap
    // every node labeled, label is a member of the component (min node id)
    assert(l1.nonEmpty)
    assert(l1.forall { case (n, l) => l <= n })
    // deterministic across runs
    val l2 = GraphOps.connectedComponents(li).as[(Long, Long)].collect().toMap
    assert(l1 == l2)
  }

  test("components merge nodes reachable through shared orders") {
    // tiny synthetic: orders 1:(p1,p2), 2:(p2,p3), 3:(p9,p8) → {1,2,3} and {8,9}
    val li = Seq(
      (100L, 1L), (100L, 2L), (200L, 2L), (200L, 3L), (300L, 9L), (300L, 8L))
      .toDF("l_orderkey", "l_partkey")
      .withColumn("l_orderkey", col("l_orderkey") * 100) // make % 100 == 0
    val labels = GraphOps.connectedComponents(li).as[(Long, Long)].collect().toMap
    assert(labels(1L) == 1L && labels(2L) == 1L && labels(3L) == 1L)
    assert(labels(8L) == 8L && labels(9L) == 8L)
  }

  test("componentsUpsert: delta merge == full recompute; untouched components keep labels") {
    // base orders: {1,2,3} via orders 100/200, {8,9} via 300, {20,21} via 400.
    // delta order 1000 introduces NEW node 50 bridging part 3 and part 8 —
    // merging {1,2,3} with {8,9} through it; {20,21} untouched.
    // orderkeys must be %100==0 (copurchase sample); base ones %1000!=0,
    // the delta one %1000==0 (componentsUpsert's arrival-batch convention)
    val mk = (rows: Seq[(Long, Long)]) => rows.toDF("l_orderkey", "l_partkey")
    val base = mk(Seq((1100L, 1L), (1100L, 2L), (2100L, 2L), (2100L, 3L),
      (3100L, 9L), (3100L, 8L), (4100L, 20L), (4100L, 21L)))
    val delta = mk(Seq((5000L, 3L), (5000L, 50L), (5000L, 8L)))
    val full = base.unionByName(delta)
    val inc = GraphOps.componentsUpsert(full).as[(Long, Long)].collect().toMap
    val scratch = GraphOps.connectedComponents(full).as[(Long, Long)].collect().toMap
    assert(inc == scratch, s"incremental != full recompute: $inc vs $scratch")
    assert(Seq(1L, 2L, 3L, 8L, 9L, 50L).forall(inc(_) == 1L),
      "delta bridge did not merge the two base components")
    assert(inc(20L) == 20L && inc(21L) == 20L, "untouched component relabeled")
  }

  test("componentsUpsertFrom: empty delta is the identity on the standing labeling") {
    val labelsBase = Seq((1L, 1L), (2L, 1L), (9L, 8L), (8L, 8L)).toDF("node", "label")
    val noEdges = Seq.empty[(Long, Long)].toDF("src", "dst")
    val out = GraphOps.componentsUpsertFrom(labelsBase, noEdges)
      .as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> 1L, 2L -> 1L, 9L -> 8L, 8L -> 8L))
  }
}
