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
}
