package graft

import org.apache.spark.sql.functions._

import graft.operators.GraphOps

/** Ground-truth check for the degree-oriented triangle counter: a synthetic
  * lineitem whose co-purchase projection is K4 plus a pendant edge — K4 has
  * exactly 4 triangles; the pendant adds edges/wedges but closes nothing.
  */
class TriangleSpec extends SparkSpec {
  import spark.implicits._

  test("triangles counts K4 exactly once per triangle") {
    // one order (key 0, passes the %100 sample) containing parts 1..4
    // → co-purchase K4; a second order (key 100) with parts 4,5 → pendant
    val li = (Seq.tabulate(4)(i => (0L, i + 1L)) ++ Seq((100L, 4L), (100L, 5L)))
      .toDF("l_orderkey", "l_partkey")
    val out = GraphOps.triangles(li).head()
    val (edges, wedges, tris) = (out.getLong(0), out.getLong(1), out.getLong(2))
    assert(edges == 7, s"K4 (6) + pendant (1) edges, got $edges")
    assert(tris == 4, s"K4 has exactly 4 triangles, got $tris")
    assert(wedges >= tris, "every triangle needs a wedge")
  }

  test("snapshot_diff statuses partition the delta") {
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.01")
    val d = graft.operators.SnapshotDiff.snapshotDiff(docs)
    // statuses are mutually exclusive by construction; spot the invariants
    assert(d.filter(col("status") === "added" && col("old_hash").isNotNull).count() == 0)
    assert(d.filter(col("status") === "removed" && col("new_hash").isNotNull).count() == 0)
    assert(d.filter(col("status") === "changed" &&
      (col("old_hash").isNull || col("new_hash").isNull)).count() == 0)
    assert(d.select("status").distinct().count() == 3)
  }

  test("bloom_dedup equals the bloom-free exact join") {
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.01")
    val withBloom = graft.operators.BloomDedup.bloomDedup(docs)
    // bloom-free reference: plain join on the same segments
    val t = split(trim(col("text")), "\\s+")
    def blocks(df: org.apache.spark.sql.DataFrame) = df
      .select(col("doc_id"), explode(graft.operators.Normalize.tokenBlocks(t, 3)).as("block"))
    val existing = blocks(docs.filter(col("doc_id") % 2 === 0)).select("block").distinct()
    val exact = blocks(docs.filter(col("doc_id") % 2 =!= 0))
      .join(existing, Seq("block"), "left_semi")
      .groupBy("doc_id").agg(countDistinct(col("block")).as("n_shared_blocks"))
    assert(withBloom.exceptAll(exact).count() == 0 && exact.exceptAll(withBloom).count() == 0,
      "bloom pre-filter must not change the result set")
  }
}
