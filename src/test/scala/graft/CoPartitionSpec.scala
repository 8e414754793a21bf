package graft

import org.apache.spark.sql.functions._

/** Pins the Spark behavior the whole iterative-graph co-partition family
  * rides on (GraphOps: hits, labelPropagation, labelPropEdges, pageRank,
  * personalizedPageRank, khop, shortestPaths/Trace, closeness,
  * betweenness): a `repartition(col).persist()` frame KEEPS its
  * HashPartitioning through reuse, so an equi-join on that key plans no
  * Exchange above the cached edge side — while the same frame through
  * `localCheckpoint()` scans as UnknownPartitioning and re-exchanges on
  * every reuse. If a Spark upgrade changes either half, the 100x-measured
  * loop wins (SCALING.md round-10 section: hits 294→136 s, betweenness
  * 9.0→7.0 s, label_prop 6.1→5.3 s) regress silently — this spec makes
  * that loud. The assertion anchor is the src-keyed Exchange: present
  * above the checkpoint scan, absent above the InMemory scan. */
class CoPartitionSpec extends SparkSpec {

  private def edges = spark.range(20000)
    .select((col("id") % 500).as("src"), (col("id") % 700).as("dst"))

  private def labels = spark.range(500)
    .select(col("id").as("node"), col("id").as("label"))

  private def joinPlan(e: org.apache.spark.sql.DataFrame): String =
    e.join(labels.hint("SHUFFLE_HASH"), col("src") === col("node"))
      .groupBy(col("dst")).agg(min(col("label")).as("nmin"))
      .queryExecution.executedPlan.toString

  /** Count src-keyed exchanges OUTSIDE the cached relation: the
    * InMemoryRelation description embeds its one-time cache-build shuffle,
    * which is exactly the single exchange the pattern amortizes — only an
    * Exchange above the scan would mean a per-reuse re-shuffle. */
  private def srcExchanges(plan: String): Int =
    "Exchange hashpartitioning\\(src".r
      .findAllIn(plan.split("InMemoryRelation")(0)).length

  test("equi-join on a persisted repartition(src) plans no edge-side Exchange") {
    val p = edges.repartition(col("src")).persist()
    try {
      p.count() // materialize the cache so the scan reports its partitioning
      val plan = joinPlan(p)
      assert(plan.contains("InMemoryTableScan") || plan.contains("Scan In-memory"),
        s"edge side is not riding the cache:\n$plan")
      assert(srcExchanges(plan) == 0,
        s"persisted co-partitioned edge side re-exchanged — the GraphOps " +
          s"loop pattern regressed:\n$plan")
    } finally p.unpersist(blocking = false)
  }

  test("the same join over a localCheckpoint re-exchanges the edge side") {
    val cp = edges.repartition(col("src")).localCheckpoint()
    val plan = joinPlan(cp)
    // the checkpoint scan reports UnknownPartitioning, so Catalyst must
    // re-shuffle src per reuse: documents WHY the loops carry persist(),
    // not materialize. If this starts passing with 0, localCheckpoint
    // learned to preserve partitioning — re-measure before dropping the
    // persisted copies.
    assert(srcExchanges(plan) >= 1,
      s"checkpoint scan kept partitioning?\n$plan")
  }
}
