package graft

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._

import graft.sources.{Stores, Tables}

/** Persisted standing-state stores (Stores): the *_store read-path
  * registrations must (a) return exactly the inline twins' rows — the same
  * proof the CORRECTNESS gate runs, pinned here at sf0.001 so a store-layer
  * regression fails fast locally; (b) actually deliver the plan shape the
  * stores exist for — a bucketed edge scan joined with ZERO edge-side
  * exchange, and a term-bucket-pruned postings scan. */
class StoresSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def rows(df: org.apache.spark.sql.DataFrame): Set[String] =
    df.collect().map(_.toString).toSet

  test("store-backed read paths return exactly the inline twins' rows") {
    val s = spark
    assert(rows(Stores.khopStore(s, dir)) ===
      rows(graft.operators.GraphOps.khop(
        Tables.customer(s, dir), Tables.orders(s, dir), Tables.lineitem(s, dir))))
    assert(rows(Stores.componentsDeleteStore(s, dir)) ===
      rows(graft.operators.GraphOps.componentsDelete(Tables.lineitem(s, dir))))
    assert(rows(Stores.minhashLshDeleteStore(s, dir)) ===
      rows(graft.operators.MinhashPortable.minhashLshDelete(Tables.documents(s, dir))))
    assert(rows(Stores.bm25DeleteStore(s, dir, SparkEntry.kwTerms)) ===
      rows(graft.operators.Search.bm25Delete(Tables.documents(s, dir), SparkEntry.kwTerms)))
  }

  test("iterative-graph store read paths return exactly the inline twins' rows") {
    val s = spark
    assert(rows(Stores.pageRankStore(s, dir)) ===
      rows(graft.operators.GraphOps.pageRank(Tables.lineitem(s, dir))))
    assert(rows(Stores.hitsStore(s, dir)) ===
      rows(graft.operators.GraphOps.hits(Tables.lineitem(s, dir))))
    assert(rows(Stores.componentsUpsertStore(s, dir)) ===
      rows(graft.operators.GraphOps.componentsUpsert(Tables.lineitem(s, dir))))
  }

  test("khop-store frontier join has zero edge-side exchange") {
    val s = spark
    val eSrc = Stores.edgesBySrc(s, dir) // ensures the bucketed table
    val seeds = Tables.customer(s, dir).filter(col("c_acctbal") > 9000)
      .select(col("c_custkey").cast("long").as("node"))
    val prevAqe = s.conf.get("spark.sql.adaptive.enabled")
    val prevBc = s.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // concrete (non-adaptive) plan, no broadcast escape hatch: the test is
      // that the BUCKETED scan satisfies the join's distribution by itself
      s.conf.set("spark.sql.adaptive.enabled", "false")
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val hop = seeds.hint("SHUFFLE_HASH").join(eSrc, col("node") === col("src"))
        .select(col("dst"))
      assert(hop.count() > 0)
      val plan = hop.queryExecution.executedPlan
      // the frontier side legitimately exchanges (node-sized); the edge side
      // must not — i.e. no ShuffleExchange may have the bucketed scan below it
      val edgeSideShuffles = plan.collect {
        case sh: ShuffleExchangeExec
          if sh.toString.contains("graft_store_edges_src") => sh
      }
      assert(edgeSideShuffles.isEmpty,
        s"edge store re-shuffled:\n${plan.toString.take(4000)}")
      val scans = plan.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec
          if f.tableIdentifier.exists(_.table.startsWith("graft_store_edges_src")) => f
      }
      assert(scans.nonEmpty, "expected a scan of the bucketed edge store")
      assert(scans.head.bucketedScan, "edge store scan must be bucketed")
    } finally {
      s.conf.set("spark.sql.adaptive.enabled", prevAqe)
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBc)
    }
  }

  test("bm25 postings scan bucket-prunes to the query terms") {
    val s = spark
    val post = Stores.bm25Postings(s, dir)
    val prevAqe = s.conf.get("spark.sql.adaptive.enabled")
    s.conf.set("spark.sql.adaptive.enabled", "false") // concrete plan tree
    try {
    val q = post.filter(col("term").isin(SparkEntry.kwTerms: _*))
      .groupBy(col("term")).agg(sum(col("n_occ")).as("n"))
    assert(q.count() > 0)
    val scans = q.queryExecution.executedPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec
        if f.tableIdentifier.exists(_.table.startsWith("graft_store_bm25_post")) => f
    }
    assert(scans.nonEmpty, "expected a scan of the bucketed postings store")
    val pruned = scans.head.optionalBucketSet
    assert(pruned.isDefined && pruned.get.cardinality() < 32,
      s"expected the term IN-filter to prune buckets, got $pruned " +
        s"(selected ${pruned.map(_.cardinality())} of 32)")
    } finally s.conf.set("spark.sql.adaptive.enabled", prevAqe)
  }
}
