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

  test("iterative-graph store read paths scan ONLY store tables — no base-table derive") {
    val s = spark
    // build the stores OUTSIDE the observed window (order-independent of
    // the other tests), then observe every query execution the read paths
    // trigger: the iterative cores materialize per round, so the proof
    // must cover the whole job stream, not the checkpoint-rooted plan the
    // call returns. No observed file scan may read outside graft_store_*.
    Stores.cpEdgesAll(s, dir); Stores.hitsEdgeStore(s, dir)
    Stores.cpLabelsBase(s, dir); Stores.cpEdgesDeleted(s, dir)
    val seen = java.util.Collections.synchronizedList(
      new java.util.ArrayList[String]())
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(f: String,
          qe: org.apache.spark.sql.execution.QueryExecution, ns: Long): Unit =
        qe.executedPlan.foreach {
          case fs: org.apache.spark.sql.execution.FileSourceScanExec =>
            seen.add(fs.tableIdentifier.map(_.table)
              .getOrElse(fs.relation.location.rootPaths.mkString(",")))
          case _ => ()
        }
      override def onFailure(f: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          e: Exception): Unit = ()
    }
    s.listenerManager.register(listener)
    try {
      Stores.pageRankStore(s, dir).count()
      Stores.hitsStore(s, dir).count()
      Stores.componentsUpsertStore(s, dir).count()
      // listener delivery is async — poll until the scan list stabilizes
      var prev = -1
      var waited = 0
      while (seen.size != prev && waited < 10000) {
        prev = seen.size
        Thread.sleep(500); waited += 500
      }
      val tables = seen.toArray(Array.empty[String]).toSeq
      assert(tables.exists(_.startsWith("graft_store_")),
        "expected the read paths' store scans to be observed")
      val nonStore = tables.filterNot(_.startsWith("graft_store_"))
      assert(nonStore.isEmpty,
        s"read paths scanned non-store inputs: $nonStore")
    } finally s.listenerManager.unregister(listener)
  }

  test("serving read paths (bm25_search_store, ann_ivf_store) return exactly the inline twins' rows") {
    val s = spark
    // bm25_search_store's inline twin is bm25Upsert over the full corpus:
    // the upsert maintains (base ⊎ delta) to exactly the full-corpus index,
    // then scores — same artifacts the store persists
    assert(rows(Stores.bm25SearchStore(s, dir, SparkEntry.kwTerms)) ===
      rows(graft.operators.Search.bm25Upsert(Tables.documents(s, dir), SparkEntry.kwTerms)))
    assert(rows(Stores.annIvfStore(s, dir)) ===
      rows(graft.operators.Dedup.annIvf(Tables.embeddings(s, dir))))
    assert(rows(Stores.annIvfPqStore(s, dir)) ===
      rows(graft.operators.ProductQuant.ivfPqSearch(Tables.embeddings(s, dir))))
    assert(rows(Stores.resolveIncStore(s, dir)) ===
      rows(graft.operators.ResolveInc.resolveInc(Tables.documents(s, dir))))
    assert(rows(Stores.minhashLshUpsertStore(s, dir)) ===
      rows(graft.operators.MinhashPortable.minhashLshUpsert(Tables.documents(s, dir))))
    assert(rows(Stores.ivfDeleteStore(s, dir)) ===
      rows(graft.operators.Dedup.ivfDelete(Tables.embeddings(s, dir))))
    assert(rows(Stores.semdedupStore(s, dir)) ===
      rows(graft.operators.Cluster.semdedupScaled(Tables.embeddings(s, dir))))
    assert(rows(Stores.bm25UpsertStore(s, dir, SparkEntry.kwTerms)) ===
      rows(graft.operators.Search.bm25Upsert(Tables.documents(s, dir), SparkEntry.kwTerms)))
  }

  test("semdedup-store self-join has zero exchange (both sides off one bucketed table)") {
    val s = spark
    Stores.semdedupClusters(s, dir) // ensure the bucketed table exists
    val prevAqe = s.conf.get("spark.sql.adaptive.enabled")
    val prevBc = s.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      s.conf.set("spark.sql.adaptive.enabled", "false")
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val q = Stores.semdedupStore(s, dir)
      assert(q.count() >= 0)
      val shuffles = q.queryExecution.executedPlan.collect {
        case sh: ShuffleExchangeExec => sh
      }
      assert(shuffles.isEmpty,
        s"semdedup store self-join re-shuffled:\n${q.queryExecution.executedPlan.toString.take(3000)}")
    } finally {
      s.conf.set("spark.sql.adaptive.enabled", prevAqe)
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBc)
    }
  }

  test("ann_ivf_store search scan bucket-prunes to the probed cells") {
    val s = spark
    Stores.ivfIndexStore(s, dir) // ensure the bucketed table exists
    val prevAqe = s.conf.get("spark.sql.adaptive.enabled")
    s.conf.set("spark.sql.adaptive.enabled", "false") // concrete plan tree
    try {
      val q = Stores.annIvfStore(s, dir)
      assert(q.count() > 0)
      val scans = q.queryExecution.executedPlan.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec
          if f.tableIdentifier.exists(_.table.startsWith("graft_store_ivf_idx")) => f
      }
      assert(scans.nonEmpty, "expected a scan of the bucketed inverted file")
      // the SEARCH side (the heavy scan, filtered by the literal cell IN)
      // must prune; the probe-row fetch legitimately reads all buckets
      val pruned = scans.flatMap(_.optionalBucketSet.map(_.cardinality()))
      assert(pruned.nonEmpty && pruned.min < 16,
        s"expected the probed-cell IN-filter to prune buckets, got cardinalities $pruned of 16")
    } finally s.conf.set("spark.sql.adaptive.enabled", prevAqe)
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
