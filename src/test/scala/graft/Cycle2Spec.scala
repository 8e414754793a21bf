package graft

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, GraphAnn, GraphOps, Search}
import graft.sources.{Stores, Tables}

/** The WRITE-BACK cycle matrix (round 14 follow-on): every index family's
  * maintained artifacts persisted back to the catalog between batches and
  * the next batch served from the UPDATED tables — dedup_resolve_cycle2's
  * contract (Round14Spec) extended to BM25, components, IVF and the k-NN
  * graph. Each test proves the persistence boundary lossless: the store
  * round-trip equals the same two maintenance passes composed in memory
  * (or a from-scratch recompute of the post-both-batches corpus). The
  * CORRECTNESS gate re-proves each against DuckDB at sf0.01. */
class Cycle2Spec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def rows(df: org.apache.spark.sql.DataFrame): Set[String] =
    df.collect().map(_.toString).toSet

  private def d20(c: String) = pmod(col(c), lit(20L))

  test("bm25 write-back cycle: cycle 2 from the updated catalog tables " +
    "equals a from-scratch index of the post-both-batches corpus") {
    val s = spark
    val out = Stores.bm25Cycle2Store(s, dir, SparkEntry.kwTerms)
    val finalDocs = Tables.documents(s, dir)
      .filter(!d20("doc_id").isin(5L, 15L))
    val (post, dl) = Search.bm25IndexParts(finalDocs)
    val dfM = post.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val scM = dl.agg(count(lit(1)).as("n_docs"), sum(col("len")).as("sum_len"))
    assert(rows(out) ===
      rows(Search.bm25SearchFrom(post, dl, dfM, scM, SparkEntry.kwTerms)))
  }

  test("components write-back cycle: cycle 2 from the updated labeling " +
    "equals full-graph connected components") {
    val s = spark
    assert(rows(Stores.componentsCycle2Store(s, dir)) ===
      rows(GraphOps.connectedComponents(Tables.lineitem(s, dir))))
  }

  test("ivf write-back cycle: cycle 2 from the updated inverted file " +
    "equals search over the post-both-batches corpus under the frozen quantizer") {
    val s = spark
    val emb = Tables.embeddings(s, dir)
    val idxFinal = Dedup.ivfAssign(emb.filter(!d20("vec_id").isin(5L, 15L)),
      Dedup.frozenCents(emb, 16))
    val noDel = emb.filter(lit(false)).select(col("vec_id"))
    assert(rows(Stores.ivfCycle2Store(s, dir)) ===
      rows(Dedup.ivfDeleteFrom(idxFinal, noDel)))
  }

  test("ivf-pq write-back cycle: cycle 2 from the updated codes table " +
    "equals ADC search over the post-both-batches corpus under the frozen model") {
    val s = spark
    import graft.operators.ProductQuant
    val emb = Tables.embeddings(s, dir)
    val codesFinal = ProductQuant.ivfPqEncodeSlice(
      emb.filter(!d20("vec_id").isin(5L, 15L)), emb)
    val noDel = emb.filter(lit(false)).select(col("vec_id"))
    assert(rows(Stores.ivfPqCycle2Store(s, dir)) ===
      rows(ProductQuant.ivfPqDeleteFrom(emb, codesFinal, noDel)))
  }

  test("semdedup write-back cycle: cycle 2 from the updated partition " +
    "equals the within-cluster pairs of the survivors under the frozen quantizer") {
    val s = spark
    import graft.operators.Cluster
    val emb = Tables.embeddings(s, dir)
    val cents = Cluster.trainCentroids(emb, Cluster.scaledK(emb), iters = 1)
    val expected = Cluster.semdedupPairsFrom(
      Cluster.assignUnder(emb.filter(!d20("vec_id").isin(5L, 15L)), cents))
    assert(rows(Stores.semdedupCycle2Store(s, dir)) === rows(expected))
  }

  test("graph-ANN write-back cycle: cycle 2 from the persisted maintained " +
    "graph equals two in-memory maintenance passes") {
    val s = spark
    val emb = Tables.embeddings(s, dir)
    val g1 = GraphAnn.upsertedGraph(
      GraphAnn.knnGraph(emb.filter(!d20("vec_id").isin(0L, 10L))),
      emb.filter(d20("vec_id") =!= 10L), arrPred = d20("vec_id") === 0L)
    val g2 = GraphAnn.upsertedGraph(g1, emb, arrPred = d20("vec_id") === 10L)
    val expected = GraphAnn.annGraphSearchFrom(g2, emb, releaseGraph = true)
    assert(rows(Stores.annGraphCycle2Store(s, dir)) === rows(expected))
  }

  test("write-back cycles persist DELTA SEGMENTS: bucketed base + tiny " +
    "per-cycle upsert/tombstone tables in the catalog") {
    val s = spark
    // the cycle2 stores above have already run; their ensure* builders
    // must have landed the base segment plus both cycles' delta segments
    val tag = dir.replaceAll("[^A-Za-z0-9]", "_")
    def bucketed(t: String): Boolean =
      s.table(t).queryExecution.executedPlan.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => f
      }.headOption.exists(_.relation.bucketSpec.nonEmpty)
    // base segments keep the bucketed store layout (the consuming join's
    // distribution); bm25's base segments are the standing bm25u_* stores
    Seq("ivfd_base16", "ipqd_base16", "sdd_base", "ann_graph_b20",
        "cp_base_labels", "bm25u_post", "bm25u_dl").foreach { n =>
      val t = s"graft_store_${n}_$tag"
      assert(s.catalog.tableExists(t), s"missing base segment $t")
      assert(bucketed(t), s"$t must be a bucketed store table")
    }
    // per-cycle delta segments: O(Δ) upsert + tombstone tables
    Seq("ivfd16", "ipqd16", "sdd", "bmp", "bmdl").foreach { n =>
      Seq(s"${n}_u1", s"${n}_t1", s"${n}_u2", s"${n}_t2").foreach { seg =>
        assert(s.catalog.tableExists(s"graft_store_${seg}_$tag"),
          s"missing delta segment graft_store_${seg}_$tag")
      }
    }
    // upsert-only families write no tombstone rows but still land both
    // tables; additive counter families land one signed table per cycle
    Seq("agd_u1", "agd_u2", "ccd_u1", "ccd_u2",
        "bmdf_a1", "bmdf_a2", "bmsc_a1", "bmsc_a2").foreach { seg =>
      assert(s.catalog.tableExists(s"graft_store_${seg}_$tag"),
        s"missing delta segment graft_store_${seg}_$tag")
    }
  }

  test("cycle 2's read path scans the base segment + delta segments — " +
    "never a rewritten full index") {
    val s = spark
    // pre-AQE physical plan: concrete scan nodes, no listener needed (the
    // two declarative cycle2 rungs; the iterative ones checkpoint eagerly)
    def scans(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.queryExecution.sparkPlan.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec =>
          f.tableIdentifier.map(_.table)
            .getOrElse(f.relation.location.rootPaths.mkString(","))
      }
    val bm = scans(Stores.bm25Cycle2Store(s, dir, SparkEntry.kwTerms))
    assert(bm.exists(_.startsWith("graft_store_bm25u_post")), s"no base scan: $bm")
    assert(bm.exists(_.startsWith("graft_store_bmp_u")), s"no delta scan: $bm")
    assert(!bm.exists(_.startsWith("graft_store_bc1_")),
      s"cycle 2 read a rewritten full index: $bm")
    val iv = scans(Stores.ivfCycle2Store(s, dir))
    assert(iv.exists(_.startsWith("graft_store_ivfd_base")), s"no base scan: $iv")
    assert(iv.exists(_.startsWith("graft_store_ivfd16_u")), s"no delta scan: $iv")
    assert(!iv.exists(_.startsWith("graft_store_ic1_idx")),
      s"cycle 2 read a rewritten full index: $iv")
    val pq = scans(Stores.ivfPqCycle2Store(s, dir))
    assert(pq.exists(_.startsWith("graft_store_ipqd_base")), s"no base scan: $pq")
    assert(pq.exists(_.startsWith("graft_store_ipqd16_u")), s"no delta scan: $pq")
    val sd = scans(Stores.semdedupCycle2Store(s, dir))
    assert(sd.exists(_.startsWith("graft_store_sdd_base")), s"no base scan: $sd")
    assert(sd.exists(_.startsWith("graft_store_sdd_u")), s"no delta scan: $sd")
  }

  test("stream-upsert write-back cycle: batch 3 from the UPDATED persisted " +
    "snapshot equals the in-memory snapshot composition") {
    val s = spark
    import s.implicits._
    import graft.streaming.{StreamReplay, Streams}
    val out = StreamReplay.streamUpsertCycle2(s, dir)
    // in-memory composition of the same boundaries (quarters(): slice i
    // covers [i*n/4, (i+1)*n/4) over the seq-sorted ops)
    val ops = StreamReplay.upsertOps(s, dir)
    val n = ops.length
    def slice(i: Int) = ops.slice(i * n / 4, (i + 1) * n / 4)
    val initMem = Streams.upsertStateSnapshot(s.createDataset(slice(0) ++ slice(1)))
    val snapMem = Streams.upsertStateSnapshotFrom(initMem, s.createDataset(slice(2)))
    val expected = Streams.streamingUpsertFrom(
      s.createDataset(slice(3) ++ slice(2).filter(_.seq % 11 == 0)), snapMem)
    assert(rows(out) === rows(expected.toDF()))
  }

  test("stream-session write-back cycle: batch 3 + flush from the UPDATED " +
    "persisted snapshot equals the in-memory snapshot composition") {
    val s = spark
    import s.implicits._
    import graft.streaming.{StreamReplay, Streams}
    val out = StreamReplay.streamSessionCycle2(s, dir)
    val ev = StreamReplay.eventScript(s, dir)
    val n = ev.length
    def slice(i: Int) = ev.slice(i * n / 4, (i + 1) * n / 4)
    val flushTs = new java.sql.Timestamp(ev.last.ts.getTime + 7200000L)
    val flushes = ev.map(_.user_id).distinct.sorted.zipWithIndex
      .map { case (u, i) => Streams.Event(2000000000L + i, flushTs, u, "__flush", 0.0) }
    val initMem = Streams.sessionStateSnapshot(s.createDataset(slice(0) ++ slice(1)))
    val snapMem = Streams.sessionStateSnapshotFrom(initMem, s.createDataset(slice(2)))
    val expected = Streams.sessionizeFrom(
      s.createDataset(slice(3) ++ flushes), snapMem)
    assert(rows(out) === rows(expected.toDF()))
  }

  test("stream-near-dedup write-back cycle: batch 3 from the UPDATED " +
    "persisted snapshot equals the in-memory snapshot composition") {
    val s = spark
    import s.implicits._
    import graft.streaming.{StreamReplay, Streams}
    val out = StreamReplay.streamNearDedupCycle2(s, dir)
    val docs = StreamReplay.docScript(s, dir)
    val n = docs.length
    def slice(i: Int) = docs.slice(i * n / 4, (i + 1) * n / 4)
    val initMem = Streams.nearDedupStateSnapshot(s.createDataset(slice(0) ++ slice(1)))
    val snapMem = Streams.nearDedupStateSnapshotFrom(initMem, s.createDataset(slice(2)))
    val initKV = snapMem.groupByKey(_._1).mapGroups { (k, it) =>
      (k, Streams.BucketState(
        it.toSeq.sortBy(_._2).map(r => Streams.BucketDoc(r._2, r._3))))
    }
    val expected = Streams.streamingNearDedupFrom(
      s.createDataset(slice(3)), initKV).toDF().distinct()
    assert(rows(out) === rows(expected))
  }
}
