package graft

import org.apache.spark.sql.functions._

import graft.operators.{GraphAnn, GraphOps, MinhashPortable}
import graft.sources.{Stores, Tables}

/** Round-14 maintenance rungs: the CDC emission contract of the LSH
  * upsert changefeed, the two-cycle store write-back, the graph-ANN
  * upsert/delete structural invariants, and the near-dedup restart split.
  * All at sf0.001 — the CORRECTNESS gate re-proves each against DuckDB at
  * sf0.01; these pin the Scala-side identities so a regression fails fast
  * locally. */
class Round14Spec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def rows(df: org.apache.spark.sql.DataFrame): Set[String] =
    df.collect().map(_.toString).toSet

  test("lsh upsert changefeed: 'P' rows are exactly the upsert pair set; " +
    "'S'/'K' rows are exactly the delta sketch artifacts") {
    val s = spark
    val docs = Tables.documents(s, dir)
    val feed = MinhashPortable.minhashLshUpsertDelta(docs)
    feed.cache()
    val p = feed.filter(col("op") === "P")
      .select(col("doc_id").as("doc_a"), col("doc_b"), col("est_jaccard"), col("kind"))
    assert(rows(p) === rows(MinhashPortable.minhashLshUpsert(docs)))
    val delta = docs.filter(pmod(col("doc_id"), lit(10L)) === 0L)
    val sigD = MinhashPortable.minhashPortable(delta)
    assert(rows(feed.filter(col("op") === "S")
      .select(col("doc_id"), col("perm"), col("minh"))) === rows(sigD))
    assert(rows(feed.filter(col("op") === "K")
      .select(col("doc_id"), col("band"), col("bkey"))) ===
      rows(MinhashPortable.bandKeys(sigD, 4)))
    // store twin emits the identical changefeed
    assert(rows(Stores.minhashLshUpsertDeltaStore(s, dir)) === rows(feed))
    feed.unpersist()
  }

  test("resolve write-back cycle: cycle 2 from the updated catalog tables " +
    "equals a from-scratch re-resolve of the post-both-batches corpus") {
    val s = spark
    val out = Stores.resolveCycle2Store(s, dir)
    // from-scratch: fixed-point labeling of the LSH pair graph over the
    // corpus after both arrival/departure batches (doc_id%20 ∉ {5,15})
    val post = Tables.documents(s, dir)
      .filter(!pmod(col("doc_id"), lit(20L)).isin(5L, 15L))
    val sig = MinhashPortable.minhashPortable(post)
    val pairs = MinhashPortable.pairsFromIndex(sig, MinhashPortable.bandKeys(sig, 4))
    val expected = GraphOps.labelPropagation(
        pairs.select(col("doc_a").as("src"), col("doc_b").as("dst")))
      .select(col("node").as("doc_id"), col("label").as("canonical_id"),
        (col("node") === col("label")).as("keep"))
    assert(rows(out) === rows(expected))
    // the write-back actually landed as DELTA SEGMENTS: each of the four
    // artifacts has both cycles' upsert/tombstone tables in the catalog,
    // and the bucketed ri_* base segments stay untouched underneath
    val tag = dir.replaceAll("[^A-Za-z0-9]", "_")
    Seq("rsig", "rkeys", "rpairs", "rlab").foreach { n =>
      Seq(s"${n}_u1", s"${n}_t1", s"${n}_u2", s"${n}_t2").foreach { seg =>
        assert(s.catalog.tableExists(s"graft_store_${seg}_$tag"),
          s"missing delta segment graft_store_${seg}_$tag")
      }
    }
  }

  test("graph-ANN upsert: arrivals join the graph, untouched base adjacency " +
    "is verbatim, store twin matches inline") {
    val s = spark
    val emb = Tables.embeddings(s, dir)
    val arrivals = emb.filter(pmod(col("vec_id"), lit(10L)) === 0L)
    val embBase = emb.filter(pmod(col("vec_id"), lit(10L)) =!= 0L)
    // snapshot the standing state up front: upsertedGraph releases its
    // gBase argument's checkpoint blocks once the union graph is built
    val gBase = GraphAnn.knnGraph(embBase)
    val gBaseRowsByNode = gBase.collect()
      .map(r => (r.getLong(0), r.toString)).groupBy(_._1)
    val eNew = GraphAnn.annGraphSearchFrom(GraphAnn.knnGraph(embBase), embBase,
      k = 16, probes = Some(arrivals))
    val touched = eNew.select(col("probe_id")).collect().map(_.getLong(0)).toSet ++
      eNew.select(col("neighbor_id")).collect().map(_.getLong(0)).toSet
    val gM = GraphAnn.upsertedGraph(gBase, emb)
    gM.cache()
    val arrivalIds = arrivals.select(col("vec_id")).collect().map(_.getLong(0)).toSet
    val gmNodes = gM.select(col("node")).distinct().collect().map(_.getLong(0)).toSet
    // every arrival with any base neighborhood is a node of the graph
    assert(arrivalIds.nonEmpty && arrivalIds.subsetOf(gmNodes))
    // adjacency bound holds everywhere
    val maxDeg = gM.groupBy(col("node")).count().agg(max(col("count"))).head().getLong(0)
    assert(maxDeg <= 16)
    // untouched base nodes keep their standing rows VERBATIM
    val untouchedRows = gBaseRowsByNode.filterNot(kv => touched(kv._1))
      .values.flatten.map(_._2).toSet
    assert(untouchedRows.subsetOf(rows(gM)))
    assert(rows(graft.operators.GraphAnn.annGraphUpsert(emb)) ===
      rows(Stores.annGraphUpsertStore(s, dir)))
    gM.unpersist()
  }

  test("graph-ANN delete: no departed endpoint survives; store twin matches") {
    val s = spark
    val emb = Tables.embeddings(s, dir)
    val g = GraphAnn.knnGraph(emb)
    val gM = GraphAnn.deletedGraph(g, emb)
    gM.cache()
    assert(gM.filter(pmod(col("node"), lit(10L)) === 0L ||
      pmod(col("nbr"), lit(10L)) === 0L).count() === 0L)
    val maxDeg = gM.groupBy(col("node")).count().agg(max(col("count"))).head().getLong(0)
    assert(maxDeg <= 16)
    assert(rows(GraphAnn.annGraphDelete(emb)) ===
      rows(Stores.annGraphDeleteStore(s, dir)))
    gM.unpersist()
  }

  test("near-dedup restart: store rung = plain rung restricted to " +
    "tail-triggered pairs") {
    val s = spark
    val plain = rows(graft.streaming.StreamReplay.streamNearDedup(s, dir))
    val store = rows(graft.streaming.StreamReplay.streamNearDedupStore(s, dir))
    assert(store.subsetOf(plain))
    // the split point: quarters() boundaries over the doc_id-sorted script
    val ids = Tables.documents(s, dir).select(col("doc_id"))
      .collect().map(_.getLong(0)).sorted
    val tailIds = ids.drop(2 * ids.length / 4).toSet
    val tailTriggered = graft.streaming.StreamReplay.streamNearDedup(s, dir)
      .filter(col("doc_b").isInCollection(tailIds))
    assert(store === rows(tailTriggered))
  }
}
