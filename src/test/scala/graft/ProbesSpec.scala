package graft

import org.apache.spark.sql.functions._

import graft.operators.{Cluster, Corpus, Dedup, ProductQuant, Probes, ScalarQuant, Search}
import graft.sources.Tables

/** The explicit-probe contract of the ANN/retrieval family (r08): every
  * search operator accepts an arbitrary (vec_id, embedding) probe frame;
  * passing the default slice explicitly must be indistinguishable from
  * omitting it, and a genuinely held-out probe set (the split_holdout test
  * split) must produce results for exactly those probes.
  */
class ProbesSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def sameRows(a: org.apache.spark.sql.DataFrame,
                       b: org.apache.spark.sql.DataFrame): Boolean =
    a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty

  test("explicit default-slice probes are identical to the implicit default") {
    val emb = Tables.embeddings(spark, dir)
    val slice = Some(emb.filter(col("vec_id") < 10))
    val checks: Seq[(String, org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame)] =
      Seq(
        ("knn_join", Search.knnJoin(emb), Search.knnJoin(emb, probes = slice)),
        ("ann_lsh", Dedup.annLsh(emb), Dedup.annLsh(emb, probes = slice)),
        ("ann_lsh_mp", Dedup.annLshMultiprobe(emb), Dedup.annLshMultiprobe(emb, probes = slice)),
        ("ann_lsh_mt", Dedup.annLshMultiTable(emb), Dedup.annLshMultiTable(emb, probes = slice)),
        ("ann_ivf", Dedup.annIvf(emb), Dedup.annIvf(emb, probes = slice)),
        ("ann_ivf_mp", Dedup.annIvfMultiprobe(emb), Dedup.annIvfMultiprobe(emb, probes = slice)),
        ("ann_ivf_tr", Cluster.annIvfTrained(emb), Cluster.annIvfTrained(emb, probes = slice)),
        ("ann_pq", ProductQuant.pqSearch(emb), ProductQuant.pqSearch(emb, probes = slice)),
        ("ann_pq_rerank", ProductQuant.pqRerank(emb), ProductQuant.pqRerank(emb, probes = slice)),
        ("ann_sq8", ScalarQuant.sq8Search(emb), ScalarQuant.sq8Search(emb, probeDf = slice)),
        ("hard_negatives", Search.hardNegatives(emb), Search.hardNegatives(emb, probes = slice)))
    checks.foreach { case (name, dflt, explicit) =>
      assert(sameRows(dflt, explicit), s"$name: explicit default slice diverged")
    }
  }

  test("held-out probe set drives retrieval for exactly its own ids") {
    val emb = Tables.embeddings(spark, dir)
    val testIds = Corpus.splitHoldout(Tables.documents(spark, dir))
      .filter(col("split") === "test")
      .select(col("doc_id").as("vec_id"))
    val probeSet = emb.join(testIds, "vec_id")
    val nProbes = probeSet.count()
    assert(nProbes > 0L, "holdout test split produced no probes")
    val out = Dedup.annLshMultiTable(emb, probes = Some(probeSet))
    val outProbes = out.select(col("probe_id")).distinct()
    val expected = probeSet.select(col("vec_id").as("probe_id"))
    // every result row belongs to a holdout probe (no leakage from the
    // default slice); every probe surfaces at least one neighbor on this
    // corpus (the 5×24 family's candidate sets are never empty here)
    assert(outProbes.join(expected, Seq("probe_id"), "left_anti").isEmpty,
      "results for a non-holdout probe id")
    assert(outProbes.count() === nProbes,
      "a holdout probe returned no neighbors")
  }

  test("Probes.resolve normalizes columns and defaults to the prefix slice") {
    val emb = Tables.embeddings(spark, dir)
    val dflt = Probes.resolve(emb, None, 7)
    assert(dflt.columns.toSeq === Seq("vec_id", "embedding"))
    assert(dflt.count() === 7L)
    val extraCols = emb.withColumn("junk", lit(1)).filter(col("vec_id") < 3)
    val explicit = Probes.resolve(emb, Some(extraCols), 99)
    assert(explicit.columns.toSeq === Seq("vec_id", "embedding"))
    assert(explicit.count() === 3L)
  }
}
