package graft

import org.apache.spark.sql.SparkSession

import graft.operators.{Cluster, Dedup, ProductQuant, Recall, ScalarQuant, Search}

/** At-scale recall measurement for the four production ANN configs (the r08
  * verdict's top item): recall@3 vs exact brute force on a StressGen corpus
  * whose replica embeddings carry the deterministic per-replica
  * perturbation — so recall measures INDEX QUALITY under 10x/100x density,
  * not tie-breaking among identical duplicates. Test-scope tool:
  *
  *   sbt "Test/runMain graft.Recall10x [sfDir]"      # default /tmp/sf1
  */
object Recall10x {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/sf1")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = graft.sources.Tables.embeddings(spark, sfDir).localCheckpoint()
    val n = emb.count()
    val exact = Search.knnJoin(emb, nProbes = 10, k = 3).localCheckpoint()
    println(s"dir=$sfDir corpus=$n probes=10 k=3 (registered defaults per variant)")
    val variants = Seq[(String, () => org.apache.spark.sql.DataFrame)](
      ("ann_lsh_mt", () => Dedup.annLshMultiTable(emb, nProbes = 10, k = 3)),
      ("ann_ivf_tr", () => Cluster.annIvfTrained(emb)),
      ("ann_pq_rerank", () => ProductQuant.pqRerank(emb)),
      // density-scaled rerank pools: the registered depth=30 is sized for
      // the 2k base corpus; at 10x/100x density the oversampling factor
      // must grow with cluster occupancy or the true top-k falls outside
      // the ADC pool — these rows measure the recovery
      ("ann_pq_rr_d100", () => ProductQuant.pqRerank(emb, depth = 100)),
      ("ann_pq_rr_d300", () => ProductQuant.pqRerank(emb, depth = 300)),
      // trained codebooks: the recovery path where the data-independent
      // grid's quantization error reaches the neighbor-gap scale
      ("ann_pq_tr", () => ProductQuant.pqSearchTrained(emb)),
      ("ann_ivf_pq_rr", () => ProductQuant.ivfPqRerank(emb)),
      // branch-and-bound pool: sizes itself from per-candidate ADC error
      // bounds — the operator-shaped answer to the fixed-depth collapse
      ("ann_pq_rr_ad", () => ProductQuant.pqRerankAdaptive(emb)),
      ("ann_sq8", () => ScalarQuant.sq8Search(emb)))
    variants.foreach { case (name, mk) =>
      val t0 = System.nanoTime()
      val approx = mk().localCheckpoint()
      val r = Recall.recallAtK(exact, approx)
      // near-tie-tolerant recall: on the replica corpus the top-k is a
      // cluster of near-equivalents (gap ~1e-4 cosine); eps=1e-3 credits
      // any member of that cluster
      val re = Recall.recallAtKEps(exact, approx, emb, eps = 1e-3)
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"$name%-14s recall@3=$r%.3f recall@3(eps=1e-3)=$re%.3f time=$secs%.1fs")
    }
    spark.stop()
  }
}
