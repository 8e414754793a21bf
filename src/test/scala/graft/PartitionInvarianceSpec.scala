package graft

/** Cluster-size invariance: the queries whose plans carry order-sensitive
  * accumulation (decimal money sums, two-phase prefix sums, decimal-exact
  * Lloyd updates, broadcast-back rate tables) must return IDENTICAL rows
  * when the shuffle partition count changes — that is the property that
  * lets the same job give the same answer on 32 local threads and 1000
  * executors. Runs each sensitive query at 5 and 32 shuffle partitions
  * and diffs the exact results.
  */
class PartitionInvarianceSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"
  private val sensitive = Seq(
    "q1_agg",        // decimal money sums
    "q5_multijoin",  // decimal sums through a join tree
    "domain_mix",    // decimal weight total broadcast back
    "doc_cluster",   // decimal-exact Lloyd update, collected centroids
    "pack_builder",  // two-phase distributed prefix sum over nPartitions
    "seq_pack",      // shard-local running sums
    // round-4 additions with order-sensitive or kernel-side accumulation
    "cms_freq",         // sketch cell sums must merge identically
    "compaction_plan",  // per-group sequential fold after an in-group sort
    "graph_modularity", // label-prop rounds + integer contributions
    "quantile_hist",    // bucket histogram + integer cum selection
    "mmr_rerank",       // driver greedy over engine-computed doubles
    "hilbert_key",      // pure kernel — trivially invariant, pins the claim
    // round-5 additions
    "sparse_cosine",    // decimal window running bound + decimal dots
    "dedup_edit_distance", // rare-shingle candidate gate + distinct
    "rag_refresh",      // diff → merge → re-embed → cell argmax chain
    "ann_pq",           // driver codebooks + kernel encode + decimal-free ADC
    "ann_ivf_pq",       // residual encode: cell argmax feeds the codebooks
    // round-6 additions
    "ann_pq_rerank",    // broadcast pool join + exact-cosine TopKAgg ties
    "stream_window",    // full streaming replay: decimal sums across batches
    "stream_upsert")    // cross-batch state protocol must not see partitioning

  private def rows(name: String): Seq[String] =
    SparkEntry.queries(name)(spark, dir).collect().map(_.toString).sorted.toSeq

  test("sensitive queries are invariant to the shuffle partition count") {
    val before = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      sensitive.foreach { name =>
        spark.conf.set("spark.sql.shuffle.partitions", "5")
        val at5 = rows(name)
        spark.conf.set("spark.sql.shuffle.partitions", "32")
        val at32 = rows(name)
        assert(at5 == at32,
          s"$name differs between 5 and 32 shuffle partitions " +
            s"(${at5.size} vs ${at32.size} rows)")
      }
    } finally spark.conf.set("spark.sql.shuffle.partitions", before)
  }
}
