package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{Cluster, Dedup, ProductQuant, Recall, ScalarQuant, Search}

/** Round-10 measurement tool for the adaptive-pool family and the
  * semantic-dedup natural-density run (r09 verdict items 3/4/5):
  *
  *  - recall@3 exact + eps for the three adaptive variants (flat PQ,
  *    IVF-PQ, SQ8) next to their fixed-depth comparison points;
  *  - POOL SIZE per probe (mean/max) — the adaptive pool is provably the
  *    ambiguity set, so its size is the honest cost number the fixed
  *    depth hides;
  *  - with --dedup: semdedup / dedup_embedding / doc_outlier wall time,
  *    candidate-pair counts (Σ_block n·(n−1)/2 from the actual blocking
  *    key) and output rows — does cluster-scoped search still bound
  *    candidates when density is organic?
  *
  * Test-scope tool: sbt "Test/runMain graft.AdaptiveProbe <dir> [--dedup]"
  */
object AdaptiveProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/nat20k")
    val doHier = args.contains("--hier")
    val doDedup = args.contains("--dedup") || doHier
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def loadAvg(): Double =
      try new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get("/proc/loadavg"))).split("\\s+")(0).toDouble
      catch { case _: Throwable => -1.0 }
    val emb = graft.sources.Tables.embeddings(spark, dir).localCheckpoint()
    val n = emb.count()
    println(f"dir=$dir corpus=$n probes=10 k=3 load=${loadAvg()}%.1f")

    val exact = Search.knnJoin(emb, nProbes = 10, k = 3).localCheckpoint()
    def poolStats(pool: org.apache.spark.sql.DataFrame): (Double, Long) = {
      val per = pool.groupBy("probe_id").count().agg(
        avg("count").as("mean"), max("count").as("mx")).collect().head
      (per.getDouble(0), per.getLong(1))
    }
    val variants = Seq[(String, () => org.apache.spark.sql.DataFrame,
                        Option[() => org.apache.spark.sql.DataFrame])](
      ("ann_pq_rr_ad", () => ProductQuant.pqRerankAdaptive(emb),
        Some(() => ProductQuant.pqAdaptivePool(emb, 32, 64, 10, 3))),
      ("ann_ivf_pq_rr_ad", () => ProductQuant.ivfPqRerankAdaptive(emb),
        Some(() => ProductQuant.ivfPqAdaptivePool(emb, 16, 32, 128, 10, 3))),
      ("ann_ivf_pq_rr_ad_mp", () => ProductQuant.ivfPqRerankAdaptive(emb, nProbeCells = 4),
        Some(() => ProductQuant.ivfPqAdaptivePool(emb, 16, 32, 128, 10, 3,
          nProbeCells = 4))),
      ("ann_sq8_rr", () => ScalarQuant.sq8RerankAdaptive(emb),
        Some(() => ScalarQuant.sq8AdaptivePool(emb, 10, 3))),
      // r11: PQ pool ∩ SQ8 pool — both contain the exact top-k, the
      // intersection fetches the fewest raw vectors
      ("ann_pq_rr_ad_sq8", () => ScalarQuant.pqSq8RerankAdaptive(emb),
        Some(() => ProductQuant.pqAdaptivePool(emb, 32, 64, 10, 3)
          .join(ScalarQuant.sq8AdaptivePool(emb, 10, 3),
            Seq("probe_id", "neighbor_id"), "left_semi"))),
      ("ann_ivf_pq_rr_d30", () => ProductQuant.ivfPqRerank(emb), None),
      ("ann_ivf_pq_rr_d300", () => ProductQuant.ivfPqRerank(emb, depth = 300), None),
      ("ann_pq_rr_d300", () => ProductQuant.pqRerank(emb, depth = 300), None),
      ("ann_sq8", () => ScalarQuant.sq8Search(emb), None))
    (if (doHier) Seq.empty else variants).foreach { case (name, mk, poolMk) =>
      val t0 = System.nanoTime()
      val approx = mk().localCheckpoint()
      val r = Recall.recallAtK(exact, approx)
      val re = Recall.recallAtKEps(exact, approx, emb, eps = 1e-3)
      val secs = (System.nanoTime() - t0) / 1e9
      val ps = poolMk.map(p => poolStats(p())) match {
        case Some((mean, mx)) => f" pool_mean=$mean%.0f pool_max=$mx"
        case None => ""
      }
      println(f"$name%-19s recall@3=$r%.3f recall@3(eps)=$re%.3f time=$secs%.1fs$ps")
    }

    if (doDedup) {
      // candidate-pair budget per blocking scheme: Σ_block n(n−1)/2 over
      // the ACTUAL blocking key each operator joins on
      def pairBudget(blocks: org.apache.spark.sql.DataFrame): Long =
        blocks.agg(sum(col("cnt") * (col("cnt") - 1)))
          .collect().head.getLong(0) / 2
      val kmBlocks = Cluster.kmeans(emb).groupBy("cluster")
        .agg(count(lit(1)).as("cnt"))
      val semCand = pairBudget(kmBlocks)
      val lblCand = pairBudget(emb.groupBy("label").agg(count(lit(1)).as("cnt")))
      val total = n * (n - 1) / 2
      def timed(name: String, cand: Long)(mk: => org.apache.spark.sql.DataFrame): Unit = {
        val t0 = System.nanoTime()
        val rows = mk.count()
        val secs = (System.nanoTime() - t0) / 1e9
        val frac = cand.toDouble / total
        println(f"$name%-16s candidates=$cand%,d (${frac * 100}%.1f%% of all-pairs) rows=$rows%,d time=$secs%.1fs")
      }
      if (!doHier) timed("semdedup", semCand)(Cluster.semdedup(emb))
      // density-scaled config: cluster count matched to organic structure
      // (NaturalGen has 64 centers) and a near-dup threshold — the
      // production knobs when the default k=8 blocks go quadratic
      if (!doHier) {
        val km64 = Cluster.kmeans(emb, k = 64).groupBy("cluster")
          .agg(count(lit(1)).as("cnt"))
        timed("semdedup_k64_t95", pairBudget(km64))(
          Cluster.semdedup(emb, k = 64, threshold = 0.95))
        timed("dedup_embedding", lblCand)(Dedup.embeddingNearDup(emb))
        timed("doc_outlier", semCand)(Cluster.docOutliers(emb))
      }
      // r14: the REGISTERED scaled default vs the two-level hierarchical
      // quantizer — past n ≈ kMax·targetCell (262k) the flat form's clamp
      // binds and occupancy grows with n, while hier holds ≤ ~targetCell
      val scaledBlocks = Cluster
        .semdedupAssigned(emb, Cluster.scaledK(emb), iters = 1)
        .groupBy("cluster").agg(count(lit(1)).as("cnt"))
      timed("semdedup_scaled", pairBudget(scaledBlocks))(
        Cluster.semdedupScaled(emb))
      val hierBlocks = Cluster.hierAssigned(emb, 64, 64, 8, 4096, 1)
        .groupBy("cluster").agg(count(lit(1)).as("cnt"))
      timed("semdedup_hier", pairBudget(hierBlocks))(Cluster.semdedupHier(emb))
    }
    spark.stop()
  }
}
