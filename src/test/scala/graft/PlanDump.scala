package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Formatted-plan snapshots for the headline queries — the audit artifact
  * behind the scale claims (broadcast vs shuffle joins, pushed filters,
  * WholeStageCodegen spans, partial aggregation). Test-scope tool:
  * sbt "Test/runMain graft.PlanDump [sfDir] [outFile]"
  */
object PlanDump {
  private val headline = Seq(
    "q5_multijoin",     // broadcast dims + shuffled fact joins
    "q17_corr_agg",     // corr-subquery agg: partial aggs + one shuffle
    "sparse_cosine",    // All-Pairs prefix filter: bounded candidate join
    "graph_components", // iterative pointer-jumping (first round's plan)
    "dedup_minhash_lsh",// band-bucket groupBy candidates
    "ann_pq_rerank",    // ADC scan + broadcast pool refine join
    "ann_ivf_pq_rr",    // cell-routed ADC + broadcast refine join
    "bm25_search",      // inverted-index postings join
    "pack_builder",     // two-phase distributed prefix sum
    "tfidf",            // explode + two-shuffle TF/DF shape
    "knn_join",         // prenorm-split cosine: per-side norms under the join
    "ann_holdout",      // explicit probe frame (holdout split) bucket join
    "asof_join_exec",   // custom AsofJoinExec: co-clustered children, one merge pass
    "asof_join_tol",    // same exec with the O(1) at-emit lookback bound
    "range_join_grid",  // interval→cell equi-join + residual filter (large-large path)
    "moments_sketch",   // power sums: partial_ aggs before the one exchange = sketch merge
    "kll_quantile",     // KLL objhashagg: partial sketches before the one exchange
    "kll_portable",     // log-bucket cells: map-side-combined groupBy + bounded window
    "kmv_merge",        // per-day k-min sketches re-minned: two bounded aggs
    "ann_pq_rr_ad",     // branch-and-bound pool: narrow score pass + broadcast kth-lb
    "ann_ivf_pq_rr_ad", // cell-routed adaptive pool (cosine-scale brackets)
    "ann_sq8_rr",       // SQ8 adaptive pool: fused encode+bound pass + refine join
    "minhash_lsh_upsert", // delta-only sketch + standing-index band equi-join
    "bm25_upsert",      // additive index maintenance + broadcast-stats scoring
    "graph_components_inc", // delta label lookup + label-graph CC + broadcast relabel
    // r11 delete direction + composed pool
    "bm25_delete",      // subtractive maintenance: anti-join postings, broadcast stats
    "minhash_lsh_delete", // keyed drop of departing ids + surviving band equi-join
    "minhash_lsh_delete_retired", // delta-bounded retired pairs: del keys ⋈ standing index
    "graph_components_del", // touched-scope CC + single-pass union-free merge
    "ann_pq_rr_ad_sq8", // PQ pool ∩ SQ8 pool: two narrow scans, semi-joined pools
    "semdedup",         // corpus-scaled k-means blocking + within-cell pair join
    // r14 store READ PATHS (declarative plans — the iterative store rungs
    // checkpoint eagerly, so their value shows in StoresSpec's concrete-plan
    // assertions, not a lazy dump): every scan below should show a bucketed
    // graft_store_* table, probed-cell/term keys as a bucket prune
    // (SelectedBucketsCount), and NO standing-state derive
    "bm25_search_store",   // 4 artifact scans, term bucket prune, zero tokenize
    "bm25_upsert_store",   // delta tokenize + additive artifact maintenance
    "bm25_delete_store",   // anti-join subtract over bucketed postings
    "ann_ivf_store",       // probed cells literal IN → SelectedBucketsCount
    "ivf_delete_store",    // keyed drop + cell-pruned search, frozen quantizer
    "ann_ivf_pq_store",    // ADC over persisted codes — no raw vector read
    "semdedup_store",      // cluster-bucketed self-join, zero exchange
    "semdedup_hier",       // two-level quantizer: cell-keyed sub-model join
    "minhash_lsh_delete_store", // keyed anti-join over sig/key stores
    "minhash_lsh_upsert_store", // delta sketch ⋈ persisted base index
    "minhash_lsh_upsert_delta", // CDC changefeed: S/K appends + created pairs
    "minhash_lsh_upsert_delta_store", // same feed off the persisted index
    // write-back cycle matrix (r15 delta segments): the read path scans
    // the bucketed base segment + the O(Δ) per-cycle delta tables
    // (graph_components_cycle2 / ann_graph_cycle2 are iterative — their
    // segment contract is pinned by Cycle2Spec, not a lazy dump)
    "bm25_cycle2",         // merged postings/doclens + summed df/sc segments
    "ann_ivf_cycle2",      // merge-on-read over ivfd_base + ivfd16 segments
    // r14 session 3: the last two families' maintenance rungs
    "ivf_pq_upsert_store", // delta encode appended to persisted base codes
    "ivf_pq_delete_store", // keyed drop from persisted codes, probed-cell scan
    "ivf_pq_drift",        // narrow error kernel + cell-keyed groupBy
    "semdedup_upsert_store", // arrival assign off persisted cents, created-pair join
    "semdedup_hier_upsert_store", // two-level model from catalog, zero training
    "semdedup_delete_store", // retired pairs: bucketed partition both sides
    "ann_ivf_pq_cycle2",   // merge-on-read over ipqd_base + ipqd16 segments
    "semdedup_cycle2")     // merge-on-read over sdd_base + sdd segments

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    // default to a scratch path: committed PLANS_r*.md snapshots are
    // historical round artifacts and must only be (over)written when the
    // round's file is named explicitly
    val out = args.lift(1).getOrElse("/tmp/PLANS_scratch.md")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // same optimizer extensions as the bench/verify sessions — the
    // snapshots must show the plans that actually execute
    graft.functions.GraftFunctions.registerOptimizerRules(spark)
    val sb = new StringBuilder
    sb ++= s"# Physical-plan snapshots (sf=$sfDir)\n\n"
    sb ++= "Generated by `sbt \"Test/runMain graft.PlanDump\"` — the plans behind\n"
    sb ++= "SURVEY §5's scale claims. Look for: BroadcastHashJoin on dim/pool\n"
    sb ++= "sides, PushedFilters/ReadSchema on scans, partial_ aggregates before\n"
    sb ++= "every exchange, WholeStageCodegen spans over the hot maps.\n"
    headline.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      sb ++= s"\n## $name\n\n```\n$plan```\n"
    }
    Files.write(Paths.get(out), sb.toString.getBytes(StandardCharsets.UTF_8))
    println(s"[plandump] wrote ${headline.size} plans to $out")
    spark.stop()
  }
}
