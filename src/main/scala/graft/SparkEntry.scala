package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators._
import graft.sources.Tables

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * One `queries` entry per SURVEY.md §2 inventory line; `oracleSql` holds the
  * DuckDB-equivalent SQL for the strong hash-compare (omitted only for
  * rows-only operators whose hash family isn't SQL-portable).
  */
object SparkEntry {

  val kwTerms = Seq("filter", "join", "window")

  /** Flagship on /root/testdata/sf0.001 (driver smoke-checks rows>0): the
    * north-star RAG pipeline end-to-end — chunk documents, batch-embed each
    * chunk, cosine-retrieve top-k from the corpus index via the native
    * codegen kernel + bounded top-k aggregate. */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    Embedding.ragRetrieve(Tables.documents(spark, dir), Tables.embeddings(spark, dir))
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // --- relational / engine core ---
    "q1_agg" -> ((s, d) => Relational.q1(Tables.lineitem(s, d))),
    "q3_join" -> ((s, d) =>
      Relational.q3(Tables.customer(s, d), Tables.orders(s, d), Tables.lineitem(s, d))),
    "q5_multijoin" -> ((s, d) =>
      Relational.q5(Tables.region(s, d), Tables.nation(s, d), Tables.customer(s, d),
        Tables.orders(s, d), Tables.lineitem(s, d), Tables.supplier(s, d))),
    "q17_corr_agg" -> ((s, d) => Relational.q17(Tables.lineitem(s, d), Tables.part(s, d))),
    "q10_returns" -> ((s, d) =>
      Relational.q10(Tables.customer(s, d), Tables.orders(s, d), Tables.lineitem(s, d))),
    "q14_promo" -> ((s, d) => Relational.q14(Tables.lineitem(s, d), Tables.part(s, d))),
    "q6_forecast" -> ((s, d) => Relational.q6(Tables.lineitem(s, d))),
    "table_profile" -> ((s, d) => Relational.tableProfile(Tables.lineitem(s, d))),
    "inverted_index" -> ((s, d) => Search.invertedIndex(Tables.documents(s, d))),
    "prf_expand" -> ((s, d) => Search.prfExpand(Tables.documents(s, d), kwTerms)),
    "search_snippets" -> ((s, d) => Search.searchSnippets(Tables.documents(s, d), kwTerms)),
    "term_drift" -> ((s, d) => TermStats.termDrift(Tables.documents(s, d))),
    "winnow_matches" -> ((s, d) => Winnow.winnowMatches(Tables.documents(s, d))),
    "q18_having" -> ((s, d) =>
      Relational.q18(Tables.customer(s, d), Tables.orders(s, d), Tables.lineitem(s, d))),
    "q_window" -> ((s, d) => Relational.topOrdersPerCustomer(Tables.orders(s, d))),
    "q_moving_avg" -> ((s, d) => Relational.movingAvg(Tables.orders(s, d))),
    "q_above_avg" -> ((s, d) => Relational.aboveNationAvg(Tables.customer(s, d))),
    "q_median" -> ((s, d) => Relational.medianBalance(Tables.customer(s, d))),
    "q_cube" -> ((s, d) => Relational.segmentCube(Tables.customer(s, d), Tables.orders(s, d))),
    "q_setops" -> ((s, d) => Relational.setOps(Tables.orders(s, d))),
    "q_pivot" -> ((s, d) => Relational.langPivot(Tables.documents(s, d))),
    "q_topk_global" -> ((s, d) => Relational.topKGlobal(Tables.lineitem(s, d))),
    "q_semijoin" -> ((s, d) =>
      Relational.customersWithOpenOrders(Tables.customer(s, d), Tables.orders(s, d))),
    "q_antijoin" -> ((s, d) =>
      Relational.customersWithoutOrders(Tables.customer(s, d), Tables.orders(s, d))),
    "q_rollup" -> ((s, d) =>
      Relational.custRollup(Tables.region(s, d), Tables.nation(s, d), Tables.customer(s, d))),
    "q_events_sessionize" -> ((s, d) => Relational.sessionize(Tables.events(s, d))),
    "q_events_window" -> ((s, d) => Relational.eventsHourly(Tables.events(s, d))),
    "q_events_json" -> ((s, d) => Relational.eventsJson(Tables.events(s, d))),
    "q_retention" -> ((s, d) => Relational.retention(Tables.events(s, d))),
    "events_cohort" -> ((s, d) => Relational.cohortMatrix(Tables.events(s, d))),
    "events_wow" -> ((s, d) => Relational.eventsWow(Tables.events(s, d))),
    "q_string_agg" -> ((s, d) =>
      Relational.nationsPerRegion(Tables.region(s, d), Tables.nation(s, d))),
    "q_histogram" -> ((s, d) => Relational.priceHistogram(Tables.orders(s, d))),
    "q_funnel" -> ((s, d) => Relational.funnel(Tables.events(s, d))),
    "events_spike" -> ((s, d) => Relational.eventSpikes(Tables.events(s, d))),
    "events_zscore" -> ((s, d) => Relational.eventZscores(Tables.events(s, d))),
    "langid_eval" -> ((s, d) => TextAnalysis.langIdEval(Tables.documents(s, d))),
    "asof_join" -> ((s, d) => AsOf.purchaseAttribution(Tables.events(s, d))),
    "asof_join_exec" -> ((s, d) => AsOf.purchaseAttributionExec(Tables.events(s, d))),
    "asof_join_outer" -> ((s, d) => AsOf.purchaseAttributionOuter(Tables.events(s, d))),
    "asof_join_tol" -> ((s, d) => AsOf.purchaseAttributionTol(Tables.events(s, d))),
    "zorder_key" -> ((s, d) =>
      Tables.lineitem(s, d).select(
        org.apache.spark.sql.functions.col("l_orderkey"),
        org.apache.spark.sql.functions.col("l_partkey"),
        graft.sources.Writers.zorder2(
          org.apache.spark.sql.functions.col("l_orderkey"),
          org.apache.spark.sql.functions.col("l_partkey")).as("zval"))),
    "range_join" -> ((s, d) => AsOf.priceRangeJoin(Tables.lineitem(s, d))),
    "range_join_grid" -> ((s, d) => AsOf.priceRangeJoinGrid(Tables.lineitem(s, d))),
    "hilbert_key" -> ((s, d) =>
      graft.sources.Writers.hilbertKeys(Tables.lineitem(s, d), "l_orderkey", "l_partkey")),
    "export_graph" -> ((s, d) =>
      graft.sources.Writers.exportGraphSnapshot(Tables.orders(s, d), Tables.lineitem(s, d),
        java.nio.file.Files.createTempDirectory("graft_export").toString)),
    // --- RAG / search surface ---
    "chunk_fixed" -> ((s, d) => Chunking.chunkFixed(Tables.documents(s, d))),
    "chunk_dedup" -> ((s, d) => Chunking.chunkDedup(Tables.documents(s, d))),
    "corpus_overlap" -> ((s, d) => Corpus.corpusOverlap(Tables.documents(s, d))),
    "embed_drift" -> ((s, d) => Embedding.embedDrift(Tables.embeddings(s, d))),
    "chunk_markdown" -> ((s, d) =>
      graft.sources.Loaders.splitMarkdownSections(
        graft.sources.Loaders.syntheticMarkdownView(Tables.documents(s, d)))),
    "chunk_words" -> ((s, d) => Chunking.chunkWords(Tables.documents(s, d))),
    "md_outline" -> ((s, d) =>
      graft.sources.Loaders.markdownOutline(
        graft.sources.Loaders.syntheticMarkdownView(Tables.documents(s, d)))),
    "keyword_search" -> ((s, d) => Search.keywordSearch(Tables.documents(s, d), kwTerms)),
    "rank_files" -> ((s, d) =>
      Search.rankDocs(Tables.documents(s, d), Seq("spark", "join"), "spark join", "en")),
    "file_summary" -> ((s, d) => Search.fileSummaries(Tables.documents(s, d))),
    "vector_topk" -> ((s, d) => Search.vectorTopK(Tables.embeddings(s, d))),
    "knn_join" -> ((s, d) => Search.knnJoin(Tables.embeddings(s, d))),
    "ann_maxsim" -> ((s, d) => Search.maxsimRetrieve(Tables.embeddings(s, d))),
    "ann_graph" -> ((s, d) => GraphAnn.annGraphSearch(Tables.embeddings(s, d))),
    "ann_graph_store" -> ((s, d) => graft.sources.Stores.annGraphStore(s, d)),
    "ann_graph_wide" -> ((s, d) => graft.sources.Stores.annGraphStoreWide(s, d)),
    // maintenance directions for the k-NN graph index: arrival batch
    // beam-seeds + one touched-scoped descent round; departure batch =
    // keyed drop + route-around adjacency re-fill
    "ann_graph_upsert" -> ((s, d) => GraphAnn.annGraphUpsert(Tables.embeddings(s, d))),
    "ann_graph_upsert_store" -> ((s, d) => graft.sources.Stores.annGraphUpsertStore(s, d)),
    "ann_graph_delete" -> ((s, d) => GraphAnn.annGraphDelete(Tables.embeddings(s, d))),
    "ann_graph_delete_store" -> ((s, d) => graft.sources.Stores.annGraphDeleteStore(s, d)),
    // two-cycle WRITE-BACK for the k-NN graph: cycle 1's maintained graph
    // persisted back to the catalog, cycle 2 upserted from the UPDATED table
    "ann_graph_cycle2" -> ((s, d) => graft.sources.Stores.annGraphCycle2Store(s, d)),
    // staleness monitor (retrain trigger): arrivals beating stored worst
    // edges, bucket-aggregated with an integer verdict; gate form builds
    // the base graph in-call, the store twin serves the persisted index
    "ann_graph_drift" -> ((s, d) => GraphAnn.annGraphDrift(Tables.embeddings(s, d))),
    "ann_graph_drift_store" -> ((s, d) => graft.sources.Stores.annGraphDriftStore(s, d)),
    // LSH rebucket trigger: per-band bucket-occupancy concentration of
    // arrivals vs the standing base index, exact counts
    "minhash_lsh_drift" -> ((s, d) =>
      MinhashPortable.minhashLshDrift(Tables.documents(s, d))),
    "mmr_rerank" -> ((s, d) => Search.mmrRerank(Tables.embeddings(s, d))),
    "mmr_rerank_dist" -> ((s, d) => Search.mmrRerankDist(Tables.embeddings(s, d))),
    "hybrid_search" -> ((s, d) =>
      Search.hybrid(Tables.documents(s, d), Tables.embeddings(s, d), kwTerms)),
    "bm25_search" -> ((s, d) => Search.bm25(Tables.documents(s, d), kwTerms)),
    "bm25_upsert" -> ((s, d) => Search.bm25Upsert(Tables.documents(s, d), kwTerms)),
    "bm25_delete" -> ((s, d) => Search.bm25Delete(Tables.documents(s, d), kwTerms)),
    // store-backed read path over the persisted index artifacts (Stores):
    // same core + oracle, standing state built once per corpus snapshot
    "bm25_delete_store" -> ((s, d) => graft.sources.Stores.bm25DeleteStore(s, d, kwTerms)),
    // arrival batch tokenized alone, persisted base-slice artifacts
    // maintained additively; same oracle
    "bm25_upsert_store" -> ((s, d) => graft.sources.Stores.bm25UpsertStore(s, d, kwTerms)),
    // two-cycle WRITE-BACK: cycle 1's four maintained artifacts persisted
    // back to the catalog, cycle 2 maintained from the UPDATED tables
    "bm25_cycle2" -> ((s, d) => graft.sources.Stores.bm25Cycle2Store(s, d, kwTerms)),
    // pure serving read path: score from the persisted artifacts, zero
    // maintenance/tokenize work; oracle = bm25_upsert's full-corpus recompute
    "bm25_search_store" -> ((s, d) => graft.sources.Stores.bm25SearchStore(s, d, kwTerms)),
    "rag_eval_mrr" -> ((s, d) => Search.mrrEval(Tables.embeddings(s, d))),
    "hard_negatives" -> ((s, d) => Search.hardNegatives(Tables.embeddings(s, d))),
    "topic_terms" -> ((s, d) =>
      Cluster.topicTerms(Tables.documents(s, d), Tables.embeddings(s, d))),
    "rag_eval_ndcg" -> ((s, d) => Search.ndcgEval(Tables.embeddings(s, d))),
    "rrf_fusion" -> ((s, d) =>
      Search.rrfFusion(Tables.documents(s, d), Tables.embeddings(s, d), kwTerms)),
    // --- text analysis ---
    "lang_id" -> ((s, d) => TextAnalysis.langId(Tables.documents(s, d))),
    "quality_score" -> ((s, d) => TextAnalysis.qualityScore(Tables.documents(s, d))),
    "quality_classifier" -> ((s, d) => TextAnalysis.qualityClassifier(Tables.documents(s, d))),
    "token_count" -> ((s, d) => TextAnalysis.tokenCount(Tables.documents(s, d))),
    "doc_fingerprint" -> ((s, d) => TextAnalysis.fingerprint(Tables.documents(s, d))),
    "winnow_fingerprint" -> ((s, d) => Winnow.winnowFingerprint(Tables.documents(s, d))),
    "corpus_filter" -> ((s, d) => Corpus.qualityFilter(Tables.documents(s, d))),
    "pii_scrub" -> ((s, d) => Corpus.piiScrub(Tables.documents(s, d))),
    "corpus_sample" -> ((s, d) => Corpus.stratifiedSample(Tables.documents(s, d))),
    "corpus_shuffle" -> ((s, d) => Corpus.corpusShuffle(Tables.documents(s, d))),
    "corpus_stats" -> ((s, d) => Corpus.stats(Tables.documents(s, d))),
    "url_hosts" -> ((s, d) => UrlOps.urlHostStats(Tables.documents(s, d))),
    "compaction_plan" -> ((s, d) => Compaction.compactionPlan(Tables.documents(s, d))),
    "quality_sample" -> ((s, d) => Corpus.qualitySample(Tables.documents(s, d))),
    "join_skew_stats" -> ((s, d) => Skew.joinSkewStats(Tables.lineitem(s, d), "l_suppkey")),
    "join_card_est" -> ((s, d) =>
      Skew.joinCardEst(Tables.orders(s, d), Tables.lineitem(s, d), "o_orderkey", "l_orderkey")),
    "ivf_upsert" -> ((s, d) => Dedup.ivfUpsert(Tables.embeddings(s, d))),
    "ivf_delete" -> ((s, d) => Dedup.ivfDelete(Tables.embeddings(s, d))),
    // keyed drop served from the persisted inverted file; same oracle
    "ivf_delete_store" -> ((s, d) => graft.sources.Stores.ivfDeleteStore(s, d)),
    "tokenizer_fertility" -> ((s, d) => Bpe.fertility(Tables.documents(s, d))),
    "char_diversity" -> ((s, d) => TextAnalysis.charDiversity(Tables.documents(s, d))),
    "split_holdout" -> ((s, d) => Corpus.splitHoldout(Tables.documents(s, d))),
    "kmv_distinct" -> ((s, d) => Corpus.kmvDistinct(Tables.events(s, d))),
    "kmv_merge" -> ((s, d) => Corpus.kmvMerge(Tables.events(s, d))),
    "turnstile_distinct" -> ((s, d) => Corpus.turnstileDistinct(Tables.events(s, d))),
    "dataset_card" -> ((s, d) => Corpus.datasetCard(Tables.documents(s, d))),
    "sketch_stats" -> ((s, d) => Corpus.sketchStats(Tables.events(s, d))),
    "text_normalize" -> ((s, d) => Normalize.textNormalize(Tables.documents(s, d))),
    "gopher_quality" -> ((s, d) => Normalize.gopherQuality(Tables.documents(s, d))),
    "ngram_lm_score" -> ((s, d) => NgramLm.lmScore(Tables.documents(s, d))),
    "line_dedup" -> ((s, d) => Boilerplate.lineDedup(Tables.documents(s, d))),
    "decontaminate" -> ((s, d) => Decontaminate.decontaminate(Tables.documents(s, d))),
    "domain_mix" -> ((s, d) => DomainMix.domainMix(Tables.documents(s, d))),
    "budget_sample" -> ((s, d) => DomainMix.budgetSample(Tables.documents(s, d))),
    "snapshot_diff" -> ((s, d) => SnapshotDiff.snapshotDiff(Tables.documents(s, d))),
    "bloom_dedup" -> ((s, d) => BloomDedup.bloomDedup(Tables.documents(s, d))),
    // --- dedup / ANN ---
    "bpe_train" -> ((s, d) => Bpe.bpeTrain(s, Tables.documents(s, d))),
    "bpe_encode" -> ((s, d) => Bpe.bpeEncode(Tables.documents(s, d))),
    "dedup_exact" -> ((s, d) => Dedup.exact(Tables.documents(s, d))),
    "dedup_edit_distance" -> ((s, d) => TermStats.editDistancePairs(Tables.documents(s, d))),
    "term_freq" -> ((s, d) => TermStats.termFreq(Tables.documents(s, d))),
    "heavy_hitters" -> ((s, d) => TermStats.heavyHitters(Tables.documents(s, d))),
    "sparse_cosine" -> ((s, d) => TermStats.sparseCosine(Tables.documents(s, d))),
    "sparse_topk" -> ((s, d) => TermStats.sparseTopK(Tables.documents(s, d))),
    "vocab_coverage" -> ((s, d) => TermStats.vocabCoverage(Tables.documents(s, d))),
    "tfidf" -> ((s, d) => TermStats.tfidf(Tables.documents(s, d))),
    "dedup_substring" -> ((s, d) => ExactSubstr.substringDedup(Tables.documents(s, d))),
    "dedup_ngram_jaccard" -> ((s, d) => Dedup.ngramJaccard(Tables.documents(s, d))),
    "dedup_containment" -> ((s, d) => Containment.containmentPairs(Tables.documents(s, d))),
    "cms_freq" -> ((s, d) => CountMin.cmsFreq(Tables.documents(s, d))),
    "cms_turnstile" -> ((s, d) => CountMin.cmsTurnstile(Tables.documents(s, d))),
    // rows-only: transitive clustering is not bounded-depth SQL
    "dedup_resolve" -> ((s, d) => Dedup.resolve(Tables.documents(s, d))),
    "dedup_resolve_inc" -> ((s, d) => ResolveInc.resolveInc(Tables.documents(s, d))),
    // read path over the four persisted standing artifacts (sig/keys/
    // pairs/labels): the maintained dedup loop with no in-call state
    // rebuild; same oracle (from-scratch post-change re-resolve)
    "dedup_resolve_inc_store" -> ((s, d) => graft.sources.Stores.resolveIncStore(s, d)),
    // two-cycle WRITE-BACK: cycle 1's maintained artifacts persisted back to
    // the catalog, cycle 2 served from the UPDATED store tables
    "dedup_resolve_cycle2" -> ((s, d) => graft.sources.Stores.resolveCycle2Store(s, d)),
    "dedup_resolve_delta" -> ((s, d) => ResolveInc.resolveIncDelta(Tables.documents(s, d))),
    "dedup_minhash_lsh" -> ((s, d) => Dedup.minhashLsh(Tables.documents(s, d))),
    "minhash_portable" -> ((s, d) => MinhashPortable.minhashPortable(Tables.documents(s, d))),
    "minhash_lsh_portable" -> ((s, d) => MinhashPortable.minhashLshPortable(Tables.documents(s, d))),
    "minhash_lsh_upsert" -> ((s, d) => MinhashPortable.minhashLshUpsert(Tables.documents(s, d))),
    // arrival batch joined against the persisted base-slice index; same oracle
    "minhash_lsh_upsert_store" -> ((s, d) => graft.sources.Stores.minhashLshUpsertStore(s, d)),
    // CDC emission rung: the cycle's changefeed (artifact appends + created
    // pairs) — the production emission shape; O(Δ) output per cycle
    "minhash_lsh_upsert_delta" -> ((s, d) =>
      MinhashPortable.minhashLshUpsertDelta(Tables.documents(s, d))),
    "minhash_lsh_upsert_delta_store" -> ((s, d) =>
      graft.sources.Stores.minhashLshUpsertDeltaStore(s, d)),
    "minhash_lsh_delete" -> ((s, d) => MinhashPortable.minhashLshDelete(Tables.documents(s, d))),
    "minhash_lsh_delete_store" -> ((s, d) => graft.sources.Stores.minhashLshDeleteStore(s, d)),
    "minhash_lsh_delete_retired" -> ((s, d) =>
      MinhashPortable.minhashLshDeleteRetired(Tables.documents(s, d))),
    "simhash_portable" -> ((s, d) => MinhashPortable.simhashPortable(Tables.documents(s, d))),
    "dedup_simhash" -> ((s, d) => Dedup.simhashPairs(Tables.documents(s, d))),
    "dedup_embedding" -> ((s, d) => Dedup.embeddingNearDup(Tables.embeddings(s, d))),
    "minhash_signature" -> ((s, d) => Dedup.minhashDigest(Tables.documents(s, d))),
    "ann_lsh" -> ((s, d) => Dedup.annLsh(Tables.embeddings(s, d))),
    "ann_lsh_mp" -> ((s, d) => Dedup.annLshMultiprobe(Tables.embeddings(s, d))),
    "ann_lsh_mt" -> ((s, d) => Dedup.annLshMultiTable(Tables.embeddings(s, d))),
    // held-out probe set: the split_holdout test split (doc_id = vec_id)
    // passed as an explicit probe frame — the retrieval contract with an
    // arbitrary query batch instead of the first-nProbes corpus slice
    "ann_holdout" -> ((s, d) => {
      import org.apache.spark.sql.functions.col
      val emb = Tables.embeddings(s, d)
      val testIds = Corpus.splitHoldout(Tables.documents(s, d))
        .filter(col("split") === "test")
        .select(col("doc_id").as("vec_id"))
      Dedup.annLshMultiTable(emb, probes = Some(emb.join(testIds, "vec_id")))
    }),
    "ann_ivf" -> ((s, d) => Dedup.annIvf(Tables.embeddings(s, d))),
    // read path over the persisted cell-bucketed inverted file: probed
    // cells only (bucket prune), no per-call assignment pass; same oracle
    "ann_ivf_store" -> ((s, d) => graft.sources.Stores.annIvfStore(s, d)),
    // two-cycle WRITE-BACK over O(Δ) DELTA SEGMENTS: each cycle appends
    // (upserts, tombstones) and search serves the merge-on-read view
    "ann_ivf_cycle2" -> ((s, d) => graft.sources.Stores.ivfCycle2Store(s, d)),
    // scheduled COMPACTION of the delta store: fold base + segments into
    // one fresh bucketed base, same search, same oracle — OPTIMIZE is
    // value-preserving by construction and the hash gate proves it
    "ann_ivf_compact" -> ((s, d) => graft.sources.Stores.ivfCompactStore(s, d)),
    // FOUR delta cycles folded merge-on-read — the segment-list regime
    // the compaction cadence amortizes; oracle = %40-survivor search
    "ann_ivf_cycle4" -> ((s, d) => graft.sources.Stores.ivfCycle4Store(s, d)),
    // segment manifest off the PERSISTED tables — the compaction
    // scheduler's input; oracle counts the %40 batch classes from the
    // corpus, so the hash gate proves segments == batch algebra
    "ivf_segment_manifest" -> ((s, d) => graft.sources.Stores.ivfSegmentManifest(s, d)),
    "ann_ivf_mp" -> ((s, d) => Dedup.annIvfMultiprobe(Tables.embeddings(s, d))),
    "ann_ivf_tr" -> ((s, d) => Cluster.annIvfTrained(Tables.embeddings(s, d))),
    "doc_cluster" -> ((s, d) => Cluster.kmeans(Tables.embeddings(s, d))),
    "doc_outlier" -> ((s, d) => Cluster.docOutliers(Tables.embeddings(s, d))),
    // semdedup default = corpus-scaled cluster count (k = clamp(8,4096,ceil(n/64)));
    // the fixed-k=8 form stays as an explicitly-labeled ablation (quadratic in
    // cell occupancy at organic density — measured r10, SCALING.md).
    "semdedup" -> ((s, d) => Cluster.semdedupScaled(Tables.embeddings(s, d))),
    // within-cluster pair join over the persisted trained partition:
    // exchange-free self-join, no per-call train/assign; same oracle
    "semdedup_store" -> ((s, d) => graft.sources.Stores.semdedupStore(s, d)),
    "semdedup_upsert" -> ((s, d) => Cluster.semdedupUpsert(Tables.embeddings(s, d))),
    "semdedup_upsert_store" -> ((s, d) => graft.sources.Stores.semdedupUpsertStore(s, d)),
    "semdedup_delete" -> ((s, d) => Cluster.semdedupDelete(Tables.embeddings(s, d))),
    "semdedup_delete_store" -> ((s, d) => graft.sources.Stores.semdedupDeleteStore(s, d)),
    "semdedup_cycle2" -> ((s, d) => graft.sources.Stores.semdedupCycle2Store(s, d)),
    "semdedup_fixed" -> ((s, d) => Cluster.semdedup(Tables.embeddings(s, d))),
    // two-level quantizer: occupancy ≤ targetCell at any corpus size (the
    // flat form's kMax·targetCell ceiling removed); sub-model stays
    // distributed (cell-keyed join, nothing collected)
    "semdedup_hier" -> ((s, d) => Cluster.semdedupHier(Tables.embeddings(s, d))),
    "semdedup_hier_store" -> ((s, d) => graft.sources.Stores.semdedupHierStore(s, d)),
    "semdedup_hier_upsert" -> ((s, d) => Cluster.semdedupHierUpsert(Tables.embeddings(s, d))),
    "semdedup_hier_upsert_store" -> ((s, d) => graft.sources.Stores.semdedupHierUpsertStore(s, d)),
    "semdedup_hier_delete" -> ((s, d) => Cluster.semdedupHierDelete(Tables.embeddings(s, d))),
    "ann_pq" -> ((s, d) => ProductQuant.pqSearch(Tables.embeddings(s, d))),
    "ann_pq_tr" -> ((s, d) => ProductQuant.pqSearchTrained(Tables.embeddings(s, d))),
    "ann_pq_rerank" -> ((s, d) => ProductQuant.pqRerank(Tables.embeddings(s, d))),
    "ann_pq_rr_ad" -> ((s, d) => ProductQuant.pqRerankAdaptive(Tables.embeddings(s, d))),
    "ann_pq_rr_ad_sq8" -> ((s, d) => ScalarQuant.pqSq8RerankAdaptive(Tables.embeddings(s, d))),
    "ann_sq8" -> ((s, d) => ScalarQuant.sq8Search(Tables.embeddings(s, d))),
    "ann_sq8_rr" -> ((s, d) => ScalarQuant.sq8RerankAdaptive(Tables.embeddings(s, d))),
    "ann_ivf_pq" -> ((s, d) => ProductQuant.ivfPqSearch(Tables.embeddings(s, d))),
    // read path over the persisted cell-bucketed PQ codes: ADC scoring of
    // the probed cells only, zero raw-vector reads; same oracle
    "ann_ivf_pq_store" -> ((s, d) => graft.sources.Stores.annIvfPqStore(s, d)),
    "ivf_pq_upsert" -> ((s, d) => ProductQuant.ivfPqUpsert(Tables.embeddings(s, d))),
    "ivf_pq_upsert_store" -> ((s, d) => graft.sources.Stores.ivfPqUpsertStore(s, d)),
    "ivf_pq_drift" -> ((s, d) => ProductQuant.ivfPqDrift(Tables.embeddings(s, d))),
    "ivf_pq_delete" -> ((s, d) => ProductQuant.ivfPqDelete(Tables.embeddings(s, d))),
    "ivf_pq_delete_store" -> ((s, d) => graft.sources.Stores.ivfPqDeleteStore(s, d)),
    "ann_ivf_pq_cycle2" -> ((s, d) => graft.sources.Stores.ivfPqCycle2Store(s, d)),
    "ann_ivf_pq_rr" -> ((s, d) => ProductQuant.ivfPqRerank(Tables.embeddings(s, d))),
    "ann_ivf_pq_rr_ad" -> ((s, d) => ProductQuant.ivfPqRerankAdaptive(Tables.embeddings(s, d))),
    "ann_ivf_pq_rr_ad_mp" -> ((s, d) =>
      ProductQuant.ivfPqRerankAdaptive(Tables.embeddings(s, d), nProbeCells = 4)),
    // --- graph ---
    "graph_stats" -> ((s, d) => GraphOps.stats(Tables.orders(s, d), Tables.lineitem(s, d))),
    "graph_degree" -> ((s, d) => GraphOps.degrees(Tables.orders(s, d), Tables.lineitem(s, d))),
    "graph_khop" -> ((s, d) =>
      GraphOps.khop(Tables.customer(s, d), Tables.orders(s, d), Tables.lineitem(s, d))),
    "graph_shortest_path" -> ((s, d) => GraphOps.shortestPaths(Tables.lineitem(s, d))),
    "graph_betweenness" -> ((s, d) => GraphOps.betweenness(Tables.lineitem(s, d))),
    "graph_closeness" -> ((s, d) => GraphOps.closeness(Tables.lineitem(s, d))),
    "link_predict" -> ((s, d) => GraphOps.linkPredict(Tables.lineitem(s, d))),
    "graph_degree_dist" -> ((s, d) =>
      GraphOps.degreeDistribution(Tables.orders(s, d), Tables.lineitem(s, d))),
    "event_dedup" -> ((s, d) => Relational.eventDedup(Tables.events(s, d))),
    "quantile_hist" -> ((s, d) => Relational.quantileHist(Tables.events(s, d))),
    "moments_sketch" -> ((s, d) => Moments.momentsSketch(Tables.lineitem(s, d))),
    "kll_quantile" -> ((s, d) => Kll.kllQuantile(Tables.lineitem(s, d))),
    "kll_portable" -> ((s, d) => Kll.kllPortable(Tables.lineitem(s, d))),
    "path_mining" -> ((s, d) => Relational.pathMining(Tables.events(s, d))),
    "q_ntile" -> ((s, d) => Relational.custQuartiles(Tables.customer(s, d))),
    "q_grouping_sets" -> ((s, d) => Relational.orderGroupingSets(Tables.orders(s, d))),
    "code_stats" -> ((s, d) =>
      CodeEdges.codeStats(CodeEdges.syntheticCodeView(Tables.documents(s, d)))),
    "minhash_eval" -> ((s, d) => MinhashPortable.minhashEval(Tables.documents(s, d))),
    "pair_features" -> ((s, d) => MinhashPortable.pairFeatures(Tables.documents(s, d))),
    "graph_modularity" -> ((s, d) => GraphOps.modularity(Tables.lineitem(s, d))),
    "dedup_savings" -> ((s, d) => Dedup.savings(Tables.documents(s, d))),
    "graph_path_trace" -> ((s, d) => GraphOps.shortestPathTrace(Tables.lineitem(s, d))),
    "graph_nodes_by_label" -> ((s, d) =>
      GraphOps.nodesByLabel(Tables.orders(s, d), Tables.lineitem(s, d))),
    "graph_rels_by_type" -> ((s, d) =>
      GraphOps.relsByType(Tables.orders(s, d), Tables.lineitem(s, d))),
    "graph_triangles" -> ((s, d) => GraphOps.triangles(Tables.lineitem(s, d))),
    "graph_node_sim" -> ((s, d) => GraphOps.nodeSimilarity(Tables.lineitem(s, d))),
    "graph_pagerank" -> ((s, d) => GraphOps.pageRank(Tables.lineitem(s, d))),
    "graph_hits" -> ((s, d) => GraphOps.hits(Tables.lineitem(s, d))),
    "graph_ppr" -> ((s, d) => GraphOps.personalizedPageRank(Tables.lineitem(s, d))),
    "graph_label_prop" -> ((s, d) => GraphOps.labelProp(Tables.lineitem(s, d))),
    "graph_kcore" -> ((s, d) => GraphOps.kCore(Tables.lineitem(s, d))),
    "graph_components" -> ((s, d) => GraphOps.connectedComponents(Tables.lineitem(s, d))),
    "graph_components_inc" -> ((s, d) => GraphOps.componentsUpsert(Tables.lineitem(s, d))),
    "graph_components_del" -> ((s, d) => GraphOps.componentsDelete(Tables.lineitem(s, d))),
    // two-cycle WRITE-BACK: cycle 1's maintained labeling persisted back to
    // the catalog, cycle 2 merged from the UPDATED table (final = full graph)
    "graph_components_cycle2" -> ((s, d) => graft.sources.Stores.componentsCycle2Store(s, d)),
    // read-path variants over the persisted standing state (Stores): the
    // O(touched) / zero-edge-derive plans you'd run at 100× — oracles
    // unchanged, so the gate proves store round-trip ≡ inline derivation
    "graph_components_del_store" -> ((s, d) => graft.sources.Stores.componentsDeleteStore(s, d)),
    "graph_components_inc_store" -> ((s, d) => graft.sources.Stores.componentsUpsertStore(s, d)),
    "graph_khop_store" -> ((s, d) => graft.sources.Stores.khopStore(s, d)),
    "graph_pagerank_store" -> ((s, d) => graft.sources.Stores.pageRankStore(s, d)),
    "graph_hits_store" -> ((s, d) => graft.sources.Stores.hitsStore(s, d)),
    "impact_analysis" -> ((s, d) =>
      GraphOps.impactAnalysis(Tables.orders(s, d), Tables.lineitem(s, d))),
    // --- code intelligence (CodeTransformer analog over a derived corpus) ---
    "code_edges" -> ((s, d) =>
      CodeEdges.edges(CodeEdges.syntheticCodeView(Tables.documents(s, d)))),
    "code_graph_degree" -> ((s, d) =>
      CodeEdges.moduleDegree(
        CodeEdges.edges(CodeEdges.syntheticCodeView(Tables.documents(s, d))))),
    "code_calls" -> ((s, d) =>
      CodeEdges.callEdges(CodeEdges.syntheticCodeView(Tables.documents(s, d)))),
    "code_impact" -> ((s, d) =>
      CodeEdges.codeImpact(CodeEdges.syntheticCodeView(Tables.documents(s, d)))),
    "repo_scan" -> ((s, d) =>
      RepoScan.repoScan(RepoScan.syntheticPathView(Tables.documents(s, d)))),
    "cdc_apply" -> ((s, d) => CdcApply.cdcApply(Tables.documents(s, d))),
    "scd2_apply" -> ((s, d) => CdcApply.scd2(Tables.events(s, d))),
    "embed_pca" -> ((s, d) => Pca.pcaProject(Tables.embeddings(s, d))),
    "embed_pca_topp" -> ((s, d) => Pca.pcaTopP(Tables.embeddings(s, d))),
    // --- memory / pack / schema ---
    "graph_schema" -> ((s, d) => GraphOps.schema(Tables.orders(s, d), Tables.lineitem(s, d))),
    "mem_search" -> ((s, d) => Memory.search(Tables.documents(s, d), kwTerms)),
    "mem_extract" -> ((s, d) => Memory.extract(Tables.documents(s, d))),
    "mem_summary" -> ((s, d) => Memory.summary(Tables.documents(s, d))),
    "mem_supersede" -> ((s, d) => Memory.supersedeResolve(Tables.documents(s, d))),
    "mem_relate" -> ((s, d) => Memory.relate(Tables.documents(s, d))),
    "mem_combine" -> ((s, d) => Memory.combine(Tables.documents(s, d))),
    "mem_extract_commits" -> ((s, d) => Memory.extractCommits(Tables.documents(s, d))),
    "embed_qa" -> ((s, d) => EmbedQa.embedQa(Tables.embeddings(s, d))),
    "schema_classify" -> ((s, d) => SchemaClassify.classify(Tables.part(s, d))),
    "schema_parse" -> ((s, d) =>
      SchemaParse.parse(SchemaParse.syntheticDdlView(Tables.documents(s, d)))),
    "sql_analyze" -> ((s, d) =>
      SqlAnalyze.analyze(SqlAnalyze.syntheticQueryView(Tables.documents(s, d)))),
    "pack_builder" -> ((s, d) => PackBuilder.pack(Tables.documents(s, d), kwTerms)),
    "seq_pack" -> ((s, d) => PackBuilder.seqPack(Tables.documents(s, d))),
    // --- multimodal (plumbing real, decode stubbed; rows-only) ---
    "mm_meta" -> ((s, d) => graft.multimodal.Multimodal.metadata(Tables.documents(s, d))),
    "mm_batch" -> ((s, d) => graft.multimodal.Multimodal.batchFeatures(Tables.documents(s, d))),
    "mm_frames" -> ((s, d) => graft.multimodal.Multimodal.frameSample(Tables.documents(s, d))),
    "mm_resize" -> ((s, d) => graft.multimodal.Multimodal.resizeDigest(Tables.documents(s, d))),
    // --- batch embedding pipeline (north star; rows-only: model is a
    //     deterministic hashed-feature stand-in) ---
    "embed_docs" -> ((s, d) => Embedding.embedDigest(Tables.documents(s, d))),
    "embed_portable" -> ((s, d) => Embedding.embedPortable(Tables.documents(s, d))),
    "embed_pool" -> ((s, d) => Embedding.meanPool(Tables.embeddings(s, d))),
    "rag_retrieve" -> ((s, d) =>
      Embedding.ragRetrieve(Tables.documents(s, d), Tables.embeddings(s, d))),
    "rag_retrieve_portable" -> ((s, d) =>
      Embedding.ragRetrievePortable(Tables.documents(s, d), Tables.embeddings(s, d))),
    "rag_refresh" -> ((s, d) =>
      RagRefresh.ragRefresh(Tables.documents(s, d), Tables.embeddings(s, d))),
    // streaming operators run to completion through the deterministic
    // multi-batch replay harness (real Structured Streaming execution,
    // cross-batch state included) — the driver oracles their final output
    "stream_window" -> ((s, d) => graft.streaming.StreamReplay.streamWindow(s, d)),
    "stream_histogram" -> ((s, d) => graft.streaming.StreamReplay.streamHistogram(s, d)),
    "stream_dedup" -> ((s, d) => graft.streaming.StreamReplay.streamDedup(s, d)),
    "stream_near_dedup" -> ((s, d) => graft.streaming.StreamReplay.streamNearDedup(s, d)),
    // restart rung: bucket state bootstrapped from the persisted snapshot,
    // only the tail batches sketched/streamed
    "stream_near_dedup_store" -> ((s, d) =>
      graft.streaming.StreamReplay.streamNearDedupStore(s, d)),
    "stream_session" -> ((s, d) => graft.streaming.StreamReplay.streamSession(s, d)),
    // restart shape for watermark-free session state: open-session
    // snapshot persisted, only tail batches + flush streamed; oracle =
    // gap-split filtered to tail-triggered sessions
    "stream_session_store" -> ((s, d) => graft.streaming.StreamReplay.streamSessionStore(s, d)),
    "stream_upsert" -> ((s, d) => graft.streaming.StreamReplay.streamUpsert(s, d)),
    // production restart shape: state bootstrapped from the persisted
    // checkpoint snapshot, only tail batches streamed; oracle = the full
    // chain filtered to the tail rows
    "stream_upsert_store" -> ((s, d) => graft.streaming.StreamReplay.streamUpsertStore(s, d)),
    // two-cycle WRITE-BACK: the persisted snapshot advanced through batch 2
    // from the store, written back, batch 3 streamed from the UPDATED snapshot
    "stream_upsert_cycle2" -> ((s, d) => graft.streaming.StreamReplay.streamUpsertCycle2(s, d)),
    "stream_session_cycle2" -> ((s, d) => graft.streaming.StreamReplay.streamSessionCycle2(s, d)),
    "stream_near_dedup_cycle2" -> ((s, d) => graft.streaming.StreamReplay.streamNearDedupCycle2(s, d)),
    "stream_trending" -> ((s, d) => graft.streaming.StreamReplay.streamTrending(s, d)),
    "stream_spike" -> ((s, d) => graft.streaming.StreamReplay.streamSpike(s, d)),
    "stream_join" -> ((s, d) => graft.streaming.StreamReplay.streamJoin(s, d)),
    "stream_asof" -> ((s, d) => graft.streaming.StreamReplay.streamAsof(s, d)),
    "stream_asof_outer" -> ((s, d) => graft.streaming.StreamReplay.streamAsofOuter(s, d)),
    "stream_asof_ooo" -> ((s, d) => graft.streaming.StreamReplay.streamAsofOoo(s, d)),
    "stream_asof_tol" -> ((s, d) => graft.streaming.StreamReplay.streamAsofTol(s, d)),
    "stream_asof_ooo_outer" -> ((s, d) => graft.streaming.StreamReplay.streamAsofOooOuter(s, d)),
    "stream_quantile" -> ((s, d) => graft.streaming.StreamReplay.streamQuantile(s, d)),
  )

  /** DuckDB-equivalent ANSI SQL per query (column names aligned with the
    * Spark output — the driver sorts columns by name before hashing). */
  def oracleSql: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |CAST(SUM(CAST(CAST(l_quantity AS VARCHAR) AS DECIMAL(38,6))) AS DOUBLE) AS sum_qty,
        |CAST(SUM(CAST(CAST(l_extendedprice AS VARCHAR) AS DECIMAL(38,6))) AS DOUBLE) AS sum_base_price,
        |CAST(SUM(CAST(CAST(l_extendedprice*(CAST(1.0 AS DOUBLE)-l_discount) AS VARCHAR) AS DECIMAL(38,6))) AS DOUBLE) AS sum_disc_price,
        |CAST(SUM(CAST(CAST(l_extendedprice*(CAST(1.0 AS DOUBLE)-l_discount)*(CAST(1.0 AS DOUBLE)+l_tax) AS VARCHAR) AS DECIMAL(38,6))) AS DOUBLE) AS sum_charge,
        |COUNT(*) AS count_order,
        |CAST(SUM(CAST(CAST(l_quantity AS VARCHAR) AS DECIMAL(38,6))) AS DOUBLE)/COUNT(*) AS avg_qty,
        |CAST(SUM(CAST(CAST(l_extendedprice AS VARCHAR) AS DECIMAL(38,6))) AS DOUBLE)/COUNT(*) AS avg_price
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin,
    "q3_join" ->
      """SELECT l_orderkey,
        |CAST(SUM(CAST(CAST(l_extendedprice*(CAST(1.0 AS DOUBLE)-l_discount) AS VARCHAR) AS DECIMAL(38,6))) AS DOUBLE) AS revenue,
        |strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        |  AND l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
        |GROUP BY l_orderkey, o_orderdate
        |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin,
    "q5_multijoin" ->
      """SELECT n_name,
        |CAST(SUM(CAST(CAST(l_extendedprice*(CAST(1.0 AS DOUBLE)-l_discount) AS VARCHAR) AS DECIMAL(38,6))) AS DOUBLE) AS revenue
        |FROM region JOIN nation ON n_regionkey = r_regionkey
        |JOIN customer ON c_nationkey = n_nationkey
        |JOIN orders ON o_custkey = c_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin,
    "q_window" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, CAST(rn AS BIGINT) AS rn FROM (
        |SELECT o_custkey, o_orderkey, o_totalprice,
        |ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |FROM orders) WHERE rn <= 3""".stripMargin,
    "q17_corr_agg" -> Relational.q17Sql,
    "q18_having" -> Relational.q18Sql(),
    "q_moving_avg" -> Relational.movingAvgSql,
    "q_above_avg" -> Relational.aboveNationAvgSql,
    "q_median" -> Relational.medianBalanceSql,
    "q_cube" -> Relational.segmentCubeSql,
    "q_setops" -> Relational.setOpsSql,
    "q_pivot" -> Relational.langPivotSql,
    "q_topk_global" ->
      """SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
        |l_extendedprice*(CAST(1.0 AS DOUBLE)-l_discount) AS val
        |FROM lineitem ORDER BY val DESC, l_orderkey, l_linenumber LIMIT 20""".stripMargin,
    "q_semijoin" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'O')""".stripMargin,
    "q_antijoin" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'F')""".stripMargin,
    "q_rollup" ->
      """SELECT r_name, n_name, COUNT(*) AS n_cust,
        |CAST(SUM(CAST(CAST(c_acctbal AS VARCHAR) AS DECIMAL(38,6))) AS DOUBLE) AS sum_bal
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP(r_name, n_name)""".stripMargin,
    "q_events_sessionize" ->
      """WITH g AS (
        |  SELECT user_id, ts, event_id,
        |    CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
        |           OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
        |         THEN 1 ELSE 0 END AS brk
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |s AS (
        |  SELECT user_id, ts,
        |    CAST(SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
        |  FROM g)
        |SELECT user_id, session_id, COUNT(*) AS n_events,
        |strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS first_ts,
        |strftime(MAX(ts), '%Y-%m-%d %H:%M:%S') AS last_ts
        |FROM s GROUP BY user_id, session_id""".stripMargin,
    "q_events_window" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00') AS hour, event_type,
        |COUNT(*) AS n, CAST(SUM(CAST(CAST(value AS VARCHAR) AS DECIMAL(38,6))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2""".stripMargin,
    "q_events_json" -> Relational.eventsJsonSql,
    "q_retention" -> Relational.retentionSql,
    "events_cohort" -> Relational.cohortMatrixSql,
    "events_wow" -> Relational.eventsWowSql,
    "q_string_agg" -> Relational.nationsPerRegionSql,
    "q_histogram" -> Relational.priceHistogramSql(),
    "q_funnel" -> Relational.funnelSql,
    "events_spike" -> Relational.eventSpikesSql,
    "events_zscore" -> Relational.eventZscoresSql(),
    "asof_join" -> AsOf.purchaseAttributionSql,
    "asof_join_exec" -> AsOf.purchaseAttributionExecSql,
    "asof_join_outer" -> AsOf.purchaseAttributionOuterSql,
    "asof_join_tol" -> AsOf.purchaseAttributionTolSql,
    "zorder_key" ->
      s"""SELECT l_orderkey, l_partkey,
         |${graft.sources.Writers.zorder2Sql("l_orderkey", "l_partkey")} AS zval
         |FROM lineitem""".stripMargin,
    "range_join" -> AsOf.priceRangeJoinSql,
    "range_join_grid" -> AsOf.priceRangeJoinGridSql,
    "chunk_fixed" -> Chunking.chunkFixedSql(),
    "chunk_markdown" -> graft.sources.Loaders.splitMarkdownSql,
    "chunk_words" -> Chunking.chunkWordsSql(),
    "keyword_search" -> Search.keywordSearchSql(kwTerms),
    "rank_files" -> Search.rankDocsSql(Seq("spark", "join"), "spark join", "en"),
    "file_summary" -> Search.fileSummariesSql,
    "vector_topk" -> Search.vectorTopKSql(),
    "knn_join" -> Search.knnJoinSql(),
    "hybrid_search" -> Search.hybridSql(kwTerms),
    "bm25_search" -> Search.bm25Sql(kwTerms),
    "bm25_upsert" -> Search.bm25UpsertSql(kwTerms),
    "bm25_delete" -> Search.bm25DeleteSql(kwTerms),
    // *_store read-path variants share their inline twins' oracles verbatim:
    // the gate proves persisted-store round-trip ≡ inline ≡ from-scratch
    "bm25_delete_store" -> Search.bm25DeleteSql(kwTerms),
    "bm25_upsert_store" -> Search.bm25UpsertSql(kwTerms),
    "bm25_search_store" -> Search.bm25UpsertSql(kwTerms),
    "bm25_cycle2" -> Search.bm25Cycle2Sql(kwTerms),
    "rag_eval_mrr" -> Search.mrrEvalSql(),
    "hard_negatives" -> Search.hardNegativesSql(),
    "topic_terms" -> Cluster.topicTermsSql(),
    "rag_eval_ndcg" -> Search.ndcgEvalSql(),
    "rrf_fusion" -> Search.rrfFusionSql(kwTerms),
    "graph_triangles" -> GraphOps.trianglesSql,
    "graph_node_sim" -> GraphOps.nodeSimilaritySql(),
    "snapshot_diff" -> SnapshotDiff.snapshotDiffSql,
    "bloom_dedup" -> BloomDedup.bloomDedupSql(),
    "lang_id" -> TextAnalysis.langIdSql,
    "langid_eval" -> TextAnalysis.langIdEvalSql,
    "quality_score" -> TextAnalysis.qualityScoreSql,
    "quality_classifier" -> TextAnalysis.qualityClassifierSql(),
    "token_count" -> TextAnalysis.tokenCountSql,
    "doc_fingerprint" -> TextAnalysis.fingerprintSql,
    "winnow_fingerprint" -> Winnow.winnowFingerprintSql(),
    "corpus_filter" -> Corpus.qualityFilterSql,
    "pii_scrub" -> Corpus.piiScrubSql,
    "corpus_sample" -> Corpus.stratifiedSampleSql(),
    "corpus_shuffle" -> Corpus.corpusShuffleSql(),
    "corpus_stats" -> Corpus.statsSql,
    "url_hosts" -> UrlOps.urlHostStatsSql(),
    "compaction_plan" -> Compaction.compactionPlanSql(),
    "quality_sample" -> Corpus.qualitySampleSql(),
    "join_skew_stats" -> Skew.joinSkewStatsSql(),
    "join_card_est" -> Skew.joinCardEstSql(),
    "ann_maxsim" -> Search.maxsimRetrieveSql(),
    "ann_graph" -> GraphAnn.annGraphSearchSql(),
    "ann_graph_store" -> GraphAnn.annGraphSearchSql(),
    "ann_graph_wide" -> GraphAnn.annGraphSearchSql(kBuild = 32),
    "ann_graph_upsert" -> GraphAnn.annGraphUpsertSql(),
    "ann_graph_upsert_store" -> GraphAnn.annGraphUpsertSql(),
    "ann_graph_delete" -> GraphAnn.annGraphDeleteSql(),
    "ann_graph_delete_store" -> GraphAnn.annGraphDeleteSql(),
    "ann_graph_cycle2" -> GraphAnn.annGraphCycle2Sql(),
    "ann_graph_drift" -> GraphAnn.annGraphDriftSql(),
    "ann_graph_drift_store" -> GraphAnn.annGraphDriftSql(),
    "minhash_lsh_drift" -> MinhashPortable.minhashLshDriftSql(),
    "mmr_rerank" -> Search.mmrRerankSql(),
    "mmr_rerank_dist" -> Search.mmrRerankSql(),
    "ivf_upsert" -> Dedup.ivfUpsertSql(),
    "ivf_delete" -> Dedup.ivfDeleteSql(),
    "ivf_delete_store" -> Dedup.ivfDeleteSql(),
    "tokenizer_fertility" -> Bpe.fertilitySql(),
    "char_diversity" -> TextAnalysis.charDiversitySql,
    "split_holdout" -> Corpus.splitHoldoutSql(),
    "kmv_distinct" -> Corpus.kmvDistinctSql(),
    "kmv_merge" -> Corpus.kmvMergeSql(),
    "turnstile_distinct" -> Corpus.turnstileDistinctSql(),
    "dataset_card" -> Corpus.datasetCardSql,
    "text_normalize" -> Normalize.textNormalizeSql,
    "gopher_quality" -> Normalize.gopherQualitySql(),
    "ngram_lm_score" -> NgramLm.lmScoreSql,
    "line_dedup" -> Boilerplate.lineDedupSql(),
    "decontaminate" -> Decontaminate.decontaminateSql(),
    "domain_mix" -> DomainMix.domainMixSql(),
    "budget_sample" -> DomainMix.budgetSampleSql(),
    "doc_cluster" -> Cluster.kmeansSql(),
    "doc_outlier" -> Cluster.docOutliersSql(),
    "semdedup" -> Cluster.semdedupScaledSql(),
    "semdedup_store" -> Cluster.semdedupScaledSql(),
    "semdedup_upsert" -> Cluster.semdedupUpsertSql(),
    "semdedup_upsert_store" -> Cluster.semdedupUpsertSql(),
    "semdedup_delete" -> Cluster.semdedupDeleteSql(),
    "semdedup_delete_store" -> Cluster.semdedupDeleteSql(),
    "semdedup_cycle2" -> Cluster.semdedupCycle2Sql(),
    "semdedup_fixed" -> Cluster.semdedupSql(),
    "semdedup_hier" -> Cluster.semdedupHierSql(),
    "semdedup_hier_store" -> Cluster.semdedupHierSql(),
    "semdedup_hier_upsert" -> Cluster.semdedupHierUpsertSql(),
    "semdedup_hier_upsert_store" -> Cluster.semdedupHierUpsertSql(),
    "semdedup_hier_delete" -> Cluster.semdedupHierDeleteSql(),
    "ann_pq" -> ProductQuant.pqSearchSql(),
    "ann_pq_tr" -> ProductQuant.pqSearchTrainedSql(),
    "ann_pq_rerank" -> ProductQuant.pqRerankSql(),
    "ann_pq_rr_ad" -> ProductQuant.pqRerankAdaptiveSql(),
    "ann_pq_rr_ad_sq8" -> ScalarQuant.pqSq8RerankAdaptiveSql(),
    "ann_sq8" -> ScalarQuant.sq8SearchSql(),
    "ann_sq8_rr" -> ScalarQuant.sq8RerankAdaptiveSql(),
    "ann_ivf_pq" -> ProductQuant.ivfPqSearchSql(),
    "ann_ivf_pq_store" -> ProductQuant.ivfPqSearchSql(),
    "ivf_pq_upsert" -> ProductQuant.ivfPqSearchSql(),
    "ivf_pq_upsert_store" -> ProductQuant.ivfPqSearchSql(),
    "ivf_pq_drift" -> ProductQuant.ivfPqDriftSql(),
    "ivf_pq_delete" -> ProductQuant.ivfPqSearchSql(survWhere = "vec_id % 10 <> 0"),
    "ivf_pq_delete_store" -> ProductQuant.ivfPqSearchSql(survWhere = "vec_id % 10 <> 0"),
    "ann_ivf_pq_cycle2" ->
      ProductQuant.ivfPqSearchSql(survWhere = "vec_id % 20 NOT IN (5, 15)"),
    "ann_ivf_pq_rr" -> ProductQuant.ivfPqRerankSql(),
    "ann_ivf_pq_rr_ad" -> ProductQuant.ivfPqRerankAdaptiveSql(),
    "ann_ivf_pq_rr_ad_mp" -> ProductQuant.ivfPqRerankAdaptiveSql(nProbeCells = 4),
    "bpe_train" -> Bpe.bpeTrainSql(),
    "bpe_encode" -> Bpe.bpeEncodeSql(),
    "dedup_exact" -> Dedup.exactSql,
    "dedup_edit_distance" -> TermStats.editDistancePairsSql(),
    "term_freq" -> TermStats.termFreqSql(),
    "heavy_hitters" -> TermStats.heavyHittersSql(),
    "sparse_cosine" -> TermStats.sparseCosineSql(),
    "sparse_topk" -> TermStats.sparseTopKSql(),
    "vocab_coverage" -> TermStats.vocabCoverageSql(),
    "tfidf" -> TermStats.tfidfSql(),
    "dedup_substring" -> ExactSubstr.substringDedupSql(),
    "dedup_ngram_jaccard" -> Dedup.ngramJaccardSql(),
    "dedup_containment" -> Containment.containmentPairsSql(),
    "cms_freq" -> CountMin.cmsFreqSql(),
    "cms_turnstile" -> CountMin.cmsFreqSql(srcWhere = "doc_id % 10 <> 5"),
    "minhash_portable" -> MinhashPortable.minhashPortableSql(),
    "minhash_lsh_portable" -> MinhashPortable.minhashLshPortableSql(),
    "minhash_lsh_upsert" -> MinhashPortable.minhashLshUpsertSql(),
    "minhash_lsh_upsert_store" -> MinhashPortable.minhashLshUpsertSql(),
    "minhash_lsh_upsert_delta" -> MinhashPortable.minhashLshUpsertDeltaSql(),
    "minhash_lsh_upsert_delta_store" -> MinhashPortable.minhashLshUpsertDeltaSql(),
    "minhash_lsh_delete_store" -> MinhashPortable.minhashLshDeleteSql(),
    "minhash_lsh_delete" -> MinhashPortable.minhashLshDeleteSql(),
    "minhash_lsh_delete_retired" -> MinhashPortable.minhashLshDeleteRetiredSql(),
    "simhash_portable" -> MinhashPortable.simhashPortableSql(),
    "dedup_resolve" -> Dedup.resolveSql(),
    "dedup_resolve_inc" -> ResolveInc.resolveIncSql(),
    "dedup_resolve_inc_store" -> ResolveInc.resolveIncSql(),
    "dedup_resolve_cycle2" -> ResolveInc.resolveCycle2Sql(),
    "ann_ivf_cycle2" -> Dedup.ivfCycle2Sql(),
    "ann_ivf_compact" -> Dedup.ivfCycle2Sql(),
    "ann_ivf_cycle4" -> Dedup.ivfCycle4Sql(),
    "ivf_segment_manifest" -> {
      val base = "SELECT 'base' AS segment, 'base' AS kind, COUNT(*) AS n_rows " +
        "FROM embeddings WHERE vec_id % 40 NOT IN (0, 10, 20, 30)"
      val segs = (1 to 4).flatMap { i =>
        Seq(
          s"SELECT 'u$i', 'upsert', COUNT(*) FROM embeddings WHERE vec_id % 40 = ${10 * (i - 1)}",
          s"SELECT 't$i', 'tombstone', COUNT(*) FROM embeddings WHERE vec_id % 40 = ${10 * (i - 1) + 5}")
      }
      (base +: segs).mkString("\nUNION ALL\n")
    },
    "dedup_resolve_delta" -> ResolveInc.resolveIncDeltaSql(),
    // dedup_minhash_lsh, dedup_simhash, minhash_signature: rows-only
    // (xxhash64-based families not SQL-portable)
    "dedup_embedding" -> Dedup.embeddingNearDupSql(),
    "ann_lsh" -> Dedup.annLshSql(),
    "ann_lsh_mp" -> Dedup.annLshMultiprobeSql(),
    "ann_lsh_mt" -> Dedup.annLshMultiTableSql(),
    "ann_holdout" -> Dedup.annLshMultiTableSql(probeWhere = Some(
      s"p.vec_id IN (SELECT doc_id FROM (${Corpus.splitHoldoutSql()}) WHERE split = 'test')")),
    "ann_ivf" -> Dedup.annIvfSql(),
    "ann_ivf_store" -> Dedup.annIvfSql(),
    "ann_ivf_mp" -> Dedup.annIvfMultiprobeSql(),
    "ann_ivf_tr" -> Cluster.annIvfTrainedSql(),
    "graph_stats" -> GraphOps.statsSql,
    "graph_degree" -> GraphOps.degreesSql,
    "graph_khop" -> GraphOps.khopSql,
    "graph_khop_store" -> GraphOps.khopSql,
    "graph_shortest_path" -> GraphOps.shortestPathsSql(),
    "graph_betweenness" -> GraphOps.betweennessSql(),
    "graph_closeness" -> GraphOps.closenessSql(),
    "link_predict" -> GraphOps.linkPredictSql(),
    "graph_degree_dist" -> GraphOps.degreeDistributionSql,
    "event_dedup" -> Relational.eventDedupSql,
    "q_grouping_sets" -> Relational.orderGroupingSetsSql,
    "code_stats" -> CodeEdges.codeStatsSql,
    "minhash_eval" -> MinhashPortable.minhashEvalSql(),
    "pair_features" -> MinhashPortable.pairFeaturesSql(),
    "graph_modularity" -> GraphOps.modularitySql(),
    "dedup_savings" -> Dedup.savingsSql(),
    "hilbert_key" -> graft.sources.Writers.hilbertSql("l_orderkey", "l_partkey", "lineitem"),
    "export_graph" -> graft.sources.Writers.exportGraphSnapshotSql,
    "q10_returns" -> Relational.q10Sql(),
    "q14_promo" -> Relational.q14Sql,
    "q6_forecast" -> Relational.q6Sql,
    "table_profile" -> Relational.tableProfileSql,
    "inverted_index" -> Search.invertedIndexSql(),
    "prf_expand" -> Search.prfExpandSql(kwTerms),
    "search_snippets" -> Search.searchSnippetsSql(kwTerms),
    "md_outline" -> graft.sources.Loaders.markdownOutlineSql,
    "chunk_dedup" -> Chunking.chunkDedupSql(),
    "corpus_overlap" -> Corpus.corpusOverlapSql(),
    "embed_drift" -> Embedding.embedDriftSql,
    "term_drift" -> TermStats.termDriftSql(),
    "winnow_matches" -> Winnow.winnowMatchesSql(),
    "quantile_hist" -> Relational.quantileHistSql(),
    "moments_sketch" -> Moments.momentsSketchSql,
    // kll_quantile: rows-only (KLL compaction is merge-order-dependent;
    // kll_portable is its hash-green order-independent twin)
    "kll_portable" -> Kll.kllPortableSql(),
    "path_mining" -> Relational.pathMiningSql(),
    "q_ntile" -> Relational.custQuartilesSql,
    "graph_pagerank" -> GraphOps.pageRankSql(),
    "graph_pagerank_store" -> GraphOps.pageRankSql(),
    "graph_hits" -> GraphOps.hitsSql(),
    "graph_hits_store" -> GraphOps.hitsSql(),
    "graph_ppr" -> GraphOps.personalizedPageRankSql(),
    "graph_label_prop" -> GraphOps.labelPropSql(),
    "graph_kcore" -> GraphOps.kCoreSql(),
    "graph_components" -> GraphOps.componentsSql(),
    "graph_components_inc" -> GraphOps.componentsSql(),
    "graph_components_inc_store" -> GraphOps.componentsSql(),
    "graph_components_del" -> GraphOps.componentsDeleteSql(),
    "graph_components_del_store" -> GraphOps.componentsDeleteSql(),
    "graph_components_cycle2" -> GraphOps.componentsSql(),
    "graph_path_trace" -> GraphOps.shortestPathTraceSql(),
    "graph_nodes_by_label" -> GraphOps.nodesByLabelSql(),
    "graph_rels_by_type" -> GraphOps.relsByTypeSql(),
    "impact_analysis" -> GraphOps.impactAnalysisSql,
    "graph_schema" -> GraphOps.schemaSql,
    "code_edges" -> CodeEdges.edgesSql,
    "code_graph_degree" -> CodeEdges.moduleDegreeSql(),
    "code_impact" -> CodeEdges.codeImpactSql,
    "code_calls" -> CodeEdges.callEdgesSql,
    "repo_scan" -> RepoScan.repoScanSql(),
    "cdc_apply" -> CdcApply.cdcApplySql,
    "scd2_apply" -> CdcApply.scd2Sql,
    "embed_pca" -> Pca.pcaProjectSql(),
    "embed_pca_topp" -> Pca.pcaTopPSql(),
    "mem_search" -> Memory.searchSql(kwTerms),
    "mem_extract" -> Memory.extractSql,
    "mem_summary" -> Memory.summarySql,
    "mem_supersede" -> Memory.supersedeResolveSql,
    "mem_relate" -> Memory.relateSql,
    "mem_combine" -> Memory.combineSql(),
    "mem_extract_commits" -> Memory.extractCommitsSql,
    "embed_qa" -> EmbedQa.embedQaSql(),
    "embed_portable" -> Embedding.embedPortableSql(),
    "rag_retrieve_portable" -> Embedding.ragRetrievePortableSql(),
    "rag_refresh" -> RagRefresh.ragRefreshSql(),
    "stream_window" -> graft.streaming.StreamReplay.streamWindowSql,
    "stream_histogram" -> graft.streaming.StreamReplay.streamHistogramSql(),
    "stream_dedup" -> graft.streaming.StreamReplay.streamDedupSql,
    "stream_near_dedup" -> graft.streaming.StreamReplay.streamNearDedupSql,
    "stream_near_dedup_store" -> graft.streaming.StreamReplay.streamNearDedupStoreSql,
    "stream_session" -> graft.streaming.StreamReplay.streamSessionSql(),
    "stream_session_store" -> graft.streaming.StreamReplay.streamSessionStoreSql(),
    "stream_upsert" -> graft.streaming.StreamReplay.streamUpsertSql,
    "stream_upsert_store" -> graft.streaming.StreamReplay.streamUpsertStoreSql,
    "stream_upsert_cycle2" -> graft.streaming.StreamReplay.streamUpsertCycle2Sql,
    "stream_session_cycle2" -> graft.streaming.StreamReplay.streamSessionCycle2Sql(),
    "stream_near_dedup_cycle2" -> graft.streaming.StreamReplay.streamNearDedupCycle2Sql,
    "stream_trending" -> graft.streaming.StreamReplay.streamTrendingSql,
    "stream_spike" -> graft.streaming.StreamReplay.streamSpikeSql,
    "stream_join" -> graft.streaming.StreamReplay.streamJoinSql,
    "stream_asof" -> graft.streaming.StreamReplay.streamAsofSql,
    "stream_asof_outer" -> graft.streaming.StreamReplay.streamAsofOuterSql,
    "stream_asof_ooo" -> graft.streaming.StreamReplay.streamAsofOooSql,
    "stream_asof_tol" -> graft.streaming.StreamReplay.streamAsofTolSql,
    "stream_asof_ooo_outer" -> graft.streaming.StreamReplay.streamAsofOooOuterSql,
    "stream_quantile" -> graft.streaming.StreamReplay.streamQuantileSql(),
    "embed_pool" -> Embedding.meanPoolSql,
    "schema_classify" -> SchemaClassify.classifySql,
    "schema_parse" -> SchemaParse.parseSql,
    "sql_analyze" -> SqlAnalyze.analyzeSql,
    "pack_builder" -> PackBuilder.packSql(kwTerms),
    "seq_pack" -> PackBuilder.seqPackSql(),
    // multimodal: ASCII corpus ⇒ byte ops replay as string ops; the
    // md5_number helpers make the metadata hashes engine-portable
    "mm_meta" -> graft.multimodal.Multimodal.metadataSql,
    "mm_batch" -> graft.multimodal.Multimodal.batchFeaturesSql,
    "mm_frames" -> graft.multimodal.Multimodal.frameSampleSql(),
    "mm_resize" -> graft.multimodal.Multimodal.resizeDigestSql(),
  )
}
