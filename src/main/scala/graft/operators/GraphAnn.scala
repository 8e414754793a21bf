package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorOps

/** Graph-based ANN (the HNSW/NN-descent index family — the one production
  * ANN layout the engine lacked): a deterministic k-NN GRAPH built by
  * NN-descent over LSH-seeded edges, searched by greedy BEAM expansion.
  * Reference analog: the vector-similarity retrieval surface
  * (neo4j_knowledge_service.py:922 vector search — Neo4j's own vector
  * index is an HNSW, i.e. exactly this family); algorithms are the public
  * NN-descent (Dong et al., WWW'11) and greedy beam search literature.
  *
  * Build (all set-at-a-time DataFrame ops — the distributed NN-descent
  * formulation):
  *   1. SEED — S independent LSH tables (the portable hyperplane family
  *      ann_lsh uses) bucket the corpus; within a bucket each vector takes
  *      its C successors on the id-sorted RING (a partitioned window +
  *      positional equi-join — never the bucket² pair join). Seed degree
  *      ≤ S·C, cost O(N·S·C).
  *   2. DESCENT — R rounds of the NN-descent step: candidates = my
  *      neighbors' neighbors (one self-join of the symmetrized graph),
  *      capped per node by a PORTABLE-hash order (the deterministic stand-in
  *      for NN-descent's random sampling — keeps each round O(N·cap)
  *      scored pairs at any corpus size), scored by exact cosine, kept
  *      top-K per node (TopKAgg: score DESC, id ASC — O(N·K) state).
  *
  * Search: greedy beam from E fixed entry points (first-ids convention,
  * as annIvf's first-n centroids): T rounds of expand-neighbors → exact
  * cosine → per-probe top-B (the bounded frontier that makes graph search
  * sub-linear); per-probe probe cost is O(T·B·K) score evaluations vs
  * IVF-mp's O(probes·cells-probed·cell-size).
  *
  * Every step — bucketing, ring, hash cap, cosine, every tie-break — is
  * engine-portable, so the DuckDB oracle replays the ENTIRE build + search
  * and the output is hash-green (the r11 verdict's bar for this family:
  * rows-only only with a portable twin; this IS the portable form).
  * Recall@3 is tracked in Bench next to the other ANN rungs.
  */
object GraphAnn {

  /** Portable pseudo-random order for the candidate cap: the kmv xor-shift
    * recipe over a pair key — deterministic, SQL-replayable. Ids are
    * masked to 31 bits BEFORE the multiply (the kmvHash recipe): stress-
    * tier replica ids × 2654435761 overflow BIGINT on BOTH engines under
    * ANSI semantics (hit at the 10× tier); the mask is the identity at
    * gate SFs, so gate values are unchanged. */
  private def pairHash(a: Column, b: Column): Column = {
    val key = pmod(a.bitwiseAND(lit(0x7FFFFFFFL)) * 2654435761L +
      b.bitwiseAND(lit(0x7FFFFFFFL)) * 40503L, lit(4294967296L))
    key.bitwiseXOR(shiftright(key, 16)).cast("double")
  }

  private def pairHashSql(a: String, b: String): String = {
    val key = s"(($a & 2147483647)*2654435761 + ($b & 2147483647)*40503) % 4294967296"
    s"CAST(xor($key, ($key) // 65536) AS DOUBLE)"
  }

  /** The LSH-bucket id-ring seed pairs — per LSH table, each vector's C
    * successors on the id-sorted ring within its bucket (a partitioned
    * window + positional equi-join, never the bucket² pair join). Shared
    * by the full build and the upsert direction's arrival-batch seeding. */
  private def seedPairs(embeddings: DataFrame, tables: Int, nPlanes: Int,
                        ringSpan: Int): DataFrame = {
    // r15 shape: the pair set is UNCHANGED ({(v@p, v@(p+c) mod sz) : c in
    // 1..ringSpan}, then self-filter + distinct), but it is produced by
    //   - ONE embeddings scan (posexplode over the per-table buckets, not
    //     a `tables`-way union of scans), and
    //   - lead(vec_id, c) columns in the SAME window pass for the
    //     non-wrapping successors (pos+c < sz) — the committed before-plan
    //     paid ringSpan positional self-joins of the bucket membership
    //     (2 exchanges each); only the RING-WRAP tail (pos+c >= sz, a few
    //     rows per bucket, pmod for buckets smaller than the span) still
    //     joins back against the membership, once.
    val w = Window.partitionBy(col("t"), col("bucket")).orderBy(col("vec_id"))
    val bucketed = embeddings.select(col("vec_id"), posexplode(array(
        (0 until tables).map(t =>
          Dedup.lshBucket(col("embedding"), nPlanes, seed = t * 7)): _*)))
      .select(col("pos").cast("long").as("t"), col("col").as("bucket"),
        col("vec_id"))
    val mem = bucketed.select(col("t"), col("bucket"), col("vec_id"),
      (row_number().over(w) - 1).cast("long").as("pos"),
      count(lit(1)).over(Window.partitionBy(col("t"), col("bucket"))).as("sz"),
      array((1 to ringSpan).map(c => lead(col("vec_id"), c).over(w)): _*).as("succ"))
    val noWrap = mem
      .select(col("vec_id").as("node"), explode(col("succ")).as("nbr"))
      .filter(col("nbr").isNotNull)
    val wrapA = mem
      // only ring positions whose span actually wraps — without the filter
      // sequence(start > stop) would DESCEND and fabricate pairs
      .filter(col("pos") + ringSpan >= col("sz"))
      .select(col("t"), col("bucket"), col("vec_id").as("node"), col("pos"),
        col("sz"), explode(sequence(
          greatest(col("sz") - col("pos"), lit(1L)), lit(ringSpan.toLong))).as("c"))
      .select(col("t"), col("bucket"), col("node"),
        pmod(col("pos") + col("c"), col("sz")).as("tgt"))
    // r16 (verdict item 5): the wrap tail is a few rows per bucket
    // (≤ ringSpan·(ringSpan+1)/2 per (t, bucket) by the pos+span ≥ sz
    // filter — bucket-count-bounded, corpus-size-independent), so it rides
    // a broadcast and the membership side keeps its window partitioning
    // instead of re-exchanging on (t, bucket, tgt).
    val wrap = broadcast(wrapA).join(
        mem.select(col("t"), col("bucket"), col("vec_id").as("nbr"),
          col("pos").as("tgt")),
        Seq("t", "bucket", "tgt"))
      .select(col("node"), col("nbr"))
    noWrap.unionAll(wrap)
      .filter(col("node") =!= col("nbr")).distinct()
  }

  /** Probe-only visibility into the seed pass ([[AnnCostProbe]]'s stage
    * decomposition — seedPairs itself stays private). */
  private[graft] def seedPairsProbe(embeddings: DataFrame, tables: Int = 4,
                                    nPlanes: Int = 6, ringSpan: Int = 4): DataFrame =
    seedPairs(embeddings, tables, nPlanes, ringSpan)

  /** Exact-cosine scores for candidate pairs — the embedding-fetch join
    * that dominates a descent round's cost (two 64-float vectors + 128
    * MACs per pair). Kept separate from the ranking tail so already-
    * scored pairs (current edges) can bypass it. */
  private def scoreCos(pairs: DataFrame, embeddings: DataFrame): DataFrame = {
    val en = embeddings.select(col("vec_id").as("node"), col("embedding").as("ev"))
    val eb = embeddings.select(col("vec_id").as("nbr"), col("embedding").as("bv"))
    pairs.join(en, "node").join(eb, "nbr")
      .withColumn("cos", VectorOps.cosine(col("ev"), col("bv")))
      .select(col("node"), col("nbr"), col("cos"))
  }

  /** Top-`k` per node over already-scored (node, nbr, cos) rows — the
    * TopKAgg tail (cos DESC, id ASC). */
  private def topKRanked(scored: DataFrame, k: Int): DataFrame = scored
    .groupBy(col("node"))
    .agg(graft.functions.TopKAgg.topK(col("cos"), col("nbr"), k).as("topk"))
    .select(col("node"), explode(col("topk")).as("e"))
    .select(col("node"), col("e.id").as("nbr"), col("e.score").as("cos"))

  /** Score (node, nbr) pairs by exact cosine and keep top-`k` per node. */
  private def topKScored(pairs: DataFrame, embeddings: DataFrame, k: Int): DataFrame =
    topKRanked(scoreCos(pairs, embeddings), k)

  /** The deterministic k-NN graph: (node, nbr, cos), ≤ kNbrs rows per node.
    *
    * `kBuild` (0 = kNbrs) is the BUILD-WIDTH lever: descend with a wider
    * per-node neighbor list, truncate to kNbrs at the end. NN-descent
    * converges through neighbors-of-neighbors, so a wider intermediate
    * list reaches candidates a tight list prunes too early — the
    * build-quality bound the 10× tier measured (edge recall 0.232 at
    * kBuild = kNbrs, where MORE search rounds did NOT move search recall:
    * the misses were not graph-reachable). Costs O(kBuild/kNbrs)× per
    * descent round, paid once at ingest; the searched graph stays
    * kNbrs-sized. */
  def knnGraph(embeddings: DataFrame, kNbrs: Int = 16, tables: Int = 4,
               nPlanes: Int = 6, ringSpan: Int = 4, rounds: Int = 4,
               cap: Int = 64, kBuild: Int = 0): DataFrame = {
    import Iterative._
    val kb = math.max(kNbrs, kBuild)
    val seeds = seedPairs(embeddings, tables, nPlanes, ringSpan)
    // per-round materialize (Iterative contract): every descent round — and
    // every beam round downstream — re-references the CURRENT graph several
    // times; an unmaterialized lineage replicates the whole build into each
    // reference (measured: the first registration without these checkpoints
    // ran 198 s at sf0.1 vs ~1 s with them — exponential plan re-derivation,
    // the khopFrom lesson)
    var g = topKScored(seeds, embeddings, kb).materialize
    // --- NN-descent rounds: neighbors-of-neighbors, hash-capped, rescored.
    // Two output-identical build-cost cuts (r15, verdict item 4):
    //   (a) KNOWN-SCORE REUSE — current edges already carry their exact
    //       cosine, and cosine is bit-exact SYMMETRIC (IEEE multiply
    //       commutes; the dot/norm folds see the same operand pairs), so
    //       the symmetrized current graph re-enters the top-k with its
    //       stored score and only the FRESH nn-candidates pay the
    //       embedding-fetch + cosine join (~1/3 of scored pairs per round
    //       at the default cap);
    //   (b) FIX-POINT EARLY STOP — a round that changes no edge makes
    //       every later round a no-op (the round is a deterministic
    //       function of the graph), so the loop exits; the final graph is
    //       bit-identical to running all `rounds`, and the oracle replays
    //       the full unrolled chain to the same values.
    var r = 1
    var converged = false
    while (r <= rounds && !converged) {
      val next = descentRound(g, embeddings, cap, kb).materialize
      // (b): one tiny probe job per round — any edge in next ∖ g or
      // g ∖ next? (pair sets; cos is functionally determined by the pair).
      // The two anti-joins ride ONE job via union (isEmpty short-circuits
      // through the limit-1) — the pre-r15 spelling paid a second job on
      // every converged round.
      val nextPairs = next.select(col("node"), col("nbr"))
      val gPairs = g.select(col("node"), col("nbr"))
      converged =
        nextPairs.join(gPairs, Seq("node", "nbr"), "left_anti")
          .unionAll(gPairs.join(nextPairs, Seq("node", "nbr"), "left_anti"))
          .isEmpty
      release(g)
      g = next
      r += 1
    }
    if (kb == kNbrs) g
    else g.groupBy(col("node"))
      .agg(graft.functions.TopKAgg.topK(col("cos"), col("nbr"), kNbrs).as("topk"))
      .select(col("node"), explode(col("topk")).as("e"))
      .select(col("node"), col("e.id").as("nbr"), col("e.score").as("cos"))
  }

  /** One NN-descent round over the CURRENT graph `g` — the loop body of
    * [[knnGraph]], factored out so the committed plan artifact (PlanSnap's
    * `ann_descent_round_*`) IS the loop the optimization targets, exactly
    * like GraphOps.labelPropRoundProbe. Returns the round's next graph,
    * unmaterialized (the loop checkpoints it). */
  private[graft] def descentRound(g: DataFrame, embeddings: DataFrame,
                                  cap: Int, kb: Int): DataFrame = {
    val symC = g.select(col("node"), col("nbr"), col("cos"))
      .unionAll(g.select(col("nbr").as("node"), col("node").as("nbr"), col("cos")))
      .distinct()
    val sym = symC.select(col("node"), col("nbr"))
    val nn = sym.as("a").join(sym.as("b"), col("a.nbr") === col("b.node"))
      .select(col("a.node").as("node"), col("b.nbr").as("nbr"))
      .filter(col("node") =!= col("nbr"))
    // deterministic sampling cap on the NEW candidates ONLY (classic
    // NN-descent keeps current neighbors and samples fresh ones): keep
    // `cap` DISTINCT nn-candidates per node in portable-hash order
    // BEFORE the cosine pass — bounds a round to O(N·(cap + 2K)) scored
    // pairs at any corpus size. Capping the union instead silently
    // DROPPED current best edges each round (non-monotone descent —
    // measured edge recall stuck ≈ 0.1 until this split).
    //
    // Known-score reuse (r15): only candidates NOT already scored pay the
    // cosine join; the union below re-ranks known + fresh together — same
    // candidate set, same values, as rescoring everything. r16 (verdict
    // item 1): the cap-then-anti-join tail is ONE fused aggregation —
    // current edges ride the same node-keyed exchange as the nn candidates
    // (cur=true rows feed the exclusion set, evaluated after the cap
    // exactly like the (node, nbr) anti-join it replaces), so the
    // per-round plan drops the anti-join's exchange + its second sym scan.
    // Dedup/cap equivalence is TopKDistinctAgg's argument (duplicate
    // candidates carry identical pure-function hash scores).
    val fresh = nn
      .select(col("node"), col("nbr"),
        (pairHash(col("node"), col("nbr")) * -1).as("h"), lit(false).as("cur"))
      .unionAll(sym.select(col("node"), col("nbr"), lit(0.0).as("h"),
        lit(true).as("cur")))
      .groupBy(col("node"))
      .agg(graft.functions.TopKDistinctExceptAgg.topKDistinctExcept(
        col("h"), col("nbr"), col("cur"), cap).as("topk"))
      .select(col("node"), explode(col("topk")).as("nbr"))
    topKRanked(symC.unionAll(scoreCos(fresh, embeddings)), kb)
  }

  /** One beam-search round over graph adjacency `sym` from frontier
    * `beamDf` — the [[annGraphSearchFrom]] loop body for the PlanSnap
    * artifact (`ann_beam_round_*`), unexecuted. Mirrors the loop verbatim:
    * expand, score by exact cosine against the probe vectors, keep the
    * top-`beam` per probe. */
  private[graft] def beamRoundProbe(beamDf: DataFrame, sym: DataFrame,
                                    embeddings: DataFrame, probeDf: DataFrame,
                                    beam: Int = 16): DataFrame = {
    val expanded = beamDf.select(col("probe_id"), col("node"))
      .join(sym, "node")
      .select(col("probe_id"), col("nbr").as("node"))
      .unionAll(beamDf.select(col("probe_id"), col("node")))
    val scored = expanded
      .join(embeddings.select(col("vec_id").as("node"), col("embedding")), "node")
      .join(broadcast(probeDf), "probe_id")
      .withColumn("cos", VectorOps.cosine(col("embedding"), col("pv")))
      .select(col("probe_id"), col("node"), col("cos"))
    scored.groupBy(col("probe_id"))
      .agg(graft.functions.TopKDistinctAgg.topKDistinct(
        col("cos"), col("node"), beam).as("topk"))
      .select(col("probe_id"), explode(col("topk")).as("e"))
      .select(col("probe_id"), col("e.id").as("node"), col("e.score").as("cos"))
  }

  /** Beam-search ANN over the k-NN graph: (probe_id, neighbor_id, rn, cos)
    * — the knnJoin output contract, oracle-replayable end-to-end. */
  def annGraphSearch(embeddings: DataFrame, nProbes: Int = 10, k: Int = 3,
                     kNbrs: Int = 16, entries: Int = 4, beam: Int = 16,
                     searchRounds: Int = 4, buildRounds: Int = 4,
                     cap: Int = 64, kBuild: Int = 0,
                     probes: Option[DataFrame] = None): DataFrame =
    annGraphSearchFrom(
      knnGraph(embeddings, kNbrs, rounds = buildRounds, cap = cap, kBuild = kBuild),
      embeddings, nProbes, k, entries, beam, searchRounds, probes,
      releaseGraph = true)

  /** Production-shaped core: beam search over a PERSISTED k-NN graph —
    * the index is built once at ingest (knnGraph → store), queries pay
    * only the walk. `releaseGraph` frees the inline build's checkpoint
    * blocks (a store-backed scan has nothing to release). */
  def annGraphSearchFrom(g: DataFrame, embeddings: DataFrame,
                         nProbes: Int = 10, k: Int = 3, entries: Int = 4,
                         beam: Int = 16, searchRounds: Int = 4,
                         probes: Option[DataFrame] = None,
                         releaseGraph: Boolean = false): DataFrame = {
    import Iterative._
    // materialized: every search round joins this same frame
    val sym = g.select(col("node"), col("nbr"))
      .unionAll(g.select(col("nbr").as("node"), col("node").as("nbr")))
      .distinct().materialize
    val probeDf = Probes.resolve(embeddings, probes, nProbes)
      .select(col("vec_id").as("probe_id"), col("embedding").as("pv"))
    def score(candidates: DataFrame): DataFrame = candidates
      .join(embeddings.select(col("vec_id").as("node"), col("embedding")), "node")
      .join(broadcast(probeDf), "probe_id")
      .withColumn("cos", VectorOps.cosine(col("embedding"), col("pv")))
      .select(col("probe_id"), col("node"), col("cos"))
    // r16: top-b DEDUPS inside the bounded aggregate (TopKDistinctAgg — a
    // duplicate candidate carries the identical pure-function cos, so the
    // result equals distinct-then-topB exactly), which lets every beam
    // round feed its raw expansion straight into the scoring join: the
    // per-round (probe_id, node) distinct exchange is gone (1 Exchange ×
    // searchRounds per search/upsert-seeding call). Duplicates pay a
    // redundant 64-float cosine each — narrow per-task work traded for a
    // full shuffle pass (guide §2.3 "aggregate before you shuffle").
    def topB(scored: DataFrame, b: Int): DataFrame = scored
      .groupBy(col("probe_id"))
      .agg(graft.functions.TopKDistinctAgg.topKDistinct(
        col("cos"), col("node"), b).as("topk"))
      .select(col("probe_id"), explode(col("topk")).as("e"))
      .select(col("probe_id"), col("e.id").as("node"), col("e.score").as("cos"))
    // entry points: the PROBE ITSELF (a corpus member — its own graph
    // adjacency IS the local neighborhood, so the walk starts in-region;
    // kNN graphs over clustered corpora are disconnected across clusters,
    // which is what sank the fixed-entries-only variant) plus `entries`
    // fixed first-ids (annIvf's first-n convention) as cross-component
    // fallback for out-of-corpus probes
    var beamDf = topB(score(probeDf.select(col("probe_id"))
      .crossJoin(embeddings.filter(col("vec_id") < entries)
        .select(col("vec_id").as("node")))
      .unionAll(probeDf.select(col("probe_id"), col("probe_id").as("node")))),
      beam).materialize
    for (_ <- 1 to searchRounds) {
      // no distinct: topB dedups inside its bounded buffer (see above)
      val expanded = beamDf.select(col("probe_id"), col("node"))
        .join(sym, "node")
        .select(col("probe_id"), col("nbr").as("node"))
        .unionAll(beamDf.select(col("probe_id"), col("node")))
      val next = topB(score(expanded), beam).materialize
      release(beamDf)
      beamDf = next
    }
    if (releaseGraph) release(g)
    release(sym)
    beamDf.filter(col("node") =!= col("probe_id"))
      .groupBy(col("probe_id"))
      .agg(graft.functions.TopKAgg.topK(col("cos"), col("node"), k).as("topk"))
      .select(col("probe_id"), posexplode(col("topk")))
      .select(col("probe_id"), col("col.id").as("neighbor_id"),
        (col("pos") + 1).cast("long").as("rn"), col("col.score").as("cos"))
  }

  // ---- maintenance: upsert / delete (r13 verdict item 2 — the last index
  // family without a maintenance direction; reference anchor: Neo4j's HNSW
  // vector index is maintained through entity upserts,
  // neo4j_knowledge_service.py:922's backend) -------------------------------

  private val isArrVec = pmod(col("vec_id"), lit(10L)) === 0L

  /** UPSERT direction: one arrival batch (vec_id%10 == 0) inserted into
    * the standing k-NN graph of the base corpus WITHOUT rebuilding it —
    * the incremental NN-descent recipe:
    *
    *   1. each arrival BEAM-SEARCHES the standing graph for its own
    *      neighborhood (annGraphSearchFrom at k = kNbrs — the O(T·B·K)
    *      walk, exactly the query path) and adopts the found top-kNbrs as
    *      its adjacency — the HNSW insert's candidate-selection step;
    *   2. ONE local descent round over the TOUCHED set only (arrivals ∪
    *      their found neighbors): candidates = touched nodes' current
    *      neighbors + hash-capped neighbors-of-neighbors through the
    *      union graph, rescored by exact cosine, top-kNbrs kept. This is
    *      where base nodes ADOPT reverse edges to arrivals that beat
    *      their current k-th neighbor, and where two arrivals landing in
    *      the same region link to each other (nbr-of-nbr through a
    *      shared base neighbor).
    *
    * Untouched nodes keep their standing adjacency rows verbatim — the
    * maintenance cost is O(Δ·B·K) search + O(|touched|·cap) rescoring,
    * independent of corpus size (|touched| ≤ Δ·(kNbrs+1)). The arrival
    * batch is assumed bounded (the Probes scale contract: it rides one
    * broadcast). Registered output = the standard beam search over the
    * MAINTAINED graph, probes = the first-nProbes corpus convention;
    * every step is portable, so the DuckDB oracle replays the base build,
    * the insert, the local round and the final search end-to-end. */
  def annGraphUpsert(embeddings: DataFrame, nProbes: Int = 10, k: Int = 3,
                     kNbrs: Int = 16, entries: Int = 4, beam: Int = 16,
                     searchRounds: Int = 4, rounds: Int = 4,
                     cap: Int = 64): DataFrame =
    annGraphUpsertFrom(
      knnGraph(embeddings.filter(!isArrVec), kNbrs, rounds = rounds, cap = cap),
      embeddings, nProbes, k, kNbrs, entries, beam, searchRounds, cap)

  /** Production-shaped core of [[annGraphUpsert]]: the standing graph is
    * passed in (a persisted store in the _store rung); only the arrival
    * batch pays search + one touched-scoped descent round. */
  def annGraphUpsertFrom(gBase: DataFrame, embeddings: DataFrame,
                         nProbes: Int = 10, k: Int = 3, kNbrs: Int = 16,
                         entries: Int = 4, beam: Int = 16,
                         searchRounds: Int = 4, cap: Int = 64): DataFrame =
    annGraphSearchFrom(
      upsertedGraph(gBase, embeddings, kNbrs, entries, beam, searchRounds, cap),
      embeddings, nProbes, k, entries, beam, searchRounds, releaseGraph = true)

  /** The MAINTAINED graph after the arrival batch — exposed so the spec
    * can pin the structural contract (arrival adjacency present, untouched
    * base rows verbatim). Assembled from [[upsertedGraphDelta]]: untouched
    * base adjacency verbatim ∪ the touched-node delta — the identity the
    * write-back cycle's DeltaStore.merged view relies on. */
  private[graft] def upsertedGraph(gBase: DataFrame, embeddings: DataFrame,
                                   kNbrs: Int = 16, entries: Int = 4,
                                   beam: Int = 16, searchRounds: Int = 4,
                                   cap: Int = 64,
                                   arrPred: Column = isArrVec): DataFrame = {
    import Iterative._
    val gT = upsertedGraphDelta(gBase, embeddings, kNbrs, entries, beam,
      searchRounds, cap, arrPred)
    val gM = gBase
      .join(gT.select(col("node")).distinct(), Seq("node"), "left_anti")
      .unionByName(gT).materialize
    release(gBase); release(gT)
    gM
  }

  /** The O(Δ)-write DELTA of the arrival upsert: the full new adjacency
    * of every TOUCHED node (arrivals ∪ base nodes that adopted a reverse
    * edge or entered the local descent round) — rows out = O(|touched|·K),
    * corpus-size-independent. Untouched nodes never appear: a write-back
    * cycle persists exactly this frame (wholesale per-node pk) instead of
    * rewriting the whole graph. */
  private[graft] def upsertedGraphDelta(gBase: DataFrame, embeddings: DataFrame,
                                        kNbrs: Int = 16, entries: Int = 4,
                                        beam: Int = 16, searchRounds: Int = 4,
                                        cap: Int = 64,
                                        arrPred: Column = isArrVec): DataFrame = {
    import Iterative._
    // `embeddings` is the POST-BATCH corpus (standing ∪ arrivals); arrPred
    // picks the arrival slice — parametrized so the write-back cycle
    // (Stores.annGraphCycle2Store) can run two successive batches
    val embBase = embeddings.filter(!arrPred)
    val arrivals = embeddings.filter(arrPred)
    // 1a. seed: beam-search each arrival's neighborhood in the standing graph
    val eNew = annGraphSearchFrom(gBase, embBase, k = kNbrs, entries = entries,
        beam = beam, searchRounds = searchRounds, probes = Some(arrivals))
      .select(col("probe_id").as("node"), col("neighbor_id").as("nbr"), col("cos"))
      .materialize
    // 1b. arrival-ring seeds: the build's LSH id-ring step over the ARRIVAL
    // BATCH ALONE (O(Δ)) — two arrivals that are near-dups of each other
    // share no base neighbor that beats them, so without a direct seed the
    // touched descent round can only link them through weaker shared base
    // nodes (measured at 10×: upsert recall 0.933 vs rebuild 0.967 until
    // this seed; with it the round rescues the clique edges exactly)
    val eArr = topKScored(seedPairs(arrivals, tables = 4, nPlanes = 6,
      ringSpan = 4), embeddings, kNbrs).materialize
    // union graph (arrival nodes are new — base rows can't duplicate; the
    // two arrival seed sets are base- vs arrival-pointing, also disjoint).
    // gBase is NOT released here: the caller still reads it to assemble
    // the merged graph (untouched rows verbatim)
    val g1 = gBase.unionByName(eNew).unionByName(eArr).materialize
    val touched = eNew.select(col("node"))
      .unionAll(eNew.select(col("nbr").as("node")))
      .unionAll(eArr.select(col("node")))
      .unionAll(eArr.select(col("nbr").as("node")))
      .distinct().materialize
    // 2. one NN-descent round restricted to the touched set. (A
    // conservative HNSW-style variant — arrivals-only descent + merge-in
    // of reverse arrival edges at touched base nodes — was measured at
    // 10×: 0.900 recall vs this design's 0.933 on the plain base graph,
    // equal at the wide build; in near-tie replica cliques the full
    // re-descend of touched nodes repairs more reachability than it
    // churns, so it stays the registered recipe.)
    val sym1 = g1.select(col("node"), col("nbr"))
      .unionAll(g1.select(col("nbr").as("node"), col("node").as("nbr")))
      .distinct().materialize
    val symT = sym1.join(touched, Seq("node"), "left_semi")
    // r16: the knnGraph-round pattern applied to the touched round — the
    // candidate dedup lives INSIDE the bounded cap aggregate
    // (TopKDistinctAgg: duplicates carry identical hash scores, so the
    // result equals the previous distinct-then-TopKAgg exactly) and the
    // O(touched·deg²)-row distinct exchange is gone.
    val nnT = symT.as("a").join(sym1.as("b"), col("a.nbr") === col("b.node"))
      .select(col("a.node").as("node"), col("b.nbr").as("nbr"))
      .filter(col("node") =!= col("nbr"))
    val nnCapped = nnT.groupBy(col("node"))
      .agg(graft.functions.TopKDistinctAgg.topKDistinct(
        pairHash(col("node"), col("nbr")) * -1, col("nbr"), cap).as("topk"))
      .select(col("node"), explode(col("topk")).as("e"))
      .select(col("node"), col("e.id").as("nbr"))
    val candT = symT.unionAll(nnCapped).distinct()
    // every touched node re-emits its full top-kNbrs adjacency here (each
    // has ≥1 sym1 edge, so candT covers it) — nodes(gT) IS the touched set
    val gT = topKScored(candT, embeddings, kNbrs).materialize
    release(eNew); release(eArr); release(g1); release(sym1); release(touched)
    gT
  }

  /** DELETE direction: one departure batch (vec_id%10 == 0) removed from
    * the standing full-corpus graph — keyed drop + LOCAL adjacency
    * re-fill:
    *
    *   1. drop every edge touching a departed node (two broadcast
    *      anti-joins — the keyed-delete shape of a node-keyed edge store);
    *   2. TOUCHED survivors (those that lost a neighbor in either edge
    *      direction) re-fill their lists from (a) their surviving
    *      symmetrized adjacency and (b) ROUTE-AROUND candidates — the
    *      surviving neighbors of their dropped neighbors (one hop through
    *      the hole, ≤ kNbrs² per node), rescored by exact cosine,
    *      top-kNbrs kept.
    *
    * Untouched survivors keep their rows verbatim: O(|touched|·kNbrs²)
    * maintenance, independent of corpus size. Registered output = the
    * standard beam search over the maintained graph with surviving
    * probes; fully replayed by the DuckDB oracle. */
  def annGraphDelete(embeddings: DataFrame, nProbes: Int = 10, k: Int = 3,
                     kNbrs: Int = 16, entries: Int = 4, beam: Int = 16,
                     searchRounds: Int = 4, rounds: Int = 4,
                     cap: Int = 64): DataFrame =
    annGraphDeleteFrom(knnGraph(embeddings, kNbrs, rounds = rounds, cap = cap),
      embeddings, nProbes, k, kNbrs, entries, beam, searchRounds)

  /** Production-shaped core of [[annGraphDelete]]: standing graph passed
    * in; only the touched adjacency is rescored. */
  def annGraphDeleteFrom(g: DataFrame, embeddings: DataFrame,
                         nProbes: Int = 10, k: Int = 3, kNbrs: Int = 16,
                         entries: Int = 4, beam: Int = 16,
                         searchRounds: Int = 4): DataFrame =
    annGraphSearchFrom(deletedGraph(g, embeddings, kNbrs),
      embeddings.filter(!isArrVec), nProbes, k, entries, beam, searchRounds,
      releaseGraph = true)

  /** The MAINTAINED graph after the departure batch — exposed for the
    * structural spec (no departed endpoint survives; untouched rows
    * verbatim). */
  private[graft] def deletedGraph(g: DataFrame, embeddings: DataFrame,
                                  kNbrs: Int = 16,
                                  delPred: Column = isArrVec): DataFrame = {
    import Iterative._
    val delN = embeddings.filter(delPred).select(col("vec_id").as("node"))
    val delB = delN.select(col("node").as("nbr"))
    val embSurv = embeddings.filter(!delPred)
    val sym = g.select(col("node"), col("nbr"))
      .unionAll(g.select(col("nbr").as("node"), col("node").as("nbr")))
      .distinct().materialize
    // 1. keyed drop
    val surv = g.join(broadcast(delN), Seq("node"), "left_anti")
      .join(broadcast(delB), Seq("nbr"), "left_anti").materialize
    release(g)
    // touched = survivors that lost a neighbor in either direction
    val touched = sym.join(broadcast(delB), Seq("nbr"), "left_semi")
      .join(broadcast(delN), Seq("node"), "left_anti")
      .select(col("node")).distinct().materialize
    // 2. re-fill: surviving adjacency ∪ route-around (nbrs of dropped nbrs)
    val symSurvT = surv.select(col("node"), col("nbr"))
      .unionAll(surv.select(col("nbr").as("node"), col("node").as("nbr")))
      .distinct()
      .join(touched, Seq("node"), "left_semi")
    val route = sym.join(broadcast(delB), Seq("nbr"), "left_semi")
      .join(touched, Seq("node"), "left_semi").as("a")
      .join(sym.as("b"), col("a.nbr") === col("b.node"))
      .select(col("a.node").as("node"), col("b.nbr").as("nbr"))
      .join(broadcast(delB), Seq("nbr"), "left_anti")
      .filter(col("node") =!= col("nbr"))
      .distinct()
    val candT = symSurvT.unionAll(route).distinct()
    val gT = topKScored(candT, embSurv, kNbrs)
    val gM = surv.join(touched, Seq("node"), "left_anti").unionByName(gT).materialize
    release(sym); release(surv); release(touched)
    gM
  }

  /** The maintained graph after FOUR alternating upsert/delete cycles —
    * the sustained-maintenance quality probe (cycle2 proves the
    * persistence boundary lossless; THIS measures whether index QUALITY
    * survives repeated touched-scoped repair, the family's known failure
    * mode). Batch plan over vec_id %40: base corpus excludes classes
    * {0, 20}; cycle 1 upserts 0s, cycle 2 deletes 5s, cycle 3 upserts
    * 20s, cycle 4 deletes 25s — final corpus = all but {5, 25}. Returns
    * (maintained graph, final corpus); Bench records recall@3 of beam
    * search over it vs exact kNN, next to the from-scratch rebuild's
    * recall on the same final corpus (`ann_graph_cycleN@3` /
    * `ann_graph_rebuildN@3`). */
  def maintainedGraphCycleN(embeddings: DataFrame, kNbrs: Int = 16,
                            rounds: Int = 4, cap: Int = 64)
      : (DataFrame, DataFrame) = {
    def c40(r: Long) = pmod(col("vec_id"), lit(40L)) === r
    val base = embeddings.filter(!c40(0L) && !c40(20L))
    val corpus1 = embeddings.filter(!c40(20L))
    val corpus3 = embeddings.filter(!c40(5L))
    val g0 = knnGraph(base, kNbrs, rounds = rounds, cap = cap)
    val g1 = upsertedGraph(g0, corpus1, kNbrs, cap = cap, arrPred = c40(0L))
    val g2 = deletedGraph(g1, corpus1, kNbrs, delPred = c40(5L))
    val g3 = upsertedGraph(g2, corpus3, kNbrs, cap = cap, arrPred = c40(20L))
    val g4 = deletedGraph(g3, corpus3, kNbrs, delPred = c40(25L))
    (g4, embeddings.filter(!c40(5L) && !c40(25L)))
  }

  /** Graph-ANN STALENESS monitor — the retrain trigger that completes the
    * index family's maintenance matrix (the IVF analog is occupancy
    * drift, the PQ analog residual drift; a k-NN graph's failure mode is
    * STALE ADJACENCY: stored neighbor lists that the arrival stream has
    * quietly out-ranked). Per standing node, count the arrivals whose
    * EXACT cosine beats the node's worst stored edge (the displacement
    * threshold); aggregate per node-bucket (pmod(node, nBuckets)) into
    * (n_nodes, n_stale, n_beat) with a retrain verdict where ≥
    * `threshPct`% of a bucket's nodes are stale — decided by integer
    * cross-multiplication, so every output value is an exact count or an
    * exact comparison of identically-derived doubles and the DuckDB
    * replay hash-matches. Scale shape: the standing graph comes from the
    * persisted store (no build in the serving call); the scoring pass is
    * one broadcast nested-loop join of the node-bucketed graph against
    * the BOUNDED arrival batch — O(N·Δ) narrow work (at 100 TB the
    * arrivals would pre-bucket by LSH before the join; the monitor's
    * threshold semantics are unchanged). */
  def annGraphDriftFrom(gBase: DataFrame, embeddings: DataFrame,
                        nBuckets: Int = 8, threshPct: Int = 20): DataFrame = {
    val base = embeddings.filter(!isArrVec)
    val worst = gBase.groupBy(col("node")).agg(min(col("cos")).as("wcos"))
    val nodesEmb = worst.join(
      base.select(col("vec_id").as("node"), col("embedding").as("nv")), "node")
    val arr = embeddings.filter(isArrVec)
      .select(col("vec_id").as("aid"), col("embedding").as("av"))
    val perNode = nodesEmb.join(broadcast(arr), col("aid") =!= col("node"))
      .withColumn("beats",
        (VectorOps.cosine(col("nv"), col("av")) > col("wcos")).cast("long"))
      .groupBy(col("node")).agg(sum(col("beats")).as("nb"))
    perNode
      .groupBy(pmod(col("node"), lit(nBuckets.toLong)).as("bucket"))
      .agg(count(lit(1)).as("n_nodes"),
        sum((col("nb") > 0L).cast("long")).as("n_stale"),
        sum(col("nb")).as("n_beat"))
      .withColumn("retrain",
        col("n_stale") * 100L >= col("n_nodes") * threshPct.toLong)
  }

  /** Gate-coverage form of [[annGraphDriftFrom]]: builds the standing
    * base graph in-call so the oracle's replay covers the whole
    * derivation (the registered key uses the persisted store via
    * Stores.annGraphDriftStore — same values by the ann_graph_store
    * identity). */
  def annGraphDrift(embeddings: DataFrame, nBuckets: Int = 8,
                    threshPct: Int = 20, kNbrs: Int = 16, rounds: Int = 4,
                    cap: Int = 64): DataFrame =
    annGraphDriftFrom(knnGraph(embeddings.filter(!isArrVec), kNbrs,
      rounds = rounds, cap = cap), embeddings, nBuckets, threshPct)

  /** Oracle for the graph staleness monitor: the base-slice build chain
    * replayed in full, per-node worst stored edge, the arrival
    * cross-score, and the bucket aggregation with the integer verdict. */
  def annGraphDriftSql(nBuckets: Int = 8, threshPct: Int = 20,
                       kNbrs: Int = 16, tables: Int = 4, nPlanes: Int = 6,
                       ringSpan: Int = 4, rounds: Int = 4,
                       cap: Int = 64): String =
    s"""WITH bcorp AS MATERIALIZED (
       |  SELECT * FROM embeddings WHERE vec_id % 10 <> 0),
       |${buildChainFragSql("bcorp", "b", kNbrs, tables, nPlanes, ringSpan, rounds, cap)},
       |worst AS (SELECT node, MIN(cos) AS wcos FROM bg_$rounds GROUP BY node),
       |arr AS (
       |  SELECT vec_id AS aid, embedding AS av FROM embeddings
       |  WHERE vec_id % 10 = 0),
       |pern AS (
       |  SELECT w.node,
       |    CAST(SUM(CASE WHEN ${VectorOps.cosineSql("en.embedding", "a.av")} > w.wcos
       |      THEN 1 ELSE 0 END) AS BIGINT) AS nb
       |  FROM worst w
       |  JOIN bcorp en ON en.vec_id = w.node
       |  JOIN arr a ON a.aid <> w.node
       |  GROUP BY w.node)
       |SELECT node % $nBuckets AS bucket, COUNT(*) AS n_nodes,
       |  CAST(SUM(CASE WHEN nb > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_stale,
       |  CAST(SUM(nb) AS BIGINT) AS n_beat,
       |  CAST(SUM(CASE WHEN nb > 0 THEN 1 ELSE 0 END) AS BIGINT) * 100
       |    >= COUNT(*) * $threshPct AS retrain
       |FROM pern GROUP BY 1""".stripMargin

  // ---- SQL fragments shared by the maintenance oracles --------------------

  /** Build-chain CTE text (no WITH) over corpus relation `$corp`,
    * CTE names prefixed by `pfx`: ${pfx}bk, ${pfx}mem, ${pfx}sp,
    * ${pfx}g_0..${pfx}g_$rounds. kBuild fixed at kNbrs (the maintenance
    * rungs run the default build). */
  /** Seed-fragment CTE text (no WITH): ${pfx}bk, ${pfx}mem, ${pfx}sp —
    * the LSH id-ring seed pairs over `corp`, shared by the build chain
    * and the upsert oracle's arrival-ring seeding. */
  private def seedFragSql(corp: String, pfx: String, tables: Int,
                          nPlanes: Int, ringSpan: Int): String = {
    val buckets = (0 until tables).map { t =>
      s"SELECT CAST($t AS BIGINT) AS t, ${Dedup.lshBucketSql("embedding", nPlanes, seed = t * 7)} AS bucket, vec_id FROM $corp"
    }.mkString("\nUNION ALL\n")
    val rings = (1 to ringSpan).map { c =>
      s"""SELECT a.vec_id AS node, b.vec_id AS nbr
         |  FROM ${pfx}mem a JOIN ${pfx}mem b
         |  ON a.t = b.t AND a.bucket = b.bucket AND b.pos = (a.pos + $c) % a.sz""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""${pfx}bk AS MATERIALIZED (
       |$buckets),
       |${pfx}mem AS MATERIALIZED (
       |  SELECT t, bucket, vec_id,
       |    ROW_NUMBER() OVER (PARTITION BY t, bucket ORDER BY vec_id) - 1 AS pos,
       |    COUNT(*) OVER (PARTITION BY t, bucket) AS sz
       |  FROM ${pfx}bk),
       |${pfx}sp AS MATERIALIZED (
       |  SELECT DISTINCT node, nbr FROM (
       |$rings)
       |  WHERE node <> nbr)""".stripMargin
  }

  private def buildChainFragSql(corp: String, pfx: String, kNbrs: Int,
                                tables: Int, nPlanes: Int, ringSpan: Int,
                                rounds: Int, cap: Int): String = {
    val descent = (1 to rounds).map { r =>
      val prev = s"${pfx}g_${r - 1}"
      s"""${pfx}sym_$r AS MATERIALIZED (
         |  SELECT DISTINCT node, nbr FROM (
         |    SELECT node, nbr FROM $prev UNION ALL SELECT nbr, node FROM $prev)),
         |${pfx}nn_$r AS (
         |  SELECT DISTINCT a.node, b.nbr
         |  FROM ${pfx}sym_$r a JOIN ${pfx}sym_$r b ON a.nbr = b.node
         |  WHERE a.node <> b.nbr),
         |${pfx}cap_$r AS (
         |  SELECT node, nbr FROM (
         |    SELECT node, nbr,
         |      ROW_NUMBER() OVER (PARTITION BY node
         |        ORDER BY ${pairHashSql("node", "nbr")}, nbr) AS rn
         |    FROM ${pfx}nn_$r)
         |  WHERE rn <= $cap),
         |${pfx}cand_$r AS (
         |  SELECT DISTINCT node, nbr FROM (
         |    SELECT node, nbr FROM ${pfx}sym_$r
         |    UNION ALL SELECT node, nbr FROM ${pfx}cap_$r)),
         |${topKStepFragSql(s"${pfx}cand_$r", s"${pfx}g_$r", kNbrs, corp)}""".stripMargin
    }.mkString(",\n")
    s"""${seedFragSql(corp, pfx, tables, nPlanes, ringSpan)},
       |${topKStepFragSql(s"${pfx}sp", s"${pfx}g_0", kNbrs, corp)},
       |$descent""".stripMargin
  }

  /** Exact-cosine top-k per node over a candidate pair relation, vectors
    * from `embRel` — the topKScored contract (cos DESC, nbr ASC). */
  private def topKStepFragSql(pairsRel: String, out: String, kk: Int,
                              embRel: String): String = {
    def cos(a: String, b: String) = VectorOps.cosineSql(a, b)
    s"""$out AS MATERIALIZED (
       |  SELECT node, nbr, cos FROM (
       |    SELECT p.node, p.nbr, ${cos("en.embedding", "eb.embedding")} AS cos,
       |      ROW_NUMBER() OVER (PARTITION BY p.node
       |        ORDER BY ${cos("en.embedding", "eb.embedding")} DESC, p.nbr) AS rn
       |    FROM $pairsRel p
       |    JOIN $embRel en ON en.vec_id = p.node
       |    JOIN $embRel eb ON eb.vec_id = p.nbr)
       |  WHERE rn <= $kk)""".stripMargin
  }

  /** Beam-search CTE chain (no WITH) prefixed by `pfx`: ${pfx}ent,
    * ${pfx}beam_0..$searchRounds. `probeRel` provides (probe_id,
    * embedding); `embRel` the candidate vectors (a probe not present in
    * embRel contributes no self-entry — the inner scoring join drops it,
    * matching annGraphSearchFrom). */
  private def beamChainFragSql(pfx: String, gsymRel: String, probeRel: String,
                               embRel: String, entries: Int, beam: Int,
                               searchRounds: Int): String = {
    def cos(a: String, b: String) = VectorOps.cosineSql(a, b)
    def step(candRel: String, out: String): String =
      s"""$out AS MATERIALIZED (
         |  SELECT probe_id, node, cos FROM (
         |    SELECT c.probe_id, c.node, ${cos("en.embedding", "p.embedding")} AS cos,
         |      ROW_NUMBER() OVER (PARTITION BY c.probe_id
         |        ORDER BY ${cos("en.embedding", "p.embedding")} DESC, c.node) AS rn
         |    FROM $candRel c
         |    JOIN $embRel en ON en.vec_id = c.node
         |    JOIN $probeRel p ON p.probe_id = c.probe_id)
         |  WHERE rn <= $beam)""".stripMargin
    val search = (1 to searchRounds).map { r =>
      s"""${pfx}exp_$r AS (
         |  SELECT DISTINCT probe_id, node FROM (
         |    SELECT probe_id, node FROM ${pfx}beam_${r - 1}
         |    UNION ALL
         |    SELECT b.probe_id, s.nbr AS node
         |    FROM ${pfx}beam_${r - 1} b JOIN $gsymRel s ON s.node = b.node)),
         |${step(s"${pfx}exp_$r", s"${pfx}beam_$r")}""".stripMargin
    }.mkString(",\n")
    s"""${pfx}ent AS (
       |  SELECT DISTINCT probe_id, node FROM (
       |    SELECT p.probe_id, e.vec_id AS node
       |    FROM $probeRel p CROSS JOIN $embRel e WHERE e.vec_id < $entries
       |    UNION ALL
       |    SELECT probe_id, probe_id AS node FROM $probeRel)),
       |${step(s"${pfx}ent", s"${pfx}beam_0")},
       |$search""".stripMargin
  }

  /** Oracle for [[annGraphUpsert]]: replays the BASE build, each arrival's
    * beam-search seeding, the touched-scoped descent round, and the final
    * search over the maintained graph — the whole incremental pipeline,
    * hash-exact. */
  def annGraphUpsertSql(nProbes: Int = 10, k: Int = 3, kNbrs: Int = 16,
                        tables: Int = 4, nPlanes: Int = 6, ringSpan: Int = 4,
                        rounds: Int = 4, cap: Int = 64, entries: Int = 4,
                        beam: Int = 16, searchRounds: Int = 4): String =
    s"""WITH bcorp AS MATERIALIZED (SELECT * FROM embeddings WHERE vec_id % 10 <> 0),
       |arr AS MATERIALIZED (
       |  SELECT vec_id AS probe_id, embedding FROM embeddings WHERE vec_id % 10 = 0),
       |${buildChainFragSql("bcorp", "b", kNbrs, tables, nPlanes, ringSpan, rounds, cap)},
       |${upsertMaintFragSql("u", s"bg_$rounds", "arr", "bcorp", kNbrs, tables, nPlanes, ringSpan, cap, entries, beam, searchRounds)},
       |gmsym AS MATERIALIZED (
       |  SELECT DISTINCT node, nbr FROM (
       |    SELECT node, nbr FROM ugm UNION ALL SELECT nbr, node FROM ugm)),
       |qprobes AS (
       |  SELECT vec_id AS probe_id, embedding FROM embeddings WHERE vec_id < $nProbes),
       |${beamChainFragSql("q", "gmsym", "qprobes", "embeddings", entries, beam, searchRounds)}
       |SELECT probe_id, node AS neighbor_id,
       |  CAST(ROW_NUMBER() OVER (PARTITION BY probe_id ORDER BY cos DESC, node) AS BIGINT) AS rn,
       |  cos
       |FROM qbeam_$searchRounds
       |WHERE node <> probe_id
       |QUALIFY rn <= $k""".stripMargin

  /** Oracle for [[annGraphDelete]]: replays the FULL-corpus build, the
    * keyed drop, the touched adjacency re-fill (surviving adjacency ∪
    * route-around candidates), and the final search over survivors. */
  def annGraphDeleteSql(nProbes: Int = 10, k: Int = 3, kNbrs: Int = 16,
                        tables: Int = 4, nPlanes: Int = 6, ringSpan: Int = 4,
                        rounds: Int = 4, cap: Int = 64, entries: Int = 4,
                        beam: Int = 16, searchRounds: Int = 4): String =
    s"""WITH ${buildChainFragSql("embeddings", "f", kNbrs, tables, nPlanes, ringSpan, rounds, cap)},
       |del AS (SELECT vec_id FROM embeddings WHERE vec_id % 10 = 0),
       |scorp AS MATERIALIZED (SELECT * FROM embeddings WHERE vec_id % 10 <> 0),
       |fsym AS MATERIALIZED (
       |  SELECT DISTINCT node, nbr FROM (
       |    SELECT node, nbr FROM fg_$rounds UNION ALL SELECT nbr, node FROM fg_$rounds)),
       |surv AS MATERIALIZED (
       |  SELECT node, nbr, cos FROM fg_$rounds
       |  WHERE node NOT IN (SELECT vec_id FROM del)
       |    AND nbr NOT IN (SELECT vec_id FROM del)),
       |tch AS MATERIALIZED (
       |  SELECT DISTINCT node FROM fsym
       |  WHERE nbr IN (SELECT vec_id FROM del)
       |    AND node NOT IN (SELECT vec_id FROM del)),
       |ssymt AS (
       |  SELECT node, nbr FROM (
       |    SELECT DISTINCT node, nbr FROM (
       |      SELECT node, nbr FROM surv UNION ALL SELECT nbr, node FROM surv))
       |  WHERE node IN (SELECT node FROM tch)),
       |rt AS (
       |  SELECT DISTINCT a.node, b.nbr
       |  FROM fsym a JOIN fsym b ON a.nbr = b.node
       |  WHERE a.nbr IN (SELECT vec_id FROM del)
       |    AND a.node IN (SELECT node FROM tch)
       |    AND b.nbr NOT IN (SELECT vec_id FROM del)
       |    AND a.node <> b.nbr),
       |dcand AS (
       |  SELECT DISTINCT node, nbr FROM (
       |    SELECT node, nbr FROM ssymt UNION ALL SELECT node, nbr FROM rt)),
       |${topKStepFragSql("dcand", "dgt", kNbrs, "scorp")},
       |gm AS MATERIALIZED (
       |  SELECT node, nbr, cos FROM surv WHERE node NOT IN (SELECT node FROM tch)
       |  UNION ALL SELECT node, nbr, cos FROM dgt),
       |gmsym AS MATERIALIZED (
       |  SELECT DISTINCT node, nbr FROM (
       |    SELECT node, nbr FROM gm UNION ALL SELECT nbr, node FROM gm)),
       |qprobes AS (
       |  SELECT vec_id AS probe_id, embedding FROM scorp WHERE vec_id < $nProbes),
       |${beamChainFragSql("q", "gmsym", "qprobes", "scorp", entries, beam, searchRounds)}
       |SELECT probe_id, node AS neighbor_id,
       |  CAST(ROW_NUMBER() OVER (PARTITION BY probe_id ORDER BY cos DESC, node) AS BIGINT) AS rn,
       |  cos
       |FROM qbeam_$searchRounds
       |WHERE node <> probe_id
       |QUALIFY rn <= $k""".stripMargin

  /** One upsert-maintenance CTE block (no WITH), namespaced by `p`: from
    * standing graph `gIn` and arrival relation `arrRel` (probe_id,
    * embedding) over standing corpus `baseCorp`, emits the maintained
    * graph as `${p}gm` — the [[upsertedGraph]] replay (beam-seed,
    * arrival-ring, touched-scoped descent round) factored out of
    * [[annGraphUpsertSql]]'s inline text so the write-back cycle oracle
    * can chain TWO batches. Rescoring joins read the full `embeddings`
    * relation: candidate endpoints are always members of the post-batch
    * corpus, and the joins key on vec_id, so the wider relation is
    * value-identical (the same argument the Scala side uses). */
  private def upsertMaintFragSql(p: String, gIn: String, arrRel: String,
                                 baseCorp: String, kNbrs: Int, tables: Int,
                                 nPlanes: Int, ringSpan: Int, cap: Int,
                                 entries: Int, beam: Int,
                                 searchRounds: Int): String =
    s"""${p}gsym AS MATERIALIZED (
       |  SELECT DISTINCT node, nbr FROM (
       |    SELECT node, nbr FROM $gIn UNION ALL SELECT nbr, node FROM $gIn)),
       |${beamChainFragSql(p + "a", s"${p}gsym", arrRel, baseCorp, entries, beam, searchRounds)},
       |${p}enew AS MATERIALIZED (
       |  SELECT probe_id AS node, node AS nbr, cos FROM (
       |    SELECT probe_id, node, cos,
       |      ROW_NUMBER() OVER (PARTITION BY probe_id ORDER BY cos DESC, node) AS rn
       |    FROM ${p}abeam_$searchRounds WHERE node <> probe_id)
       |  WHERE rn <= $kNbrs),
       |${p}acorp AS (SELECT probe_id AS vec_id, embedding FROM $arrRel),
       |${seedFragSql(s"${p}acorp", p + "r", tables, nPlanes, ringSpan)},
       |${topKStepFragSql(s"${p}rsp", s"${p}earr", kNbrs, "embeddings")},
       |${p}g1 AS MATERIALIZED (
       |  SELECT node, nbr, cos FROM $gIn
       |  UNION ALL SELECT node, nbr, cos FROM ${p}enew
       |  UNION ALL SELECT node, nbr, cos FROM ${p}earr),
       |${p}tch AS MATERIALIZED (
       |  SELECT DISTINCT node FROM (
       |    SELECT node FROM ${p}enew UNION ALL SELECT nbr FROM ${p}enew
       |    UNION ALL SELECT node FROM ${p}earr UNION ALL SELECT nbr FROM ${p}earr)),
       |${p}usym AS MATERIALIZED (
       |  SELECT DISTINCT node, nbr FROM (
       |    SELECT node, nbr FROM ${p}g1 UNION ALL SELECT nbr, node FROM ${p}g1)),
       |${p}usymt AS (
       |  SELECT node, nbr FROM ${p}usym WHERE node IN (SELECT node FROM ${p}tch)),
       |${p}unn AS (
       |  SELECT DISTINCT a.node, b.nbr
       |  FROM ${p}usymt a JOIN ${p}usym b ON a.nbr = b.node
       |  WHERE a.node <> b.nbr),
       |${p}ucap AS (
       |  SELECT node, nbr FROM (
       |    SELECT node, nbr,
       |      ROW_NUMBER() OVER (PARTITION BY node
       |        ORDER BY ${pairHashSql("node", "nbr")}, nbr) AS rn
       |    FROM ${p}unn)
       |  WHERE rn <= $cap),
       |${p}ucand AS (
       |  SELECT DISTINCT node, nbr FROM (
       |    SELECT node, nbr FROM ${p}usymt UNION ALL SELECT node, nbr FROM ${p}ucap)),
       |${topKStepFragSql(s"${p}ucand", s"${p}ugt", kNbrs, "embeddings")},
       |${p}gm AS MATERIALIZED (
       |  SELECT node, nbr, cos FROM ${p}g1 WHERE node NOT IN (SELECT node FROM ${p}tch)
       |  UNION ALL SELECT node, nbr, cos FROM ${p}ugt)""".stripMargin

  /** Oracle for the two-cycle WRITE-BACK rung (Stores.annGraphCycle2Store):
    * replays the base build (vec_id %20 ∉ {0,10}), upsert cycle 1
    * (arrivals %20 == 0), upsert cycle 2 (arrivals %20 == 10) and the
    * final beam search over the twice-maintained graph — hash-equality
    * proves the maintained k-NN graph written back to the catalog between
    * batches and REREAD by cycle 2 composes to exactly the state two
    * in-memory maintenance passes imply. */
  def annGraphCycle2Sql(nProbes: Int = 10, k: Int = 3, kNbrs: Int = 16,
                        tables: Int = 4, nPlanes: Int = 6, ringSpan: Int = 4,
                        rounds: Int = 4, cap: Int = 64, entries: Int = 4,
                        beam: Int = 16, searchRounds: Int = 4): String =
    s"""WITH b20 AS MATERIALIZED (
       |  SELECT * FROM embeddings WHERE vec_id % 20 NOT IN (0, 10)),
       |c1corp AS MATERIALIZED (SELECT * FROM embeddings WHERE vec_id % 20 <> 10),
       |arr1 AS MATERIALIZED (
       |  SELECT vec_id AS probe_id, embedding FROM embeddings WHERE vec_id % 20 = 0),
       |arr2 AS MATERIALIZED (
       |  SELECT vec_id AS probe_id, embedding FROM embeddings WHERE vec_id % 20 = 10),
       |${buildChainFragSql("b20", "w", kNbrs, tables, nPlanes, ringSpan, rounds, cap)},
       |${upsertMaintFragSql("u1", s"wg_$rounds", "arr1", "b20", kNbrs, tables, nPlanes, ringSpan, cap, entries, beam, searchRounds)},
       |${upsertMaintFragSql("u2", "u1gm", "arr2", "c1corp", kNbrs, tables, nPlanes, ringSpan, cap, entries, beam, searchRounds)},
       |fsym AS MATERIALIZED (
       |  SELECT DISTINCT node, nbr FROM (
       |    SELECT node, nbr FROM u2gm UNION ALL SELECT nbr, node FROM u2gm)),
       |qprobes AS (
       |  SELECT vec_id AS probe_id, embedding FROM embeddings WHERE vec_id < $nProbes),
       |${beamChainFragSql("q", "fsym", "qprobes", "embeddings", entries, beam, searchRounds)}
       |SELECT probe_id, node AS neighbor_id,
       |  CAST(ROW_NUMBER() OVER (PARTITION BY probe_id ORDER BY cos DESC, node) AS BIGINT) AS rn,
       |  cos
       |FROM qbeam_$searchRounds
       |WHERE node <> probe_id
       |QUALIFY rn <= $k""".stripMargin

  /** DuckDB oracle replaying the WHOLE pipeline — seed buckets, ring
    * seeds, every NN-descent round (hash cap included), beam init and
    * every search round, final top-k — with the same tie-breaks
    * (cos DESC, id ASC; hash ASC, id ASC) the TopKAgg contract states. */
  def annGraphSearchSql(nProbes: Int = 10, k: Int = 3, kNbrs: Int = 16,
                        tables: Int = 4, nPlanes: Int = 6, ringSpan: Int = 4,
                        rounds: Int = 4, cap: Int = 64, entries: Int = 4,
                        beam: Int = 16, searchRounds: Int = 4,
                        kBuild: Int = 0): String = {
    val kb = math.max(kNbrs, kBuild)
    def cos(a: String, b: String) = VectorOps.cosineSql(a, b)
    val buckets = (0 until tables).map { t =>
      s"SELECT CAST($t AS BIGINT) AS t, ${Dedup.lshBucketSql("embedding", nPlanes, seed = t * 7)} AS bucket, vec_id FROM embeddings"
    }.mkString("\nUNION ALL\n")
    val rings = (1 to ringSpan).map { c =>
      s"""SELECT a.vec_id AS node, b.vec_id AS nbr
         |  FROM mem a JOIN mem b
         |  ON a.t = b.t AND a.bucket = b.bucket AND b.pos = (a.pos + $c) % a.sz""".stripMargin
    }.mkString("\nUNION ALL\n")
    def topKStep(pairsRel: String, out: String): String =
      s"""$out AS MATERIALIZED (
         |  SELECT node, nbr, cos FROM (
         |    SELECT p.node, p.nbr, ${cos("en.embedding", "eb.embedding")} AS cos,
         |      ROW_NUMBER() OVER (PARTITION BY p.node
         |        ORDER BY ${cos("en.embedding", "eb.embedding")} DESC, p.nbr) AS rn
         |    FROM $pairsRel p
         |    JOIN embeddings en ON en.vec_id = p.node
         |    JOIN embeddings eb ON eb.vec_id = p.nbr)
         |  WHERE rn <= $kb)""".stripMargin
    // the searched graph truncates to kNbrs (identity when kBuild unset —
    // the extra CTE is only injected for a widened build, keeping the
    // registered oracle's text unchanged)
    val gFinal =
      if (kb == kNbrs) s"g_$rounds"
      else s"""(SELECT node, nbr, cos FROM (
              |  SELECT node, nbr, cos,
              |    ROW_NUMBER() OVER (PARTITION BY node ORDER BY cos DESC, nbr) AS rn
              |  FROM g_$rounds)
              |WHERE rn <= $kNbrs)""".stripMargin
    val descent = (1 to rounds).map { r =>
      val prev = s"g_${r - 1}"
      s"""sym_$r AS MATERIALIZED (
         |  SELECT DISTINCT node, nbr FROM (
         |    SELECT node, nbr FROM $prev UNION ALL SELECT nbr, node FROM $prev)),
         |nn_$r AS (
         |  SELECT DISTINCT a.node, b.nbr
         |  FROM sym_$r a JOIN sym_$r b ON a.nbr = b.node
         |  WHERE a.node <> b.nbr),
         |cap_$r AS (
         |  SELECT node, nbr FROM (
         |    SELECT node, nbr,
         |      ROW_NUMBER() OVER (PARTITION BY node
         |        ORDER BY ${pairHashSql("node", "nbr")}, nbr) AS rn
         |    FROM nn_$r)
         |  WHERE rn <= $cap),
         |cand_$r AS (
         |  SELECT DISTINCT node, nbr FROM (
         |    SELECT node, nbr FROM sym_$r
         |    UNION ALL SELECT node, nbr FROM cap_$r)),
         |${topKStep(s"cand_$r", s"g_$r")}""".stripMargin
    }.mkString(",\n")
    def beamStep(candRel: String, out: String, b: Int): String =
      s"""$out AS MATERIALIZED (
         |  SELECT probe_id, node, cos FROM (
         |    SELECT c.probe_id, c.node, ${cos("en.embedding", "p.embedding")} AS cos,
         |      ROW_NUMBER() OVER (PARTITION BY c.probe_id
         |        ORDER BY ${cos("en.embedding", "p.embedding")} DESC, c.node) AS rn
         |    FROM $candRel c
         |    JOIN embeddings en ON en.vec_id = c.node
         |    JOIN embeddings p ON p.vec_id = c.probe_id)
         |  WHERE rn <= $b)""".stripMargin
    val search = (1 to searchRounds).map { r =>
      s"""exp_$r AS (
         |  SELECT DISTINCT probe_id, node FROM (
         |    SELECT probe_id, node FROM beam_${r - 1}
         |    UNION ALL
         |    SELECT b.probe_id, s.nbr AS node
         |    FROM beam_${r - 1} b JOIN gsym s ON s.node = b.node)),
         |${beamStep(s"exp_$r", s"beam_$r", beam)}""".stripMargin
    }.mkString(",\n")
    s"""WITH bk AS MATERIALIZED (
       |$buckets),
       |mem AS MATERIALIZED (
       |  SELECT t, bucket, vec_id,
       |    ROW_NUMBER() OVER (PARTITION BY t, bucket ORDER BY vec_id) - 1 AS pos,
       |    COUNT(*) OVER (PARTITION BY t, bucket) AS sz
       |  FROM bk),
       |sp AS MATERIALIZED (
       |  SELECT DISTINCT node, nbr FROM (
       |$rings)
       |  WHERE node <> nbr),
       |${topKStep("sp", "g_0")},
       |$descent,
       |gsym AS MATERIALIZED (
       |  SELECT DISTINCT node, nbr FROM (
       |    SELECT node, nbr FROM $gFinal UNION ALL SELECT nbr, node FROM $gFinal)),
       |ent_0 AS (
       |  SELECT DISTINCT probe_id, node FROM (
       |    SELECT p.vec_id AS probe_id, e.vec_id AS node
       |    FROM embeddings p CROSS JOIN embeddings e
       |    WHERE p.vec_id < $nProbes AND e.vec_id < $entries
       |    UNION ALL
       |    SELECT vec_id AS probe_id, vec_id AS node FROM embeddings
       |    WHERE vec_id < $nProbes)),
       |${beamStep("ent_0", "beam_0", beam)},
       |$search
       |SELECT probe_id, node AS neighbor_id,
       |  CAST(ROW_NUMBER() OVER (PARTITION BY probe_id ORDER BY cos DESC, node) AS BIGINT) AS rn,
       |  cos
       |FROM beam_$searchRounds
       |WHERE node <> probe_id
       |QUALIFY rn <= $k""".stripMargin
  }
}
