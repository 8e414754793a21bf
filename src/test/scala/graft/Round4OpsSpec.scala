package graft

import graft.operators.{Bpe, Cluster, CodeEdges, Compaction, Containment, Corpus, CountMin, Dedup, GraphOps, Memory, MinhashPortable, Relational, Search, Skew, TermStats, TextAnalysis, UrlOps}

/** Semantic pins for the round-4 batch (containment dedup, count-min
  * sketch, comment combining) — each is also hash-oracle-green via
  * SparkEntry; these fix behavior on planted inputs where the right answer
  * is known by construction. */
class Round4OpsSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: Seq[(Long, String)]) =
    rows.map { case (id, t) => (id, t, "en", "s", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")

  test("containment: small doc embedded in big doc is found; Jaccard would miss it") {
    val small = (1 to 12).map(i => s"tok$i").mkString(" ")
    val big = ("preamble words here " + small + " " +
      (100 to 160).map(i => s"filler$i").mkString(" "))
    val d = docs(Seq((1L, small), (2L, big),
      (3L, (200 to 260).map(i => s"other$i").mkString(" "))))
    val out = Containment.containmentPairs(d, threshold = 0.8)
      .select("doc_a", "doc_b", "cont_a", "cont_b")
      .as[(Long, Long, Double, Double)].collect()
    assert(out.length == 1)
    val (a, b, ca, _) = out.head
    assert(a == 1L && b == 2L)
    assert(ca == 1.0) // every shingle of the small doc appears in the big one
    // the Jaccard of this pair is far below any near-dup threshold
    val j = graft.operators.Dedup.ngramJaccard(d, threshold = 0.0).collect()
    assert(j.forall(r => r.getDouble(2) < 0.5))
  }

  test("containment: df cap drops boilerplate shingles from the index") {
    // one shingle shared by ALL docs (df above cap) must not create pairs
    val boiler = "common header line"
    val d = docs((1L to 6L).map(i =>
      (i, s"$boiler unique$i distinct$i special$i words$i")))
    val out = Containment.containmentPairs(d, threshold = 0.5, maxDf = 3)
    assert(out.count() == 0)
  }

  test("cmsFreq: estimates always dominate the exact count (CMS guarantee)") {
    val d = docs((1L to 50L).map(i =>
      (i, s"alpha alpha beta w$i x${i % 7} y${i % 3} z${i % 11}")))
    val rows = CountMin.cmsFreq(d, d = 4, width = 64, probes = 10)
      .select("term", "tf", "cms_est").as[(String, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (t, tf, est) => assert(est >= tf, s"term $t: est $est < tf $tf") }
    // the heaviest term is present with its exact count
    val alpha = rows.find(_._1 == "alpha").get
    assert(alpha._2 == 100L)
  }

  test("cmsFreq: wide sketch with few terms is exact") {
    val d = docs(Seq((1L, "a a a b b c")))
    val rows = CountMin.cmsFreq(d, d = 4, width = 4096, probes = 3)
      .select("term", "tf", "cms_est").as[(String, Long, Long)].collect()
    // 3 distinct terms in 4096 cells: collisions vanish, est == tf
    assert(rows.toSet == Set(("a", 3L, 3L), ("b", 2L, 2L), ("c", 1L, 1L)))
  }

  test("memCombine: keeps top 3 per (source, kind) by evidence, doc_id tie-break") {
    // five docs all classified 'experience' (>=2 "slow"), increasing evidence
    val d = (1L to 5L).map(i => (i, ("slow " * (i.toInt + 1)).trim, "en", "p1", 10L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = Memory.combine(d, perType = 3)
      .select("doc_id", "rank").as[(Long, Long)].collect().sortBy(_._2)
    assert(out.map(_._1).toSeq == Seq(5L, 4L, 3L)) // highest evidence wins
  }

  test("closeness: planted path graph gives the exact integer harmonic sums") {
    // co-purchase path 10—20—30—40 (orders 0/100/200 pass the %100 gate)
    val li = Seq((0L, 10L), (0L, 20L), (100L, 20L), (100L, 30L), (200L, 30L), (200L, 40L))
      .toDF("l_orderkey", "l_partkey")
    val out = GraphOps.closeness(li, seedMod = 20L)
      .select("node", "n1", "n2", "n3", "harmonic6")
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    // seed 20: {10,30} at d1, {40} at d2 → 2·6+1·3 = 15
    // seed 40: {30} d1, {20} d2, {10} d3 → 6+3+2 = 11
    assert(out == Seq((20L, 2L, 1L, 0L, 15L), (40L, 1L, 1L, 1L, 11L)))
  }

  test("docOutliers: the off-prototype vector ranks first in its cluster") {
    def v(xs: Float*): Array[Float] = xs.toArray
    // cluster 0 seeds at +x, cluster 1 at +y; vec 4 is the +x outlier
    val emb = Seq(
      (0L, v(1f, 0f, 0f)), (1L, v(0f, 1f, 0f)),
      (2L, v(0.9f, 0.1f, 0f)), (3L, v(0f, 0.9f, 0.1f)),
      (4L, v(0.5f, 0f, 0.8f))).toDF("vec_id", "embedding")
    val out = Cluster.docOutliers(emb, k = 2, iters = 0, perCluster = 1)
      .select("cluster", "vec_id").as[(Long, Long)].collect().toMap
    assert(out(0L) == 4L) // least prototypical of the +x cell
  }

  test("urlHostStats: planted cdn hosts are blocked, content hosts are not") {
    val d = docs((1L to 20L).map(i => (i, s"body$i words")))
    val rows = UrlOps.urlHostStats(d)
      .select("host", "n_urls", "blocked").as[(String, Long, Boolean)].collect()
    val (blocked, kept) = rows.partition(_._3)
    assert(blocked.nonEmpty && blocked.forall(_._1.startsWith("cdn")))
    assert(kept.nonEmpty && kept.forall(_._1.endsWith("example.com")))
    assert(rows.map(_._2).sum == 40L) // two urls per doc
  }

  test("compactionPlan: next-fit fills bins size-desc, oversized file gets its own") {
    val d = Seq(
      (1L, "s", 3000L), (2L, "s", 2500L), (3L, "s", 1200L),
      (4L, "s", 900L), (5L, "s", 5000L))
      .map { case (id, src, n) => (id, "x", "en", src, n) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = Compaction.compactionPlan(d, capacity = 4000L)
      .select("doc_id", "bin").as[(Long, Long)].collect().toMap
    // order: 5(5000) 1(3000) 2(2500) 3(1200) 4(900)
    // 5000 → bin0 (oversized); 3000 → bin1; 2500 → bin2 (3000+2500>4000);
    // 1200 → bin2 (3700); 900 → bin3 (4600>4000)
    assert(out == Map(5L -> 0L, 1L -> 1L, 2L -> 2L, 3L -> 2L, 4L -> 3L))
    // every bin except possibly singletons stays under capacity when it has >1 file
    val sizes = Map(1L -> 3000L, 2L -> 2500L, 3L -> 1200L, 4L -> 900L, 5L -> 5000L)
    out.groupBy(_._2).foreach { case (_, fs) =>
      if (fs.size > 1) assert(fs.keys.map(sizes).sum <= 4000L)
    }
  }

  test("qualitySample: repetitive docs are downsampled, diverse docs kept") {
    val diverse = (1L to 40L).map(i =>
      (i, (1 to 20).map(j => s"u${i}w$j").mkString(" "), "en", "s", 100L))
    val repetitive = (101L to 140L).map(i =>
      (i, ("dup " * 20).trim, "en", "s", 100L))
    val d = (diverse ++ repetitive).toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = Corpus.qualitySample(d).select("doc_id", "bucket")
      .as[(Long, String)].collect()
    val kept = out.map(_._1).toSet
    assert((1L to 40L).forall(kept)) // high bucket keeps 100%
    val lowKept = (101L to 140L).count(kept)
    assert(lowKept < 15) // low bucket ~10%
    assert(out.filter(_._1 <= 40L).forall(_._2 == "high"))
    assert(out.filter(_._1 > 100L).forall(_._2 == "low"))
  }

  test("joinSkewStats: the planted hot key tops the list with the right share") {
    val rows = ((1 to 90).map(_ => 7L) ++ (1 to 10).map(i => i.toLong + 100L))
      .toDF("l_suppkey")
    val out = Skew.joinSkewStats(rows, "l_suppkey", topN = 3)
      .select("key", "cnt", "share", "skew_x")
      .as[(Long, Long, Double, Double)].collect()
    assert(out.head._1 == 7L && out.head._2 == 90L)
    assert(out.head._3 == 0.9)
    assert(out.head._4 == 0.9 * 11) // 11 distinct keys
  }

  test("ivfUpsert: drifting delta inflow flags only the hot cell for retrain") {
    def v(xs: Float*): Array[Float] = xs.toArray
    // cells from vec_id<2: 0=+x (itself delta: 0%10==0), 1=+y
    val emb = Seq(
      (0L, v(1f, 0f, 0f)), (1L, v(0f, 1f, 0f)),
      (2L, v(0.9f, 0.1f, 0f)), (3L, v(0.95f, 0f, 0.05f)), (4L, v(0.8f, 0.2f, 0f)),
      (5L, v(0.1f, 0.9f, 0f)),
      (10L, v(0f, 0.95f, 0.05f)), (20L, v(0.05f, 0.9f, 0f)))
      .toDF("vec_id", "embedding")
    val out = Dedup.ivfUpsert(emb, nCells = 2, retrainPct = 50)
      .select("cell", "n_base", "n_delta", "retrain")
      .as[(Long, Long, Long, Boolean)].collect().sortBy(_._1).toSeq
    // cell 0: base {2,3,4}, delta {0} → growth 1/3, no retrain
    // cell 1: base {1,5}, delta {10,20} → growth 1.0, retrain
    assert(out == Seq((0L, 3L, 1L, false), (1L, 2L, 2L, true)))
  }

  test("fertility: zero merges gives chars-per-word; merges only shrink it") {
    val d = docs(Seq((1L, "aa bb aa bb cc"), (2L, "aa aa aa")))
    val f0 = Bpe.fertility(d, nMerges = 0)
      .select("n_words", "n_syms", "fertility").as[(Long, Long, Double)].collect().head
    assert(f0._1 == 8L && f0._2 == 16L && f0._3 == 2.0) // every word is 2 chars
    val f5 = Bpe.fertility(d, nMerges = 5)
      .select("fertility").as[Double].collect().head
    assert(f5 <= 2.0 && f5 >= 1.0) // merges can only reduce symbol counts
  }

  test("charDiversity: degenerate repetition scores 1.0, known mix is exact") {
    val d = docs(Seq((1L, "aaaa"), (2L, "aab"), (3L, "x")))
    val out = TextAnalysis.charDiversity(d)
      .select("doc_id", "simpson").as[(Long, Double)].collect().toMap
    assert(out(1L) == 1.0)
    assert(out(2L) == 2.0 / 6.0) // a:2→2, b:1→0; N(N−1)=6
    assert(!out.contains(3L)) // single-char docs have no pair probability
  }

  test("linkPredict: 2-hop neighbors on the planted path are predicted, edges are not") {
    val li = Seq((0L, 10L), (0L, 20L), (100L, 20L), (100L, 30L), (200L, 30L), (200L, 40L))
      .toDF("l_orderkey", "l_partkey")
    val out = GraphOps.linkPredict(li)
      .select("node_a", "node_b", "common_neighbors")
      .as[(Long, Long, Long)].collect().sortBy(t => (t._1, t._2)).toSeq
    // 10—20—30—40: (10,30) share 20, (20,40) share 30; adjacent pairs excluded
    assert(out == Seq((10L, 30L, 1L), (20L, 40L, 1L)))
  }

  test("degreeDistribution: planted star edge set yields the exact histogram") {
    val orders = Seq((1L, 1L)).toDF("o_orderkey", "o_custkey")
    val li = Seq((1L, 1L, 1L)).toDF("l_orderkey", "l_partkey", "l_suppkey")
    val out = GraphOps.degreeDistribution(orders, li)
      .select("degree", "n_nodes").as[(Long, Long)].collect().toMap
    // customer/part/supplier have degree 1; the order hub has degree 3
    assert(out == Map(1L -> 3L, 3L -> 1L))
  }

  test("pathMining: planted session yields its trigrams; short sessions yield none") {
    val ts = (i: Int) => new java.sql.Timestamp(1700000000000L + i * 1000L)
    val ev = Seq(
      (1L, ts(1), 1L, "view", 0.0, "{}"), (2L, ts(2), 1L, "click", 0.0, "{}"),
      (3L, ts(3), 1L, "purchase", 0.0, "{}"), (4L, ts(4), 1L, "view", 0.0, "{}"),
      (5L, ts(1), 2L, "view", 0.0, "{}"), (6L, ts(2), 2L, "click", 0.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = Relational.pathMining(ev)
      .select("path", "n").as[(String, Long)].collect().toMap
    // user 1's 4-event session has exactly 2 trigrams; user 2 (2 events) none
    assert(out == Map("view->click->purchase" -> 1L, "click->purchase->view" -> 1L))
  }

  test("eventDedup: replayed slice is collapsed and audited per type") {
    val ts = (i: Int) => new java.sql.Timestamp(1700000000000L + i * 1000L)
    val ev = Seq(
      (10L, ts(1), 1L, "click", 1.0, "{}"),   // 10%10==0 → replayed
      (11L, ts(2), 1L, "click", 2.0, "{}"),
      (12L, ts(3), 2L, "view", 3.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = Relational.eventDedup(ev)
      .select("event_type", "n_unique", "n_delivered", "n_dupes")
      .as[(String, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(out("click") == ("click", 2L, 3L, 1L)) // replay of id 10 collapsed
    assert(out("view") == ("view", 1L, 1L, 0L))
  }

  test("codeStats: counts lines/blanks/imports/defs and indentation exactly") {
    val files = Seq(("a/f.py", "python",
      "import os\n\ndef f():\n    return 1\nclass C(B):\n        pass"))
      .toDF("path", "language", "content")
    val r = CodeEdges.codeStats(files)
      .select("n_lines", "n_blank", "n_import_lines", "n_def_lines", "max_indent")
      .as[(Long, Long, Long, Long, Long)].collect().head
    assert(r == ((6L, 1L, 1L, 2L, 8L)))
  }

  test("minhashEval: identical docs get est == exact == 1.0, all errors in [0,1]") {
    val twin = (1 to 30).map(i => s"w$i").mkString(" ")
    val d = docs(Seq((1L, twin), (2L, twin),
      (3L, (100 to 130).map(i => s"v$i").mkString(" "))))
    val rows = MinhashPortable.minhashEval(d)
      .select("doc_a", "doc_b", "est_jaccard", "exact_jaccard", "abs_err")
      .as[(Long, Long, Double, Double, Double)].collect()
    val dup = rows.find(r => r._1 == 1L && r._2 == 2L).get
    assert(dup._3 == 1.0 && dup._4 == 1.0 && dup._5 == 0.0)
    rows.foreach(r => assert(r._5 >= 0.0 && r._5 <= 1.0))
  }

  test("bm25_upsert: additive maintenance == from-scratch, incl. a delta-only term") {
    import org.apache.spark.sql.functions.{count, lit, sum, col}
    val terms = Seq("alpha", "beta")
    // base: 1 (alpha ×2), 2 (no query terms), 3 (alpha); delta (%10==0):
    // 10 (beta only — the term ENTERS the index via the delta, the
    // full_outer df-merge path), 20 (both terms)
    val d = docs(Seq(
      (1L, "alpha x y alpha z"), (2L, "x y z w"), (3L, "alpha q r"),
      (10L, "beta beta n m"), (20L, "alpha beta k")))
    val inc = Search.bm25Upsert(d, terms).as[(Long, Double)].collect().toSeq
    // from-scratch reference: the full-corpus index scored with an EMPTY
    // arrival batch — additive maintenance must be exactly lossless
    val (post, dl) = Search.bm25IndexParts(d)
    val dfF = post.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val scF = dl.agg(count(lit(1)).as("n_docs"), sum(col("len")).as("sum_len"))
    val scratch = Search.bm25UpsertFrom(post, dl, dfF, scF,
      docs(Seq.empty[(Long, String)]), terms).as[(Long, Double)].collect().toSeq
    assert(inc == scratch, s"incremental != from-scratch: $inc vs $scratch")
    val ids = inc.map(_._1)
    assert(ids.contains(10L), "delta-only term never scored")
    assert(!ids.contains(2L), "a zero-tf doc leaked through the score>0 gate")
    assert(ids.toSet == Set(1L, 3L, 10L, 20L))
  }

  test("minhash_lsh_upsert: incremental == full-restricted, base-base pairs excluded") {
    val a = (1 to 30).map(i => s"a$i").mkString(" ")
    val b = (50 to 80).map(i => s"b$i").mkString(" ")
    val c = (200 to 230).map(i => s"c$i").mkString(" ")
    // 10 is delta (%10==0), 11 base → delta_base twin pair; 20/30 both
    // delta → delta_delta; 1/2 both base → indexed long ago, must NOT
    // re-emit
    val d = docs(Seq((10L, a), (11L, a), (20L, b), (30L, b), (1L, c), (2L, c)))
    val inc = MinhashPortable.minhashLshUpsert(d)
      .select("doc_a", "doc_b", "est_jaccard", "kind")
      .as[(Long, Long, Double, String)].collect().toSet
    // engine-internal identity: the incremental form must equal the full
    // recompute restricted to delta-touching pairs (the oracle proves the
    // same cross-engine)
    val full = MinhashPortable.minhashLshPortable(d)
      .as[(Long, Long, Double)].collect()
      .filter(p => p._1 % 10 == 0 || p._2 % 10 == 0)
      .map(p => (p._1, p._2, p._3,
        if (p._1 % 10 == 0 && p._2 % 10 == 0) "delta_delta" else "delta_base"))
      .toSet
    assert(inc == full, s"incremental != full-restricted: $inc vs $full")
    assert(inc.exists(p => p._1 == 10L && p._2 == 11L && p._4 == "delta_base"))
    assert(inc.exists(p => p._1 == 20L && p._2 == 30L && p._4 == "delta_delta"))
    assert(!inc.exists(p => p._1 % 10 != 0 && p._2 % 10 != 0),
      "a base-base pair leaked into the incremental output")
  }

  test("modularity: two planted 3-cliques give the exact integer Q contributions") {
    // order 0 → clique {10,20,30}; order 100 → clique {40,50,60}
    val li = Seq((0L, 10L), (0L, 20L), (0L, 30L), (100L, 40L), (100L, 50L), (100L, 60L))
      .toDF("l_orderkey", "l_partkey")
    val out = GraphOps.modularity(li)
      .select("community", "n_nodes", "e_in2", "deg_sum", "m2", "contrib")
      .as[(Long, Long, Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    // per clique: 6 directed intra edges, deg_sum 6, m2 = 12 →
    // contrib = 6·12 − 36 = 36; Q = (36+36)/12² = 0.5
    assert(out == Seq((10L, 3L, 6L, 6L, 12L, 36L), (40L, 3L, 6L, 6L, 12L, 36L)))
  }

  test("savings: a triple of identical docs reclaims two docs' chars") {
    val dup = (1 to 20).map(i => s"s$i").mkString(" ")
    val d = docs(Seq((1L, dup), (2L, dup), (3L, dup),
      (4L, (50 to 70).map(i => s"z$i").mkString(" "))))
    val out = Dedup.savings(d)
      .select("canonical_id", "n_members", "n_dropped", "chars_saved")
      .as[(Long, Long, Long, Long)].collect()
    assert(out.length == 1) // doc 4 never enters the pair graph
    assert(out.head == ((1L, 3L, 2L, 2L * dup.length)))
  }

  test("maxsimRetrieve: partial match wins via the bag MAX where pooling would dilute") {
    def v(xs: Float*): Array[Float] = xs.toArray
    // doc 7 = two orthogonal member vectors; probe 0 matches one of them
    // exactly → MaxSim ≈ 1.0 even though the doc's average points elsewhere
    val emb = Seq(
      (0L, v(1f, 0f, 0f), 99),               // probe
      (10L, v(1f, 0f, 0f), 7), (11L, v(0f, 1f, 0f), 7),
      (20L, v(0.5f, 0.5f, 0.7f), 8), (21L, v(0.4f, 0.6f, 0.7f), 8))
      .toDF("vec_id", "embedding", "label")
    val out = graft.operators.Search.maxsimRetrieve(emb, nProbes = 1, k = 2)
      .select("doc", "rn", "maxsim").as[(Long, Long, Double)].collect().sortBy(_._2)
    assert(out.head._1 == 7L && out.head._3 > 0.999)
    assert(out.length == 3 || out.forall(r => r._3 <= out.head._3))
  }

  test("chunkDedup: cross-doc repeated chunks flagged, within-doc overlap ignored") {
    val shared = "x" * 600 // spans >1 chunk at default size
    val d = docs(Seq((1L, shared), (2L, shared), (3L, "y" * 600)))
    val out = graft.operators.Chunking.chunkDedup(d)
      .select("doc_id", "n_dup_chunks", "index_verdict")
      .as[(Long, Long, String)].collect().map(r => r._1 -> r).toMap
    assert(out(1L)._2 > 0L && out(1L)._3 == "skip") // fully duplicated
    assert(out(2L)._2 > 0L && out(2L)._3 == "skip")
    assert(out(3L)._2 == 0L && out(3L)._3 == "index") // unique content
  }

  test("corpusOverlap: only sources sharing exact content pair up") {
    val d = Seq(
      (1L, "same body", "en", "srcA", 9L), (2L, "same body", "en", "srcB", 9L),
      (3L, "unique one", "en", "srcA", 10L), (4L, "unique two", "en", "srcC", 10L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = Corpus.corpusOverlap(d)
      .select("source_a", "source_b", "n_shared")
      .as[(String, String, Long)].collect().toSeq
    assert(out == Seq(("srcA", "srcB", 1L)))
  }

  test("corpusOverlap: shared passage inside DIFFERENT documents is caught at chunk granularity") {
    // Two long docs differ overall but embed an identical aligned span —
    // invisible to whole-doc hashing, visible to chunk hashing. Chunk
    // size 8, step 8 (overlap 0): chars 9..16 are identical in both.
    val d = Seq(
      (1L, "AAAAAAAASHAREDXXTAILONE1", "en", "srcA", 24L),
      (2L, "BBBBBBBBSHAREDXXTAILTWO2", "en", "srcB", 24L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = Corpus.corpusOverlap(d, chunkSize = 8, chunkOverlap = 0)
      .select("source_a", "source_b", "n_shared")
      .as[(String, String, Long)].collect().toSeq
    assert(out == Seq(("srcA", "srcB", 1L)))
  }

  test("embedDrift: a planted per-dim shift in the odd half is recovered exactly") {
    def v(xs: Float*): Array[Float] = xs.toArray
    // even half: (0, 0); odd half: (1, 0) → delta = (1.0, 0.0)
    val emb = Seq(
      (0L, v(0f, 0f)), (2L, v(0f, 0f)),
      (1L, v(1f, 0f)), (3L, v(1f, 0f))).toDF("vec_id", "embedding")
    val out = graft.operators.Embedding.embedDrift(emb)
      .select("dim", "delta").as[(Long, Double)].collect().toMap
    assert(out == Map(0L -> 1.0, 1L -> 0.0))
  }

  test("exportGraph: node/edge snapshot round-trips with rel partitioning") {
    val nodes = Seq((1L, "customer"), (2L, "order")).toDF("node", "label")
    val edges = Seq((1L, 2L, "PLACED"), (2L, 3L, "CONTAINS")).toDF("src", "dst", "rel")
    val dir = java.nio.file.Files.createTempDirectory("graftexport").toString
    graft.sources.Writers.exportGraph(nodes, edges, dir)
    val n2 = spark.read.parquet(s"$dir/nodes")
    val e2 = spark.read.parquet(s"$dir/edges")
    assert(n2.count() == 2 && e2.count() == 2)
    assert(e2.select("rel").distinct().count() == 2) // partition column survives
    assert(new java.io.File(s"$dir/edges/rel=PLACED").exists)
  }

  test("eventsWow: week-over-week ratio on a planted two-week stream") {
    val week = 604800000000L / 1000L // micros → millis for Timestamp
    val ev = ((1 to 4).map(i => (i.toLong, new java.sql.Timestamp(week * 3000 + i), 1L, "click", 0.0, "{}")) ++
      (5 to 10).map(i => (i.toLong, new java.sql.Timestamp(week * 3001 + i), 1L, "click", 0.0, "{}")))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = Relational.eventsWow(ev)
      .select("n", "prev_n", "wow").as[(Long, Long, Double)].collect()
    assert(out.length == 1)
    assert(out.head == ((6L, 4L, 1.5)))
  }

  test("markdownOutline: parent links follow the most recent smaller level") {
    val md = Seq(("a.md",
      "intro\n# One\nbody\n## Two\n## Three\n### Four\n# Five\n### Six"))
      .toDF("path", "text")
    val out = graft.sources.Loaders.markdownOutline(md)
      .select("idx", "level", "title", "parent_idx")
      .as[(Long, Long, String, Option[Long])].collect().sortBy(_._1).toSeq
    assert(out == Seq(
      (1L, 1L, "One", None), (2L, 2L, "Two", Some(1L)), (3L, 2L, "Three", Some(1L)),
      (4L, 3L, "Four", Some(3L)), (5L, 1L, "Five", None),
      // Six's most recent smaller-level heading is ## Three (idx 3) by the
      // last-seen rule — h1 'Five' (idx 5) is even more recent and wins
      (6L, 3L, "Six", Some(5L))))
  }

  test("tableProfile: exact per-column stats on a planted fact table") {
    val li = Seq((1L, 10L, 100L), (1L, 20L, 100L), (2L, 10L, 200L))
      .toDF("l_orderkey", "l_partkey", "l_suppkey")
    val out = Relational.tableProfile(li)
      .select("column_name", "n_rows", "n_distinct", "min_v", "max_v")
      .as[(String, Long, Long, Long, Long)].collect().toSet
    assert(out == Set(
      ("l_orderkey", 3L, 2L, 1L, 2L),
      ("l_partkey", 3L, 2L, 10L, 20L),
      ("l_suppkey", 3L, 2L, 100L, 200L)))
  }

  test("winnowMatches: docs sharing a long token run pair up; unrelated doc doesn't") {
    val shared = (1 to 12).map(i => s"run$i").mkString(" ")
    val d = docs(Seq(
      (1L, s"prefix words here $shared tail one"),
      (2L, s"$shared other ending material two"),
      (3L, "totally different content with no overlap at all here")))
    val out = graft.operators.Winnow.winnowMatches(d)
      .select("doc_a", "doc_b", "n_shared").as[(Long, Long, Long)].collect()
    assert(out.length == 1)
    assert(out.head._1 == 1L && out.head._2 == 2L && out.head._3 >= 2L)
  }

  test("termDrift: a term that floods the new half tops the movers") {
    // 'surge' appears in both halves but 3x denser in the new (odd) half;
    // one-sided terms ('calm') are excluded by the c_old>0 && c_new>0 guard
    val d = docs((1L to 40L).map { i =>
      val body = if (i % 2 == 1) "stable surge surge surge" else "stable calm surge"
      (i, s"$body filler$i")
    })
    val out = TermStats.termDrift(d, minCount = 10, topN = 5)
      .select("term", "drift_x").as[(String, Double)].collect()
    assert(out.head._1 == "surge" && out.head._2 > 2.0)
    assert(!out.map(_._1).contains("calm")) // one-sided → filtered
  }

  test("searchSnippets: window centers on the first query-term token") {
    val d = docs(Seq(
      (1L, "a b c d e f g filter h i j k l m n"),
      (2L, "no match tokens at all in this one")))
    val out = Search.searchSnippets(d, Seq("filter"), width = 2)
      .select("doc_id", "snippet").as[(Long, String)].collect().toMap
    assert(out(1L) == "f g filter h i") // tokens 6..10 around position 8
    assert(!out.contains(2L)) // zero keyword score → not a hit
  }

  test("invertedIndex: exact postings with occurrence counts and first positions") {
    val d = docs(Seq((1L, "alpha beta alpha"), (2L, "beta gamma")))
    val out = Search.invertedIndex(d, vocabSize = 10)
      .select("term", "doc_id", "n_occ", "first_pos")
      .as[(String, Long, Long, Long)].collect().toSet
    assert(out == Set(
      ("alpha", 1L, 2L, 0L), ("beta", 1L, 1L, 1L),
      ("beta", 2L, 1L, 0L), ("gamma", 2L, 1L, 1L)))
  }

  test("prfExpand: terms co-occurring in feedback docs surface, query terms don't") {
    val d = docs(Seq(
      (1L, "filter join window vectorized pipeline"),
      (2L, "filter join vectorized shuffle"),
      (3L, "unrelated text entirely different")))
    val out = Search.prfExpand(d, Seq("filter", "join"), fbDocs = 2, expansions = 5)
      .select("term", "c").as[(String, Long)].collect()
    val terms = out.map(_._1).toSet
    assert(terms.contains("vectorized")) // co-occurs in both feedback docs
    assert(!terms.contains("filter") && !terms.contains("join"))
    assert(!terms.contains("unrelated")) // doc 3 never enters the feedback set
    assert(out.find(_._1 == "vectorized").get._2 == 2L)
  }

  test("mmrRerank: the near-duplicate of the first pick is displaced by a diverse hit") {
    def v(xs: Float*): Array[Float] = xs.toArray
    val emb = Seq(
      (0L, v(1f, 0f, 0f)),                     // query
      (1L, v(0.9f, 0.43589f, 0f)),             // A1
      (2L, v(0.9f, 0.43589f, 0f)),             // A2 = exact dup of A1
      (3L, v(0.9f, -0.43589f, 0f)))            // B: same relevance, diverse
      .toDF("vec_id", "embedding")
    val out = Search.mmrRerank(emb, queryVecId = 0L, nCand = 3, k = 2)
      .select("rank", "vec_id").as[(Long, Long)].collect().sortBy(_._1)
    val picked = out.map(_._2).toSet
    // MMR must NOT pick both duplicates; the diverse candidate displaces one
    assert(picked.contains(3L))
    assert(!(picked.contains(1L) && picked.contains(2L)))
  }

  test("mmrRerank: the driver-side pool is capped (nCand > 1024 refused)") {
    val emb = Seq((0L, Array(1f, 0f))).toDF("vec_id", "embedding")
    val e = intercept[IllegalArgumentException] {
      Search.mmrRerank(emb, queryVecId = 0L, nCand = 2048, k = 5)
    }
    assert(e.getMessage.contains("nCand"))
  }

  test("pairFeatures: twin docs get maximal features; ranges hold for all pairs") {
    val twin = (1 to 30).map(i => s"w$i").mkString(" ")
    val d = docs(Seq((1L, twin), (2L, twin),
      (3L, (100 to 130).map(i => s"v$i").mkString(" "))))
    val rows = MinhashPortable.pairFeatures(d)
      .select("doc_a", "doc_b", "exact_jaccard", "containment", "len_ratio", "same_lang")
      .as[(Long, Long, Double, Double, Double, Boolean)].collect()
    val t = rows.find(r => r._1 == 1L && r._2 == 2L).get
    assert(t._3 == 1.0 && t._4 == 1.0 && t._5 == 1.0 && t._6)
    rows.foreach { r =>
      assert(r._3 >= 0.0 && r._3 <= 1.0 && r._4 >= r._3 && r._5 > 0.0 && r._5 <= 1.0)
    }
  }

  test("quantileHist: uniform values give edge estimates near the true quantiles") {
    val ts0 = new java.sql.Timestamp(1700000000000L)
    val ev = (1 to 100).map(i => (i.toLong, ts0, 1L, "t", i.toDouble, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val Array((n, p50, p95)) = Relational.quantileHist(ev)
      .select("n", "p50_est", "p95_est").as[(Long, Double, Double)].collect()
    assert(n == 100L)
    assert(p50 > 45.0 && p50 < 55.0)
    assert(p95 > 90.0 && p95 <= 100.0)
    assert(p50 < p95)
  }

  test("custQuartiles: 8 customers split into 4 quartiles of 2, ordered by balance") {
    val c = (1 to 8).map(i => (i.toLong, 1, i * 10.0))
      .toDF("c_custkey", "c_nationkey", "c_acctbal")
    val out = Relational.custQuartiles(c)
      .select("quartile", "n", "min_bal", "max_bal")
      .as[(Long, Long, Double, Double)].collect().sortBy(_._1).toSeq
    assert(out == Seq((1L, 2L, 10.0, 20.0), (2L, 2L, 30.0, 40.0),
      (3L, 2L, 50.0, 60.0), (4L, 2L, 70.0, 80.0)))
  }

  test("hilbertXY2D: consecutive curve values are always spatially adjacent") {
    // the property Morton lacks: walk an 8×8 grid in Hilbert order and
    // every step moves exactly one cell (Manhattan distance 1)
    val cells = for (x <- 0 until 8; y <- 0 until 8)
      yield (x, y, graft.sources.Writers.hilbertXY2D(x, y, bits = 3))
    assert(cells.map(_._3).toSet == (0L until 64L).toSet) // a bijection
    val walk = cells.sortBy(_._3)
    walk.sliding(2).foreach { case Seq((x1, y1, _), (x2, y2, _)) =>
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1)
    }
    // Morton (zorder) violates this: d=3→4 jumps from (1,1) to (2,0)
  }

  test("orderGroupingSets: emits only the requested slices plus the grand total") {
    val orders = Seq(
      (1L, "HIGH", "O", 10.0), (2L, "HIGH", "F", 20.0), (3L, "LOW", "O", 30.0))
      .toDF("o_orderkey", "o_orderpriority", "o_orderstatus", "o_totalprice")
    val out = Relational.orderGroupingSets(orders)
      .select("o_orderpriority", "o_orderstatus", "n", "total_price")
      .as[(Option[String], Option[String], Long, Double)].collect().toSet
    assert(out == Set(
      (Some("HIGH"), None, 2L, 30.0), (Some("LOW"), None, 1L, 30.0),
      (None, Some("O"), 2L, 40.0), (None, Some("F"), 1L, 20.0),
      (None, None, 3L, 60.0)))
  }
}
