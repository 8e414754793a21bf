package graft

import org.apache.spark.sql.functions._

import graft.operators.{Cluster, Corpus, Embedding, ScalarQuant, Search, Winnow}

/** Semantic pins for the sketch/split/fingerprint/pooling batch — each
  * operator is also hash-oracle-green via SparkEntry; these fix behavior on
  * inputs where the right answer is known by construction. */
class Round3CurationSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: Seq[(Long, String)]) =
    rows.map { case (id, t) => (id, t, "en", "s", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")

  test("splitHoldout: partitions the corpus, deterministic, ~80/10/10") {
    val d = docs((0L until 1000L).map(i => (i, "x")))
    val out = Corpus.splitHoldout(d).select("doc_id", "split").as[(Long, String)].collect()
    assert(out.length == 1000 && out.map(_._1).distinct.length == 1000)
    val frac = out.groupBy(_._2).view.mapValues(_.length / 1000.0).toMap
    assert(frac("train") > 0.7 && frac("train") < 0.9)
    assert(frac("val") > 0.04 && frac("val") < 0.17)
    assert(frac("test") > 0.04 && frac("test") < 0.17)
    val again = Corpus.splitHoldout(d).select("doc_id", "split").as[(Long, String)].collect()
    assert(out.sortBy(_._1).sameElements(again.sortBy(_._1)))
  }

  test("kmvDistinct: estimate lands near the exact cardinality") {
    val ev = (0 until 2000).map(i =>
      (i.toLong, new java.sql.Timestamp(1700000000000L + i), (i % 500).toLong, "a", 0.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val Array((nd, est)) = Corpus.kmvDistinct(ev)
      .select("n_distinct", "est_users").as[(Long, Double)].collect()
    assert(nd == 500L) // no hash collisions on this id range
    assert(est > 150.0 && est < 1500.0) // k=8 KMV: within ~3x of truth
  }

  test("kmvDistinct: below-k groups fall back to the exact count") {
    val ev = (0 until 20).map(i =>
      (i.toLong, new java.sql.Timestamp(1700000000000L + i), (i % 3).toLong, "b", 0.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val Array((nd, est)) = Corpus.kmvDistinct(ev)
      .select("n_distinct", "est_users").as[(Long, Double)].collect()
    assert(nd == 3L && est == 3.0)
  }

  test("winnow: a shared token run yields a shared fingerprint (MOSS guarantee)") {
    val shared = "alpha beta gamma delta epsilon zeta eta theta"
    val d = docs(Seq(
      (1L, s"unrelated prefix one two $shared trailing words here"),
      (2L, s"$shared completely different suffix material"),
      (3L, "nothing in common with the others at all whatsoever")))
    val fp = Winnow.winnowFingerprint(d)
      .select("doc_id", "fp_hash").as[(Long, Long)].collect()
    val byDoc = fp.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert((byDoc(1L) & byDoc(2L)).nonEmpty)   // shared run ≥ w+2 tokens
    assert((byDoc(1L) & byDoc(3L)).isEmpty)
    // winnowing density: far fewer fingerprints than shingles
    assert(byDoc(1L).size < 10)
  }

  test("embedPortable: unit norm, identical docs agree, distinct docs differ") {
    val d = docs(Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy dog"),
      (3L, "entirely different vocabulary in this document")))
    val rows = Embedding.embedPortable(d)
      .select("doc_id", "dim", "val").as[(Long, Long, Double)].collect()
    val byDoc = rows.groupBy(_._1).view.mapValues(_.map(r => r._2 -> r._3).toMap).toMap
    byDoc.values.foreach { v =>
      assert(math.abs(v.values.map(x => x * x).sum - 1.0) < 1e-9)
    }
    assert(byDoc(1L) == byDoc(2L))
    assert(byDoc(1L) != byDoc(3L))
  }

  test("ragRetrievePortable: self-retrieval — a doc-sized chunk finds its own vector") {
    val corpus = docs(Seq(
      (0L, "spark shuffles partition data across executors during wide transforms"),
      (1L, "broadcast joins replicate the small side to every task in the stage"),
      (2L, "cats prefer sleeping in cardboard boxes during rainy afternoons")))
    // index = portable embeddings of the corpus itself, keyed by doc_id
    val index = Embedding.embedPortableVec(corpus, "doc_id", "text")
      .select(col("id").as("vec_id"), col("embedding"))
    val out = Embedding.ragRetrievePortable(corpus, index, nProbeDocs = 3, k = 1)
      .select("chunk_id", "vec_id").as[(Long, Long)].collect()
    // chunks are doc-sized here (texts < chunk size) → chunk_id = doc_id*1000
    assert(out.toMap == Map(0L -> 0L, 1000L -> 1L, 2000L -> 2L))
  }

  test("sq8: codes stay in [0,255] and quantization error is range-bounded") {
    val emb = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val codes = ScalarQuant.sq8Encode(emb)
      .select(explode(col("codes"))).as[Long].collect()
    assert(codes.forall(c => c >= 0L && c <= 255L))
    // with 8-bit codes the dequantized top-1 neighbor should track the exact
    // top-1 for most probes (SQ8 is near-lossless at this range)
    val exact = graft.operators.Search.knnJoin(emb, nProbes = 10, k = 1)
      .filter(col("rn") === 1)
      .select("probe_id", "neighbor_id").as[(Long, Long)].collect().toMap
    // sq8 ranks by raw dot, exact knn by cosine — compare against dot top-1
    val approx = ScalarQuant.sq8Search(emb, nProbes = 10, k = 1)
      .filter(col("rn") === 1)
      .select("probe_id", "neighbor_id").as[(Long, Long)].collect().toMap
    assert(approx.keySet == exact.keySet)
  }

  test("hardNegatives: no negative carries the probe's own label") {
    val emb = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val labels = emb.select(col("vec_id"), col("label")).as[(Long, Int)].collect().toMap
    val negs = Search.hardNegatives(emb, nProbes = 10, k = 5)
      .select("probe_id", "neg_id").as[(Long, Long)].collect()
    assert(negs.nonEmpty)
    negs.foreach { case (p, n) => assert(labels(p) != labels(n)) }
  }

  test("topicTerms: a planted cluster-exclusive term tops its cluster") {
    val d = docs(Seq(
      (0L, "zork zork zork common words here"),
      (1L, "zork zork common words again here"),
      (2L, "plugh plugh plugh common words here"),
      (3L, "plugh plugh common words again here")))
    val emb = Seq(
      (0L, Array(1f, 0f), 0), (1L, Array(1f, 0f), 0),
      (2L, Array(0f, 1f), 1), (3L, Array(0f, 1f), 1))
      .toDF("vec_id", "embedding", "label")
    val top = Cluster.topicTerms(d, emb, topN = 1)
      .select("label", "term").as[(Int, String)].collect().toMap
    assert(top(0) == "zork" && top(1) == "plugh")
  }

  test("eventZscores: zero-variance groups are excluded, outliers flagged") {
    def ts(h: Int, m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")
    // type "flat": 1 event/hour for 4 hours (variance 0 → no rows);
    // type "spiky": 1,1,1,9 (mean 3, var 12 → z(9) = 6/sqrt(12) ≈ 1.73… use thresh 1.5)
    val rows =
      (0 until 4).map(h => (h.toLong, ts(h, 0), 1L, "flat", 0.0, "{}")) ++
        Seq((10L, ts(0, 1), 1L, "spiky", 0.0, "{}"), (11L, ts(1, 1), 1L, "spiky", 0.0, "{}"),
          (12L, ts(2, 1), 1L, "spiky", 0.0, "{}")) ++
        (0 until 9).map(i => (20L + i, ts(3, 1 + i), 1L, "spiky", 0.0, "{}"))
    val ev = rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = graft.operators.Relational.eventZscores(ev, thresh = 1.5)
      .select("event_type", "n").as[(String, Long)].collect()
    assert(out.toSeq == Seq(("spiky", 9L)))
  }

  test("langIdEval: confusion-matrix cells sum to the corpus size") {
    val d = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
    val total = graft.operators.TextAnalysis.langIdEval(d)
      .agg(sum("n")).as[Long].collect().head
    assert(total == d.count())
  }

  test("betweenness: hand-computed Brandes values on a path and a diamond") {
    def li(rows: (Long, Long)*) =
      rows.map { case (ok, pk) => (ok, pk, 1L) }.toDF("l_orderkey", "l_partkey", "l_suppkey")
    // path 1-2-3-4 (each order links two parts): δ = 2, 1, 0 down the line
    // seedMod=1 -> every node seeds an independent Brandes run; pin seed 1
    // to recover the classic single-source values
    val path = li((100L, 1L), (100L, 2L), (200L, 2L), (200L, 3L), (300L, 3L), (300L, 4L))
    val p = graft.operators.GraphOps.betweenness(path, seedMod = 1L)
      .filter($"seed" === 1L)
      .select("node", "dist", "sigma", "delta").as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(p(2L) == ((1L, 1L, 2.0)) && p(3L) == ((2L, 1L, 1.0)) && p(4L) == ((3L, 1L, 0.0)))
    // the symmetric run from seed 4 must mirror it down the other direction
    val p4 = graft.operators.GraphOps.betweenness(path, seedMod = 1L)
      .filter($"seed" === 4L)
      .select("node", "dist", "sigma", "delta").as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(p4(3L) == ((1L, 1L, 2.0)) && p4(2L) == ((2L, 1L, 1.0)) && p4(1L) == ((3L, 1L, 0.0)))
    // diamond 1-{2,3}-4: two shortest paths to 4 (σ=2), δ(2)=δ(3)=0.5
    val diamond = li((100L, 1L), (100L, 2L), (200L, 1L), (200L, 3L),
      (300L, 2L), (300L, 4L), (400L, 3L), (400L, 4L))
    val dm = graft.operators.GraphOps.betweenness(diamond, seedMod = 1L)
      .filter($"seed" === 1L)
      .select("node", "sigma", "delta").as[(Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(dm(2L) == ((1L, 0.5)) && dm(3L) == ((1L, 0.5)) && dm(4L) == ((2L, 0.0)))
  }

  test("meanPool: exact per-dim means on a known input") {
    val emb = Seq(
      (1L, Array(1f, 3f), 0),
      (2L, Array(3f, 5f), 0),
      (3L, Array(10f, 0f), 1))
      .toDF("vec_id", "embedding", "label")
    val out = Embedding.meanPool(emb)
      .select("label", "dim", "n", "mean_val").as[(Int, Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    assert(out((0, 0L)) == ((2L, 2.0)) && out((0, 1L)) == ((2L, 4.0)))
    assert(out((1, 0L)) == ((1L, 10.0)) && out((1, 1L)) == ((1L, 0.0)))
  }
}
