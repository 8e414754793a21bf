package graft

import graft.operators.Dedup
import graft.operators.Search
import graft.sources.Tables

/** Recall harness: approximate indexes measured against exact brute force.
  * Floors are deliberately modest — the point is the measurement plumbing
  * and catching regressions, not tuning to this synthetic corpus.
  */
class RecallSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.01"

  test("ann_lsh and ann_ivf recall@3 vs exact knn") {
    val emb = Tables.embeddings(spark, dir)
    val exact = Search.knnJoin(emb, nProbes = 10, k = 3)
    val rLsh = graft.operators.Recall.recallAtK(exact, Dedup.annLsh(emb, nProbes = 10, k = 3))
    val rMp = graft.operators.Recall.recallAtK(
      exact, Dedup.annLshMultiprobe(emb, nProbes = 10, k = 3))
    val rMt = graft.operators.Recall.recallAtK(
      exact, Dedup.annLshMultiTable(emb, nProbes = 10, k = 3))
    val rIvf = graft.operators.Recall.recallAtK(exact, Dedup.annIvf(emb, nProbes = 10, k = 3))
    val rIvfMp = graft.operators.Recall.recallAtK(
      exact, Dedup.annIvfMultiprobe(emb, nProbes = 10, k = 3))
    info(f"recall@3: lsh=$rLsh%.2f lsh_mp=$rMp%.2f lsh_mt=$rMt%.2f ivf=$rIvf%.2f ivf_mp=$rIvfMp%.2f")
    assert(rIvfMp >= rIvf, f"ivf multi-probe recall $rIvfMp%.2f below single-cell $rIvf%.2f")
    // flipping each sign bit once must not LOSE candidates: multi-probe
    // recall dominates single-probe by construction
    assert(rMp >= rLsh, f"multi-probe recall $rMp%.2f below single-probe $rLsh%.2f")
    // L independent tables strictly widen the candidate set of table 0
    assert(rMt >= rLsh, f"multi-table recall $rMt%.2f below single-table $rLsh%.2f")
    // This corpus's true neighbors are only weakly similar (cos ≈ 0.4), so
    // single-probe hyperplane LSH collides at ~(1-θ/π)^planes ≈ 0.16 —
    // the measured 0.17 IS the theoretical ceiling here; multi-probe is the
    // production lever. IVF (data-adaptive cells) reaches 0.97 on the same
    // corpus, which is why it's the preferred scale path.
    assert(rLsh >= 0.10, f"lsh recall degraded: $rLsh%.2f")
    assert(rIvf >= 0.80, f"ivf recall degraded: $rIvf%.2f")
    // multi-table at the swept (5 planes, 24 tables) frontier: measured
    // 0.87 here / 0.90 at sf0.1 against the 0.8 round-5 target; floor has
    // margin for corpus regeneration noise
    assert(rMt >= 0.70, f"multi-table recall degraded: $rMt%.2f")
  }

  test("trained-quantizer ivf recall@3 and cell balance") {
    val emb = Tables.embeddings(spark, dir)
    val exact = Search.knnJoin(emb, nProbes = 10, k = 3)
    val rTr = graft.operators.Recall.recallAtK(
      exact, graft.operators.Cluster.annIvfTrained(emb, nProbes = 10, k = 3))
    info(f"recall@3: ivf_trained=$rTr%.2f")
    assert(rTr >= 0.80, f"trained ivf recall degraded: $rTr%.2f")
    // the point of training: Lloyd updates must not leave the index with
    // one hot cell absorbing the corpus (per-probe search cost blows up)
    val cellSizes = graft.operators.Cluster.kmeans(emb, k = 16, iters = 1)
      .groupBy("cluster").count().select("count").as[Long].collect()
    assert(cellSizes.max <= emb.count() / 2,
      s"trained quantizer collapsed: largest cell ${cellSizes.max}")
  }

  test("ann_pq recall@3 vs exact knn") {
    val emb = Tables.embeddings(spark, dir)
    val exact = Search.knnJoin(emb, nProbes = 10, k = 3)
    val rPq = graft.operators.Recall.recallAtK(
      exact, graft.operators.ProductQuant.pqSearch(emb, nProbes = 10, k = 3))
    val rIvfPq = graft.operators.Recall.recallAtK(
      exact, graft.operators.ProductQuant.ivfPqSearch(emb, nProbes = 10, k = 3))
    val rPqTr = graft.operators.Recall.recallAtK(
      exact, graft.operators.ProductQuant.pqSearchTrained(emb, nProbes = 10, k = 3))
    info(f"recall@3: pq=$rPq%.2f ivf_pq=$rIvfPq%.2f pq_tr=$rPqTr%.2f")
    // training exists to sharpen the codebooks: Lloyd-trained must not
    // fall below the untrained first-k seed
    assert(rPqTr >= rPq - 0.01, f"trained PQ recall below untrained: $rPqTr%.2f < $rPq%.2f")
    // cell routing restricts candidates; residual encoding (FAISS
    // IndexIVFPQ layout) keeps the within-cell quantization sharp
    assert(rIvfPq >= 0.5, f"ivf_pq recall degraded: $rIvfPq%.2f")
    // PQ scores all rows (no candidate pruning — it's a COMPRESSION layer,
    // 32× smaller corpus residency), so recall is bounded only by
    // quantization error — L2-nearest assignment over w=2 subspaces keeps
    // it ≥ 0.5 even with untrained first-n codebooks (the round-3 0.20 was
    // argmax-dot assignment over w=8, a quantizer-objective mismatch).
    assert(rPq >= 0.5, f"pq recall degraded: $rPq%.2f")
  }

  test("exact re-rank closes PQ quantization error (FAISS refine pattern)") {
    val emb = Tables.embeddings(spark, dir)
    val k = 3
    val exact = Search.knnJoin(emb, nProbes = 10, k = k)
    val rPq = graft.operators.Recall.recallAtK(
      exact, graft.operators.ProductQuant.pqSearch(emb, nProbes = 10, k = k))
    val rr = graft.operators.ProductQuant.pqRerank(emb, nProbes = 10, k = k)
    val rRr = graft.operators.Recall.recallAtK(exact, rr)
    val rIvfRr = graft.operators.Recall.recallAtK(
      exact, graft.operators.ProductQuant.ivfPqRerank(emb, nProbes = 10, k = k))
    info(f"recall@3: pq=$rPq%.2f pq_rerank=$rRr%.2f ivf_pq_rr=$rIvfRr%.2f")
    // the refine contract: re-ranking an ADC pool on exact cosine can only
    // need the pool to CONTAIN true neighbors, not rank them — recall must
    // dominate plain ADC top-k (measured 0.67 → 1.00 at both SFs)
    assert(rRr >= rPq, f"re-rank lost recall: $rRr%.2f < $rPq%.2f")
    assert(rRr >= 0.9, f"pq re-rank recall degraded: $rRr%.2f")
    // IVF-PQ re-rank is capped by cell routing, not quantization
    assert(rIvfRr >= 0.8, f"ivf_pq re-rank recall degraded: $rIvfRr%.2f")
    // shape: exactly k rows per probe, rn densely 1..k on the exact score
    val rows = rr.groupBy("probe_id").count().select("count").as[Long].collect()
    assert(rows.forall(_ == k), s"expected $k rows per probe, got ${rows.mkString(",")}")
  }
}
