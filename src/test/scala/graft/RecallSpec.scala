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

  private def topkSet(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
    df.select("probe_id", "neighbor_id").as[(Long, Long)]
      .collect().groupBy(_._1).map { case (p, xs) => p -> xs.map(_._2).toSet }

  test("ann_lsh and ann_ivf recall@3 vs exact knn") {
    val emb = Tables.embeddings(spark, dir)
    val exact = topkSet(Search.knnJoin(emb, nProbes = 10, k = 3))
    val lsh = topkSet(Dedup.annLsh(emb, nProbes = 10, k = 3))
    val ivf = topkSet(Dedup.annIvf(emb, nProbes = 10, k = 3))

    def recall(approx: Map[Long, Set[Long]]): Double = {
      val hits = exact.map { case (p, t) => (approx.getOrElse(p, Set.empty) & t).size }.sum
      hits.toDouble / exact.values.map(_.size).sum
    }

    val rLsh = recall(lsh)
    val rIvf = recall(ivf)
    info(f"recall@3: lsh=$rLsh%.2f ivf=$rIvf%.2f")
    // This corpus's true neighbors are only weakly similar (cos ≈ 0.4), so
    // single-probe hyperplane LSH collides at ~(1-θ/π)^planes ≈ 0.16 —
    // the measured 0.17 IS the theoretical ceiling here; multi-probe is the
    // production lever. IVF (data-adaptive cells) reaches 0.97 on the same
    // corpus, which is why it's the preferred scale path.
    assert(rLsh >= 0.10, f"lsh recall degraded: $rLsh%.2f")
    assert(rIvf >= 0.80, f"ivf recall degraded: $rIvf%.2f")
  }
}
