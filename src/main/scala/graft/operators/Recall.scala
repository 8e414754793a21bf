package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Recall measurement for approximate indexes vs exact brute force —
  * computed distributively (inner join on the (probe, neighbor) pairs),
  * so it runs at any corpus size: no collect of the neighbor lists. */
object Recall {

  /** recall@k = |approx ∩ exact| / |exact| over (probe_id, neighbor_id). */
  def recallAtK(exact: DataFrame, approx: DataFrame): Double = {
    val total = exact.count()
    if (total == 0L) return 0.0
    val hits = exact.select(col("probe_id"), col("neighbor_id"))
      .join(approx.select(col("probe_id"), col("neighbor_id")),
        Seq("probe_id", "neighbor_id"))
      .count()
    hits.toDouble / total
  }

  /** Near-tie-tolerant recall (the FAISS-style "recall within epsilon"):
    * an approx neighbor counts as a hit when its TRUE cosine is within
    * `eps` of the probe's k-th exact cosine — the right metric on a dense
    * corpus where the top-k is a cluster of near-equivalent neighbors
    * (e.g. perturbed replicas): returning any member of the near-tie set
    * is equally good retrieval, and set-membership recall would punish
    * quantizers whose resolution is below the tie gap. `exact` must carry
    * the true `cos` per exact pair (Search.knnJoin does); approx pairs
    * are re-scored exactly against `embeddings`. Assumes approx returns
    * ≤ k rows per probe (every registered variant does). */
  def recallAtKEps(exact: DataFrame, approx: DataFrame,
                   embeddings: DataFrame, eps: Double): Double = {
    val total = exact.count()
    if (total == 0L) return 0.0
    val thr = exact.groupBy(col("probe_id")).agg(min(col("cos")).as("kth"))
    val e = embeddings.select(col("vec_id"), col("embedding"))
    val hits = approx.select(col("probe_id"), col("neighbor_id"))
      .join(e.select(col("vec_id").as("probe_id"), col("embedding").as("pv")), "probe_id")
      .join(e.select(col("vec_id").as("neighbor_id"), col("embedding")), "neighbor_id")
      .withColumn("tc", graft.functions.VectorOps.cosine(col("embedding"), col("pv")))
      .join(thr, "probe_id")
      .filter(col("tc") >= col("kth") - eps)
      .count()
    hits.toDouble / total
  }
}
