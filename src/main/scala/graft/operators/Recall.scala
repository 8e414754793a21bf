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
}
