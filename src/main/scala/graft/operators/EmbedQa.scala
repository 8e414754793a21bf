package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.VectorOps

/** Embedding QA — the sanity rollup a vector pipeline runs after every
  * batch-embed job before anything downstream trusts the vectors: per
  * label, row count, dimensionality violations, zero vectors, and the
  * norm envelope. One narrow scan + one tiny aggregate; min/max are
  * summation-order-free, so the report is hash-exact cross-engine (no
  * averages — a mean norm would drift with partition order).
  */
object EmbedQa {

  def embedQa(embeddings: DataFrame, dim: Int = 64): DataFrame = {
    val norm = sqrt(VectorOps.dot(col("embedding"), col("embedding")))
    embeddings
      .select(col("label"), col("embedding"), norm.as("norm"))
      .groupBy(col("label"))
      .agg(
        count(lit(1)).as("n_vecs"),
        sum(when(size(col("embedding")) =!= dim, 1L).otherwise(0L)).as("n_bad_dim"),
        sum(when(col("norm") === 0.0, 1L).otherwise(0L)).as("n_zero"),
        min(col("norm")).as("min_norm"),
        max(col("norm")).as("max_norm"))
  }

  def embedQaSql(dim: Int = 64): String = {
    val norm = s"sqrt(${VectorOps.dotSql("embedding", "embedding", dim)})"
    s"""SELECT label,
       |CAST(COUNT(*) AS BIGINT) AS n_vecs,
       |CAST(SUM(CASE WHEN len(embedding) <> $dim THEN 1 ELSE 0 END) AS BIGINT) AS n_bad_dim,
       |CAST(SUM(CASE WHEN $norm = 0.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_zero,
       |MIN($norm) AS min_norm,
       |MAX($norm) AS max_norm
       |FROM embeddings GROUP BY label""".stripMargin
  }
}
