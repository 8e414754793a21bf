package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Domain mixing — temperature-based resampling of a multi-domain corpus
  * (the multinomial-smoothing recipe from XLM-R/mT5: small domains are
  * upweighted, huge domains downweighted, via weight ∝ count^alpha with
  * alpha = 0.5).
  *
  * Plan shape at 100 TB: two tiny aggregates (per-domain counts → one global
  * row) broadcast BACK over the corpus, then a single deterministic-hash
  * filter scan — the corpus itself is read once and never shuffled. The
  * per-domain keep-rate table is O(#domains) rows regardless of corpus size.
  *
  * Determinism across engines: sqrt() doubles are summed as DECIMAL(38,18)
  * (exact, order-independent — float summation order would differ between
  * Spark partitions and DuckDB) and the keep decision uses the same masked
  * multiplicative hash as corpus_sample.
  */
object DomainMix {

  def domainMix(documents: DataFrame, targetFrac: Double = 0.5): DataFrame = {
    val counts = documents.groupBy(col("lang")).agg(count(lit(1)).as("n"))
    val totals = counts.agg(
      sum(col("n")).as("n_total"),
      // scale 18: shortest-repr doubles of sqrt(n) for n >= 1 carry at most
      // 16 decimal places, so the string->decimal parse is exact (no
      // engine-specific rounding) and the sum is order-independent
      sum(sqrt(col("n").cast("double")).cast("string").cast("decimal(38,18)"))
        .cast("double").as("w_total"))
    val rates = counts.crossJoin(broadcast(totals))
      .select(
        col("lang"),
        least(
          lit(1.0),
          lit(targetFrac) * col("n_total").cast("double") * sqrt(col("n").cast("double"))
            / col("w_total") / col("n").cast("double")).as("rate"))
    documents.join(broadcast(rates), "lang")
      .filter(
        pmod(col("doc_id").bitwiseAND(lit(0x7FFFFFFFL)) * 2654435761L, lit(10000L))
          .cast("double") < col("rate") * 10000.0)
      .select(col("doc_id"), col("lang"), col("rate"))
  }

  def domainMixSql(targetFrac: Double = 0.5): String =
    s"""WITH counts AS (
       |  SELECT lang, COUNT(*) AS n FROM documents GROUP BY 1),
       |totals AS (
       |  SELECT SUM(n) AS n_total,
       |    CAST(SUM(CAST(CAST(sqrt(CAST(n AS DOUBLE)) AS VARCHAR) AS DECIMAL(38,18))) AS DOUBLE) AS w_total
       |  FROM counts),
       |rates AS (
       |  SELECT lang,
       |    LEAST(1.0, $targetFrac * CAST(n_total AS DOUBLE) * sqrt(CAST(n AS DOUBLE))
       |      / w_total / CAST(n AS DOUBLE)) AS rate
       |  FROM counts CROSS JOIN totals)
       |SELECT doc_id, d.lang, rate
       |FROM documents d JOIN rates r ON d.lang = r.lang
       |WHERE CAST(((doc_id & 2147483647) * 2654435761) % 10000 AS DOUBLE) < rate * 10000.0""".stripMargin
}
