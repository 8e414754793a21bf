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

  /** Token-BUDGET sampling per domain — the other half of corpus mixing:
    * domainMix sets per-domain RATES, this fills a fixed per-domain token
    * budget in a deterministic pseudo-random priority order (md5 of the
    * doc id — unbiased w.r.t. content, reproducible everywhere) and cuts
    * exactly where the running token total would exceed it. One window per
    * domain partition (never global), integer cumulative sums — exact on
    * both engines. Emits the picked docs with their position and running
    * total, i.e. the manifest a training-data packer consumes. */
  def budgetSample(documents: DataFrame, tokenBudget: Long = 5000L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val nTok = size(split(trim(col("text")), "\\s+")).cast("long")
    val pri = md5(col("doc_id").cast("string"))
    val w = Window.partitionBy("source").orderBy(col("pri"), col("doc_id"))
    documents
      .select(col("source"), col("doc_id"), nTok.as("n_tok"), pri.as("pri"))
      .withColumn("cum_tok",
        sum(col("n_tok")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .filter(col("cum_tok") <= tokenBudget)
      .select(col("source"), col("doc_id"), col("n_tok"), col("cum_tok"))
  }

  def budgetSampleSql(tokenBudget: Long = 5000L): String =
    s"""WITH t AS (
       |  SELECT source, doc_id,
       |    CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS n_tok,
       |    md5(CAST(doc_id AS VARCHAR)) AS pri
       |  FROM documents),
       |c AS (
       |  SELECT source, doc_id, n_tok,
       |    SUM(n_tok) OVER (PARTITION BY source ORDER BY pri, doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_tok
       |  FROM t)
       |SELECT source, doc_id, n_tok, CAST(cum_tok AS BIGINT) AS cum_tok
       |FROM c WHERE cum_tok <= $tokenBudget""".stripMargin
}
