package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact-substring dedup (Lee et al. 2022, "Deduplicating Training Data
  * Makes Language Models Better" — the ExactSubstr pass) at token
  * granularity: find every span of ≥ `minSpanTokens` tokens that occurs
  * more than once anywhere in the corpus (across docs OR repeated within
  * one), and emit the per-doc spans so a downstream pass can cut them.
  *
  * The suffix-array formulation doesn't distribute; the standard scalable
  * approximation is positional k-token shingles: a duplicated span of
  * ≥ k+r−1 tokens is exactly a run of r consecutive duplicated shingle
  * positions, so
  *   1. shingle (doc_id, pos, k-gram) per position — typed kernel, narrow
  *      (the column-HOF form is CodegenFallback, interpreted on the corpus
  *      path);
  *   2. duplicated shingles = groupBy(shingle) HAVING count > 1 — ONE
  *      O(corpus-tokens) shuffle with map-side combine, the operator's
  *      only corpus-wide exchange (at 100 TB the join key is an 8-byte
  *      shingle hash, not the text — collision-safe after the span-verify
  *      read; here the text keys keep the DuckDB oracle portable);
  *   3. join the flags back and sessionize consecutive positions per doc
  *      (lag + running-sum window partitioned by doc_id — bounded by doc
  *      length, never global).
  */
object ExactSubstr {

  def substringDedup(documents: DataFrame, k: Int = 5, minSpanTokens: Int = 8): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    val sh = documents.select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions { iter =>
        iter.flatMap { case (docId, text) =>
          val toks = text.trim.split("\\s+")
          (0 to toks.length - k).iterator.map { j =>
            (docId, j, toks.slice(j, j + k).mkString(" "))
          }
        }
      }
      .toDF("doc_id", "pos", "shingle")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val dup = sh.groupBy(col("shingle")).agg(count(lit(1)).as("c"))
      .filter(col("c") > 1).select(col("shingle"))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val flagged = sh.join(dup, Seq("shingle")).select(col("doc_id"), col("pos"))
      .withColumn("brk",
        when(coalesce(col("pos") - lag(col("pos"), 1).over(w), lit(2)) > 1, 1L).otherwise(0L))
      .withColumn("run_id",
        sum(col("brk")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    flagged.groupBy(col("doc_id"), col("run_id"))
      .agg(
        min(col("pos")).cast("long").as("span_start"),
        (max(col("pos")) + k - 1).cast("long").as("span_end"),
        count(lit(1)).as("n_dup_shingles"))
      .filter(col("span_end") - col("span_start") + 1 >= minSpanTokens)
      .select(col("doc_id"), col("span_start"), col("span_end"), col("n_dup_shingles"))
  }

  def substringDedupSql(k: Int = 5, minSpanTokens: Int = 8): String =
    s"""WITH tk AS (
       |  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t FROM documents),
       |sh AS MATERIALIZED (
       |  SELECT doc_id, j - 1 AS pos, array_to_string(t[j:j+${k - 1}], ' ') AS shingle
       |  FROM (SELECT doc_id, t, unnest(range(1, len(t) - ${k - 2})) AS j
       |        FROM tk WHERE len(t) >= $k)),
       |dup AS (SELECT shingle FROM sh GROUP BY 1 HAVING COUNT(*) > 1),
       |d AS (SELECT s.doc_id, s.pos FROM sh s JOIN dup u ON s.shingle = u.shingle),
       |r AS (
       |  SELECT doc_id, pos,
       |    CASE WHEN lag(pos) OVER w IS NULL OR pos - lag(pos) OVER w > 1
       |         THEN 1 ELSE 0 END AS brk
       |  FROM d WINDOW w AS (PARTITION BY doc_id ORDER BY pos)),
       |rr AS (
       |  SELECT doc_id, pos,
       |    SUM(brk) OVER (PARTITION BY doc_id ORDER BY pos
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run_id
       |  FROM r)
       |SELECT doc_id, CAST(MIN(pos) AS BIGINT) AS span_start,
       |  CAST(MAX(pos) + ${k - 1} AS BIGINT) AS span_end,
       |  CAST(COUNT(*) AS BIGINT) AS n_dup_shingles
       |FROM rr GROUP BY doc_id, run_id
       |HAVING MAX(pos) + ${k - 1} - MIN(pos) + 1 >= $minSpanTokens""".stripMargin
}
