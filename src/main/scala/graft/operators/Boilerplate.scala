package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-level boilerplate removal (the RefinedWeb/CCNet "line dedup"
  * pass): segments that repeat across more than `maxDocs` distinct documents
  * (headers, footers, nav chrome) are dropped from every document, and the
  * surviving segments are reassembled in order.
  *
  * The test corpus has no newlines, so a "line" is a fixed `span`-token
  * block (Normalize.tokenBlocks) — the plan is identical when lines are real:
  *   explode lines → per-line distinct-doc count (one shuffle keyed by line)
  *   → join the blocklist back (AQE skew-join handles ultra-hot lines)
  *   → per-doc ordered reassembly (one shuffle keyed by doc_id).
  * Shuffle volume is O(corpus tokens); the blocklist is the only
  * intermediate that grows with corpus redundancy, never with corpus size².
  */
object Boilerplate {

  def lineDedup(documents: DataFrame, span: Int = 3, maxDocs: Int = 2): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    // Block extraction runs in a typed kernel: the column-expression form
    // (transform + slice per block) is CodegenFallback — interpreted per
    // element — and the lines table is read by TWO branches (blocklist +
    // join-back), which doubles that cost. Narrow, fully distributed, and
    // persisted so each branch reads it once.
    val lines = documents.select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions { iter =>
        iter.flatMap { case (docId, text) =>
          val toks = text.trim.split("\\s+")
          val nBlocks = (toks.length - 1) / span + 1
          (0 until nBlocks).iterator.map { j =>
            (docId, j, toks.slice(j * span, math.min(j * span + span, toks.length)).mkString(" "))
          }
        }
      }
      .toDF("doc_id", "pos", "block")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val blocklist = lines.groupBy(col("block"))
      .agg(countDistinct(col("doc_id")).as("n_docs"))
      .filter(col("n_docs") > maxDocs)
      .select(col("block"), lit(true).as("is_boiler"))
    lines.join(blocklist, Seq("block"), "left")
      .groupBy(col("doc_id"))
      .agg(
        sum(when(col("is_boiler").isNull, 1L).otherwise(0L)).as("n_kept"),
        sum(when(col("is_boiler").isNotNull, 1L).otherwise(0L)).as("n_dropped"),
        concat_ws(" ",
          array_sort(collect_list(
            when(col("is_boiler").isNull, struct(col("pos"), col("block")))))
            .getField("block")).as("clean_text"))
  }

  def lineDedupSql(span: Int = 3, maxDocs: Int = 2): String =
    s"""WITH tk AS (
       |  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t FROM documents),
       |bl AS (
       |  SELECT doc_id, ${Normalize.tokenBlocksSql("t", span)} AS bls FROM tk),
       |ln AS (
       |  SELECT doc_id,
       |    unnest(range(0, CAST(len(bls) AS BIGINT))) AS pos,
       |    unnest(bls) AS block
       |  FROM bl),
       |blocklist AS (
       |  SELECT block FROM ln GROUP BY 1 HAVING COUNT(DISTINCT doc_id) > $maxDocs)
       |SELECT ln.doc_id,
       |  CAST(SUM(CASE WHEN b.block IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       |  CAST(SUM(CASE WHEN b.block IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped,
       |  COALESCE(string_agg(CASE WHEN b.block IS NULL THEN ln.block END, ' ' ORDER BY ln.pos), '') AS clean_text
       |FROM ln LEFT JOIN blocklist b ON ln.block = b.block
       |GROUP BY ln.doc_id""".stripMargin
}
