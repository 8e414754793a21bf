package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Document chunking (the reference's ingestion-pipeline transform,
  * transformers.py:14 DocumentTransformer / :137 _split_text_by_size)
  * re-expressed as a narrow, fully distributed explode — no driver loop,
  * no shuffle; scales linearly with corpus size.
  *
  * Fixed-size char windows with overlap: chunk i covers
  * [i*step, i*step + size), step = size - overlap.
  */
object Chunking {
  val DefaultSize = 512
  val DefaultOverlap = 64

  def chunkFixed(documents: DataFrame, size: Int = DefaultSize, overlap: Int = DefaultOverlap): DataFrame = {
    val step = size - overlap
    documents
      .withColumn("n_chunks",
        greatest(ceil((length(col("text")) - lit(overlap)) / lit(step.toDouble)), lit(1L)))
      .withColumn("chunk_index", explode(sequence(lit(0L), col("n_chunks") - 1)))
      .select(
        col("doc_id"),
        col("chunk_index"),
        expr(s"substring(text, CAST(chunk_index*$step + 1 AS INT), $size)").as("chunk_text"))
  }

  /** DuckDB oracle for chunkFixed (constant series + join filter — DuckDB
    * lacks lateral table functions). */
  def chunkFixedSql(size: Int = DefaultSize, overlap: Int = DefaultOverlap): String = {
    val step = size - overlap
    s"""SELECT doc_id, g.i AS chunk_index, substr(text, CAST(g.i*$step + 1 AS INT), $size) AS chunk_text
       |FROM documents JOIN generate_series(0, 999) AS g(i)
       |ON g.i < GREATEST(CAST(CEIL((LENGTH(text) - $overlap)/$step.0) AS BIGINT), 1)""".stripMargin
  }
}
