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

  /** DuckDB oracle for chunkFixed (series + join filter — DuckDB lacks
    * lateral table functions). The series bound is derived from the
    * longest document, so the oracle is unconditionally equivalent — a
    * fixed cap would silently truncate long documents. */
  def chunkFixedSql(size: Int = DefaultSize, overlap: Int = DefaultOverlap): String = {
    val step = size - overlap
    s"""SELECT doc_id, chunk_index, substr(text, CAST(chunk_index*$step + 1 AS INT), $size) AS chunk_text
       |FROM (
       |  SELECT doc_id, text, unnest(generate_series(0,
       |    GREATEST(CAST(CEIL((LENGTH(text) - $overlap)/$step.0) AS BIGINT), 1) - 1)) AS chunk_index
       |  FROM documents)""".stripMargin
  }

  /** Word-mode chunking, reference-exact (transformers.py:137
    * `_split_text_by_size`): greedy char-budget boundaries over WORDS,
    * keeping the last `overlapWords` words between chunks. The boundary
    * positions depend on every prior boundary (the running size resets to
    * the overlap's size), so this is genuinely sequential PER DOCUMENT —
    * a narrow typed kernel, still embarrassingly parallel across docs.
    * rows-only (stateful loop not SQL-expressible); spec pins semantics. */
  def chunkWords(documents: DataFrame, chunkSize: Int = DefaultSize,
                 overlapWords: Int = 8): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    documents.select(col("doc_id").cast("long"), col("text"))
      .as[(Long, String)]
      .flatMap { case (id, text) =>
        val words = text.trim.split("\\s+").filter(_.nonEmpty)
        val chunks = scala.collection.mutable.ArrayBuffer.empty[String]
        var cur = Vector.empty[String]
        var size = 0
        for (w <- words) {
          val ws = w.length + 1
          if (size + ws > chunkSize && cur.nonEmpty) {
            chunks += cur.mkString(" ")
            val ov = if (cur.length > overlapWords) cur.takeRight(overlapWords) else cur
            cur = ov :+ w
            size = cur.map(_.length + 1).sum
          } else {
            cur = cur :+ w
            size += ws
          }
        }
        if (cur.nonEmpty) chunks += cur.mkString(" ")
        chunks.zipWithIndex.map { case (c, i) => (id, i.toLong, c) }
      }
      .toDF("doc_id", "chunk_index", "chunk_text")
  }
}
