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

  /** Chunk-level dedup — RAG index hygiene: the same chunk must not be
    * embedded and indexed twice. Hash every fixed chunk, find hashes that
    * appear in more than one document (overlap-tail chunks repeat WITHIN
    * a doc by construction — only cross-doc repeats matter), and emit the
    * per-doc duplicated-chunk fraction with an indexing verdict. One
    * hash-groupBy over chunks — the exact-dedup shape one level down. */
  def chunkDedup(documents: DataFrame, size: Int = DefaultSize,
                 overlap: Int = DefaultOverlap, maxDupFrac: Double = 0.5): DataFrame = {
    val ch = chunkFixed(documents, size, overlap)
      .select(col("doc_id"), md5(col("chunk_text")).as("h"))
    val shared = ch.select(col("doc_id"), col("h")).distinct()
      .groupBy(col("h")).agg(count(lit(1)).as("n_docs"))
      .filter(col("n_docs") > 1L)
      .select(col("h"))
    ch.join(shared, Seq("h"), "left_semi")
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_dup_chunks"))
      .join(ch.groupBy(col("doc_id")).agg(count(lit(1)).as("n_chunks")), Seq("doc_id"), "right_outer")
      .select(col("doc_id"), col("n_chunks"),
        coalesce(col("n_dup_chunks"), lit(0L)).as("n_dup_chunks"))
      .withColumn("dup_frac",
        col("n_dup_chunks").cast("double") / col("n_chunks").cast("double"))
      .withColumn("index_verdict",
        when(col("dup_frac") > maxDupFrac, "skip").otherwise("index"))
  }

  def chunkDedupSql(size: Int = DefaultSize, overlap: Int = DefaultOverlap,
                    maxDupFrac: Double = 0.5): String =
    s"""WITH ch AS MATERIALIZED (
       |  SELECT doc_id, md5(chunk_text) AS h FROM (${chunkFixedSql(size, overlap)})),
       |shared AS (
       |  SELECT h FROM (SELECT DISTINCT doc_id, h FROM ch)
       |  GROUP BY h HAVING COUNT(*) > 1),
       |dup AS (
       |  SELECT doc_id, COUNT(*) AS n_dup_chunks
       |  FROM ch WHERE h IN (SELECT h FROM shared) GROUP BY 1),
       |tot AS (SELECT doc_id, COUNT(*) AS n_chunks FROM ch GROUP BY 1)
       |SELECT t.doc_id, t.n_chunks, COALESCE(d.n_dup_chunks, 0) AS n_dup_chunks,
       |  CAST(COALESCE(d.n_dup_chunks, 0) AS DOUBLE) / CAST(t.n_chunks AS DOUBLE) AS dup_frac,
       |  CASE WHEN CAST(COALESCE(d.n_dup_chunks, 0) AS DOUBLE) / CAST(t.n_chunks AS DOUBLE)
       |            > $maxDupFrac
       |       THEN 'skip' ELSE 'index' END AS index_verdict
       |FROM tot t LEFT JOIN dup d ON t.doc_id = d.doc_id""".stripMargin

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
    * Oracle-checked via a DuckDB list_reduce replay of the greedy loop
    * (see [[chunkWordsSql]]); spec pins semantics besides. */
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

  /** DuckDB replay of the greedy word loop — a sequential fold IS
    * SQL-expressible after all, via list_reduce with the whole chunker
    * state packed into one VARCHAR accumulator (list_reduce requires
    * accumulator type = element type, so a struct won't do):
    * `emitted-chunks ␝-separated` ␞ `current-words`. The running size
    * needs no state: cur.map(_.length+1).sum == length(join(cur,' '))+1.
    * Relies on the corpus being ASCII text (no ␝/␞ control chars) — the
    * same precondition the multimodal string-replay oracles verify. */
  def chunkWordsSql(chunkSize: Int = DefaultSize, overlapWords: Int = 8): String = {
    val cur = "string_split(acc, chr(30))[-1]"
    val chs = "string_split(acc, chr(30))[1]"
    s"""WITH st AS (
       |  SELECT doc_id, list_reduce(
       |    list_prepend(chr(30),
       |      list_filter(string_split_regex(trim(text), '\\s+'), x -> x <> '')),
       |    (acc, w) -> CASE
       |      WHEN (CASE WHEN $cur = '' THEN 0 ELSE length($cur) + 1 END)
       |             + length(w) + 1 > $chunkSize
       |           AND $cur <> ''
       |      THEN $chs
       |           || (CASE WHEN $chs = '' THEN '' ELSE chr(29) END)
       |           || $cur || chr(30)
       |           || array_to_string(string_split($cur, ' ')[-$overlapWords:], ' ')
       |           || ' ' || w
       |      ELSE $chs || chr(30)
       |           || (CASE WHEN $cur = '' THEN w ELSE $cur || ' ' || w END)
       |    END) AS s
       |  FROM documents),
       |fl AS (
       |  SELECT doc_id,
       |    CASE WHEN string_split(s, chr(30))[-1] = '' THEN string_split(s, chr(30))[1]
       |         WHEN string_split(s, chr(30))[1] = '' THEN string_split(s, chr(30))[-1]
       |         ELSE string_split(s, chr(30))[1] || chr(29) || string_split(s, chr(30))[-1]
       |    END AS packed
       |  FROM st),
       |ex AS (
       |  SELECT doc_id, string_split(packed, chr(29)) AS ch FROM fl WHERE packed <> '')
       |SELECT doc_id, CAST(i - 1 AS BIGINT) AS chunk_index, ch[i] AS chunk_text
       |FROM (SELECT doc_id, ch, unnest(range(1, len(ch) + 1)) AS i FROM ex)""".stripMargin
  }
}
