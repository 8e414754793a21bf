package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text normalization + repetition-based quality rules — the ccnet/Gopher
  * preprocessing steps that run immediately before dedup in an LLM data
  * pipeline. Normalization is a narrow, fully codegen'd scan (zero shuffle);
  * the repetition metrics need one tokens-keyed shuffle for the per-doc
  * top-bigram count and nothing else, so both scale linearly to 100 TB.
  *
  * Reference anchor: the reference pipeline normalizes/cleans text inside its
  * transformers before chunking/embedding (transformers.py:137 strips and
  * re-joins on whitespace); these operators generalize that into the standard
  * curation recipe (lowercase, whitespace collapse, digit folding; duplicate
  * line/top-n-gram repetition gates a la Gopher).
  */
object Normalize {

  /** ccnet-shape normalization: collapse whitespace runs, trim, lowercase,
    * fold digits to 0. Emits the normalized text plus its md5 — the join key
    * for normalized exact dedup (docs differing only in case/spacing/numbers
    * collapse to one hash). Pure per-row projection: no shuffle at any SF. */
  def textNormalize(documents: DataFrame): DataFrame = {
    val norm = regexp_replace(
      lower(trim(regexp_replace(col("text"), "\\s+", " "))), "[0-9]", "0")
    documents.select(
      col("doc_id"),
      norm.as("norm_text"),
      md5(norm).as("norm_hash"))
  }

  val textNormalizeSql: String =
    """SELECT doc_id,
      |regexp_replace(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), '[0-9]', '0', 'g') AS norm_text,
      |md5(regexp_replace(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), '[0-9]', '0', 'g')) AS norm_hash
      |FROM documents""".stripMargin

  /** Tokens of `text` (shared with the SQL oracle's string_split_regex). */
  private def toks: Column = split(trim(col("text")), "\\s+")

  /** Non-distinct word bigrams: one entry per adjacent pair; single-token
    * docs degrade to the lone token (concat_ws skips the null neighbor),
    * mirroring the DuckDB formulation exactly. */
  private def bigrams(t: Column): Column =
    transform(sequence(lit(0), greatest(size(t) - 2, lit(0))),
      i => concat_ws(" ", get(t, i), get(t, i + 1)))

  /** Fixed-span token blocks ("lines" for a corpus without newlines): block
    * j = tokens [j*span, j*span+span). Proxy for line-level metrics on
    * documents that carry no layout. */
  def tokenBlocks(t: Column, span: Int): Column =
    transform(sequence(lit(0), ((size(t) - 1) / span).cast("int")),
      j => concat_ws(" ", slice(t, j * span + 1, lit(span))))

  def tokenBlocksSql(t: String, span: Int): String =
    s"list_transform(range(0, CAST((len($t) + ${span - 1}) // $span AS BIGINT)), " +
      s"j -> array_to_string($t[j*$span+1 : j*$span+$span], ' '))"

  /** Gopher-style repetition gate: per-doc
    *   - top_bigram_frac — fraction of tokens covered by the most frequent
    *     bigram (2·max_count/n_tokens),
    *   - dup_block_frac — fraction of span-token blocks that are duplicates
    *     within the doc (1 − distinct/total),
    *   - stop_ratio — stopword-marker density,
    * and a verdict from the thresholds. The only shuffle is the per-doc
    * top-bigram aggregate, keyed by (doc_id, bigram) then doc_id — O(tokens)
    * shuffle bytes, no skew (doc_id is unique), linear at 100 TB. */
  def gopherQuality(documents: DataFrame, span: Int = 5,
                    maxTopBigramFrac: Double = 0.18,
                    maxDupBlockFrac: Double = 0.05): DataFrame = {
    val base = documents.select(col("doc_id"), col("text"), toks.as("t"))
    val topBigram = base
      .select(col("doc_id"), explode(bigrams(col("t"))).as("bg"))
      .groupBy(col("doc_id"), col("bg")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id")).agg(max(col("c")).as("max_bg"))
    val blocks = tokenBlocks(col("t"), span)
    val perDoc = base.select(
      col("doc_id"),
      size(col("t")).cast("long").as("n_tok"),
      size(blocks).cast("long").as("n_blocks"),
      size(array_distinct(blocks)).cast("long").as("n_distinct_blocks"),
      TextAnalysisShared.occ(col("text"), "the").as("n_stop"))
    perDoc.join(topBigram, "doc_id")
      .select(
        col("doc_id"),
        (col("max_bg") * 2.0 / col("n_tok").cast("double")).as("top_bigram_frac"),
        (lit(1.0) - col("n_distinct_blocks").cast("double") / col("n_blocks").cast("double"))
          .as("dup_block_frac"),
        (col("n_stop").cast("double") / col("n_tok").cast("double")).as("stop_ratio"))
      .withColumn("verdict",
        when(col("dup_block_frac") > maxDupBlockFrac, "repetitive_blocks")
          .when(col("top_bigram_frac") > maxTopBigramFrac, "repetitive_bigrams")
          .when(col("stop_ratio") === 0.0, "no_stopwords")
          .otherwise("keep"))
  }

  def gopherQualitySql(span: Int = 5, maxTopBigramFrac: Double = 0.18,
                       maxDupBlockFrac: Double = 0.05): String =
    s"""WITH tk AS (
       |  SELECT doc_id, text, string_split_regex(trim(text), '\\s+') AS t FROM documents),
       |bg AS (
       |  SELECT doc_id, unnest(list_transform(range(1, GREATEST(len(t) - 2, 0) + 2),
       |    i -> concat_ws(' ', t[i], t[i+1]))) AS bg
       |  FROM tk),
       |top_bg AS (
       |  SELECT doc_id, MAX(c) AS max_bg FROM (
       |    SELECT doc_id, bg, COUNT(*) AS c FROM bg GROUP BY 1, 2) GROUP BY 1),
       |per_doc AS (
       |  SELECT doc_id,
       |    CAST(len(t) AS BIGINT) AS n_tok,
       |    CAST(len(${tokenBlocksSql("t", span)}) AS BIGINT) AS n_blocks,
       |    CAST(len(list_distinct(${tokenBlocksSql("t", span)})) AS BIGINT) AS n_distinct_blocks,
       |    CAST((length(text) - length(replace(text, 'the', '')))/3 AS BIGINT) AS n_stop
       |  FROM tk),
       |m AS (
       |  SELECT p.doc_id,
       |    max_bg * 2.0 / CAST(n_tok AS DOUBLE) AS top_bigram_frac,
       |    1.0 - CAST(n_distinct_blocks AS DOUBLE) / CAST(n_blocks AS DOUBLE) AS dup_block_frac,
       |    CAST(n_stop AS DOUBLE) / CAST(n_tok AS DOUBLE) AS stop_ratio
       |  FROM per_doc p JOIN top_bg USING (doc_id))
       |SELECT doc_id, top_bigram_frac, dup_block_frac, stop_ratio,
       |  CASE WHEN dup_block_frac > $maxDupBlockFrac THEN 'repetitive_blocks'
       |       WHEN top_bigram_frac > $maxTopBigramFrac THEN 'repetitive_bigrams'
       |       WHEN stop_ratio = 0.0 THEN 'no_stopwords'
       |       ELSE 'keep' END AS verdict
       |FROM m""".stripMargin
}

/** Bigram language-model scoring — the perplexity-filter shape (ccnet's
  * KenLM gate) made engine-exact by staying OUT of log space: the corpus
  * trains a bigram model P(w₂|w₁) = c(w₁w₂)/c(w₁·), and a doc's score is
  * the MEAN conditional probability of its bigrams (unseen bigrams score
  * the add-one floor 1/(c(w₁·)+V)). Log-perplexity needs libm (engine
  * 1-ulp divergence); the mean-probability scorer ranks documents the
  * same way for filtering purposes and is exactly replayable: counts are
  * integers, each probability is one correctly-rounded double division,
  * and the per-doc mean is a DECIMAL(38,18)-exact sum.
  *
  * Scale shape: the model is two count tables built with one tokens-keyed
  * shuffle each (map-side combined); scoring joins the doc bigrams against
  * the model — broadcast when the vocab is Zipf-truncated, shuffle join
  * otherwise. Nothing is corpus². */
object NgramLm {
  import org.apache.spark.sql.DataFrame

  def lmScore(documents: DataFrame): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    // bigram extraction as a typed kernel: the transform/sequence HOF is
    // CodegenFallback (interpreted per token) AND this frame feeds THREE
    // consumers (pair counts, unigram counts, scoring join) with no CTE
    // sharing — kernel + persist turns 3 interpreted corpus passes into
    // one narrow compiled pass (13 s → ~2 s warm at sf0.1)
    val bg = documents.select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .flatMap { case (id, text) =>
        val t = text.trim.toLowerCase.split("\\s+")
        (0 until t.length - 1).iterator.map(i => (id, t(i), t(i + 1)))
      }
      .toDF("doc_id", "w1", "w2")
      .persist()
    val pair = bg.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c2"))
    val uni = bg.groupBy(col("w1")).agg(count(lit(1)).as("c1"))
    val v = bg.select(col("w2")).distinct().agg(count(lit(1)).as("vocab"))
    val scored = bg
      .join(pair, Seq("w1", "w2"), "left")
      .join(uni, Seq("w1"))
      .crossJoin(broadcast(v))
      .select(col("doc_id"),
        (coalesce(col("c2"), lit(0L)).cast("double") + 1.0)
          .divide((col("c1") + col("vocab")).cast("double")).as("p"))
    scored.groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_bigrams"),
        (sum(col("p").cast("string").cast("decimal(38,18)")).cast("string").cast("double")
          / count(lit(1)).cast("double")).as("mean_p"))
  }

  val lmScoreSql: String =
    """WITH tk AS (
      |  SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS t FROM documents),
      |bg AS (
      |  SELECT doc_id, t[i] AS w1, t[i+1] AS w2
      |  FROM (SELECT doc_id, t, unnest(range(1, len(t))) AS i FROM tk WHERE len(t) >= 2)),
      |pair AS (SELECT w1, w2, COUNT(*) AS c2 FROM bg GROUP BY w1, w2),
      |uni AS (SELECT w1, COUNT(*) AS c1 FROM bg GROUP BY w1),
      |v AS (SELECT COUNT(DISTINCT w2) AS vocab FROM bg),
      |scored AS (
      |  SELECT bg.doc_id,
      |    (CAST(COALESCE(pair.c2, 0) AS DOUBLE) + 1.0)
      |      / CAST(uni.c1 + v.vocab AS DOUBLE) AS p
      |  FROM bg LEFT JOIN pair ON bg.w1 = pair.w1 AND bg.w2 = pair.w2
      |  JOIN uni ON bg.w1 = uni.w1 CROSS JOIN v)
      |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
      |  CAST(CAST(SUM(CAST(CAST(p AS VARCHAR) AS DECIMAL(38,18))) AS VARCHAR) AS DOUBLE)
      |    / CAST(COUNT(*) AS DOUBLE) AS mean_p
      |FROM scored GROUP BY doc_id""".stripMargin
}

/** Shared literal-substring counter (used by Normalize and TextAnalysis). */
private[operators] object TextAnalysisShared {
  def occ(c: Column, term: String): Column =
    ((length(c) - length(regexp_replace(c, java.util.regex.Pattern.quote(term), ""))) / term.length)
      .cast("long")
}
