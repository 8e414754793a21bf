package graft.operators

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed BPE tokenizer training + encoding — the vocabulary-learning
  * step every LLM data pipeline runs over its curated corpus (Sennrich et
  * al. 2016; the reference pipeline consumes pre-trained tokenizers, this
  * is the operator that PRODUCES one at corpus scale).
  *
  * Scale shape (why this survives 100 TB):
  *   - training runs on the WORD-COUNT table, not the corpus: one
  *     O(corpus-tokens) shuffle with full map-side combine builds
  *     (word, n); everything after touches only the Zipf-bounded vocab.
  *   - each merge iteration is one pair-count aggregate over the vocab
  *     (shuffle keyed by symbol pair) + a 1-row argmax collect + a narrow
  *     codegen'd replace — the classic distributed BPE loop.
  *   - encoding joins the corpus words against the trained vocab
  *     (broadcast when it fits, shuffle join otherwise) — no per-row
  *     re-segmentation loop.
  *
  * Determinism / oracle: words are space-separated symbol strings; a merge
  * applies the pair pattern via single-pass, non-overlapping, left-to-right
  * string replacement — the exact semantics of BOTH java.lang.String
  * replace (Spark's StringReplace) and DuckDB's replace(), so the DuckDB
  * oracle replays the entire training loop CTE-by-CTE and hash-matches.
  * (This is a documented variant of Sennrich's positional greedy merge: in
  * a run of 2k+1 identical symbols the two differ in which tail symbol is
  * left unmerged — e.g. `a a a a a` → `aa a aa` here vs `aa aa a` — both
  * are standard fast-BPE behaviors.) The trained alphabet is restricted to
  * lowercase `[a-z]+` words, keeping the char-split regex trivially
  * portable; out-of-alphabet tokens would byte-fall-back in production.
  */
object Bpe {

  private val WordPat = "^[a-z]+$"

  /** (word, n, sym): corpus word counts with the initial char-split symbol
    * string ("abc" → "a b c"). The only corpus-sized shuffle in training.
    * Uncompacted — train() sizes the compaction from the measured vocab
    * count; the encode path needs no compaction (its replaces chain into
    * the join's stage). */
  def vocab(documents: DataFrame): DataFrame =
    documents
      .select(explode(split(lower(trim(col("text"))), "\\s+")).as("word"))
      .filter(col("word").rlike(WordPat))
      .groupBy(col("word")).agg(count(lit(1)).as("n"))
      .withColumn("sym", trim(regexp_replace(col("word"), "(.)", "$1 ")))

  /** Weighted adjacent-pair counts over the current symbol strings: pair
    * (toks[j], toks[j+1]) at every position j, weighted by the word count.
    * Vocab-sized input, so the interpreted HOF is off the corpus path. */
  private def pairCounts(v: DataFrame): DataFrame = {
    val toks = split(col("sym"), " ")
    v.filter(size(toks) >= 2)
      .select(col("n"), explode(
        transform(sequence(lit(0), size(toks) - 2),
          j => struct(get(toks, j).as("a"), get(toks, j + 1).as("b")))).as("p"))
      .groupBy(col("p.a").as("a"), col("p.b").as("b"))
      .agg(sum(col("n")).as("cnt"))
  }

  /** Run `nMerges` training iterations; returns the final vocab (word → sym
    * under all merges) and the merge list (it, a, b, cnt). Driver actions
    * are one 1-row collect per iteration — model-parameter extraction, same
    * pattern as the k-means centroid loop.
    *
    * The corpus-sized work ends at vocab()'s groupBy; the (Zipf-bounded)
    * vocab that feeds the merge iterations is then compacted SIZE-AWARE:
    * ceil(measured vocab count / wordsPerPartition) partitions, so a test
    * corpus's 1k words train in one task while a web corpus's 10⁷–10⁸
    * distinct words keep real parallelism through every pair-count
    * aggregate. The count that sizes it rides the persist that training
    * needs anyway — one extra job over cached rows, not an extra corpus
    * pass. */
  def train(documents: DataFrame, nMerges: Int = 10,
            wordsPerPartition: Long = 1000000L)
      : (DataFrame, Seq[(Long, String, String, Long)]) = {
    require(wordsPerPartition > 0, s"bad wordsPerPartition=$wordsPerPartition")
    val merges = ArrayBuffer.empty[(Long, String, String, Long)]
    val raw = vocab(documents).persist()
    val nVocab = raw.count()
    val parts = math.min(
      math.max(1L, (nVocab + wordsPerPartition - 1L) / wordsPerPartition),
      Int.MaxValue.toLong).toInt
    var v = raw.coalesce(parts).persist()
    v.count() // materialize the compacted cache from raw's, then drop raw's
    raw.unpersist()
    // one action per iteration: the argmax collect also materializes the
    // current round's persist, after which the previous round's cache (its
    // parent) can go — no separate count() job per round
    var prev: Option[DataFrame] = None
    for (i <- 0 until nMerges) {
      val top = pairCounts(v).orderBy(desc("cnt"), col("a"), col("b")).limit(1).collect()
      prev.foreach(_.unpersist())
      if (top.nonEmpty) {
        val (a, b, c) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        merges += ((i.toLong, a, b, c))
        // symbols are [a-z]+ by construction — safe to inline as literals
        val nv = v.withColumn("sym",
          trim(expr(s"replace(concat(' ', sym, ' '), ' $a $b ', ' $a$b ')"))).persist()
        prev = Some(v)
        v = nv
      }
    }
    (v, merges.toSeq)
  }

  /** Registered training query: the merge table — one row per iteration,
    * (it, sym_a, sym_b, merged, pair_count). Always trains (this IS the
    * training query; memoizing it would misreport its bench cost). */
  def bpeTrain(spark: SparkSession, documents: DataFrame, nMerges: Int = 10): DataFrame = {
    import spark.implicits._
    val (v, merges) = train(documents, nMerges)
    v.unpersist()
    merges.map { case (it, a, b, c) => (it, a, b, a + b, c) }
      .toDF("it", "sym_a", "sym_b", "merged", "pair_count")
  }

  /** Train-once artifact cache: the merge list is a bounded driver-side
    * model parameter (nMerges tuples — the PQ-codebook precedent), so
    * consumers (bpe_encode, tokenizer_fertility) look it up instead of
    * re-running the 10-argmax-collect training loop per query. Production
    * reads the same table from storage; here it's keyed by (session,
    * semantic plan hash of the corpus, nMerges) so distinct corpora and
    * merge counts never share artifacts. */
  private val mergeCache =
    scala.collection.concurrent.TrieMap.empty[(String, Int, Int), Seq[(Long, String, String, Long)]]

  def mergesFor(documents: DataFrame, nMerges: Int = 10): Seq[(Long, String, String, Long)] = {
    val key = (documents.sparkSession.sparkContext.applicationId,
      documents.queryExecution.analyzed.semanticHash(), nMerges)
    mergeCache.getOrElseUpdate(key, {
      val (v, merges) = train(documents, nMerges)
      v.unpersist()
      merges
    })
  }

  /** Replay a trained merge list over a vocab: the same one-pass
    * left-to-right replaces training applied, chained into ONE narrow
    * codegen'd projection — reapplying a persisted merge table costs a
    * single vocab pass, which is why consumers don't retrain. */
  def applyMerges(v: DataFrame, merges: Seq[(Long, String, String, Long)]): DataFrame =
    merges.foldLeft(v) { case (df, (_, a, b, _)) =>
      df.withColumn("sym",
        trim(expr(s"replace(concat(' ', sym, ' '), ' $a $b ', ' $a$b ')")))
    }

  /** Encode the corpus with the trained merges: per doc, the word count and
    * the post-BPE symbol count (the tokens-per-doc number that drives
    * packing/pricing). Consumes the train-once merge artifact (mergesFor) —
    * encoding pays one vocab groupBy + one chained-replace projection, not
    * a retrain. Corpus words join the trained vocab — broadcast here; at
    * vocab sizes beyond the broadcast threshold this becomes a shuffle
    * join on `word`, still O(corpus tokens). */
  def bpeEncode(documents: DataFrame, nMerges: Int = 10): DataFrame = {
    val v = applyMerges(vocab(documents), mergesFor(documents, nMerges))
    val words = documents
      .select(col("doc_id"),
        explode(split(lower(trim(col("text"))), "\\s+")).as("word"))
      .filter(col("word").rlike(WordPat))
    val out = words
      .join(broadcast(v.select(col("word"),
        size(split(col("sym"), " ")).cast("long").as("n_sym"))), "word")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_words"), sum(col("n_sym")).as("n_syms"))
    out
  }

  /** Tokenizer fertility per language — symbols emitted per word under the
    * trained merges (the metric that decides whether a tokenizer is wasting
    * sequence length on a language; fertility 1.0 = every word is one
    * token). Rolls bpeEncode's per-doc counts up by lang (sharing its
    * train-once artifact); the single bigint/bigint division is IEEE-exact
    * on both engines. */
  def fertility(documents: DataFrame, nMerges: Int = 10): DataFrame =
    bpeEncode(documents, nMerges)
      .join(documents.select(col("doc_id"), col("lang")), "doc_id")
      .groupBy(col("lang"))
      .agg(sum(col("n_words")).as("n_words"), sum(col("n_syms")).as("n_syms"))
      .withColumn("fertility",
        col("n_syms").cast("double") / col("n_words").cast("double"))

  def fertilitySql(nMerges: Int = 10): String =
    s"""WITH enc AS (${bpeEncodeSql(nMerges)})
       |SELECT d.lang,
       |  CAST(SUM(enc.n_words) AS BIGINT) AS n_words,
       |  CAST(SUM(enc.n_syms) AS BIGINT) AS n_syms,
       |  CAST(SUM(enc.n_syms) AS DOUBLE) / CAST(SUM(enc.n_words) AS DOUBLE) AS fertility
       |FROM enc JOIN documents d ON enc.doc_id = d.doc_id
       |GROUP BY d.lang""".stripMargin

  // ---- DuckDB oracle: replay the training loop CTE-by-CTE ----

  private def baseSql: String =
    s"""w AS MATERIALIZED (
       |  SELECT unnest(string_split_regex(lower(trim(text)), '\\s+')) AS word
       |  FROM documents),
       |v_0 AS MATERIALIZED (
       |  SELECT word, CAST(COUNT(*) AS BIGINT) AS n,
       |         trim(regexp_replace(word, '(.)', '\\1 ', 'g')) AS sym
       |  FROM w WHERE regexp_matches(word, '$WordPat') GROUP BY word)""".stripMargin

  /** Iteration CTEs: p_i = weighted positional pair counts over v_i;
    * b_i = argmax pair (cnt desc, a, b); v_{i+1} = one-pass replace. */
  private def stepSql(i: Int): String =
    s"""p_$i AS (
       |  SELECT t[j] AS a, t[j+1] AS b, CAST(SUM(n) AS BIGINT) AS cnt
       |  FROM (
       |    SELECT n, t, unnest(range(1, len(t))) AS j
       |    FROM (SELECT n, string_split(sym, ' ') AS t FROM v_$i))
       |  GROUP BY 1, 2),
       |b_$i AS MATERIALIZED (
       |  SELECT a, b, cnt FROM p_$i ORDER BY cnt DESC, a, b LIMIT 1),
       |v_${i + 1} AS MATERIALIZED (
       |  SELECT word, n,
       |    trim(replace(' ' || sym || ' ',
       |      ' ' || (SELECT a FROM b_$i) || ' ' || (SELECT b FROM b_$i) || ' ',
       |      ' ' || (SELECT a FROM b_$i) || (SELECT b FROM b_$i) || ' ')) AS sym
       |  FROM v_$i)""".stripMargin

  def bpeTrainSql(nMerges: Int = 10): String = {
    val steps = (0 until nMerges).map(stepSql).mkString(",\n")
    val rows = (0 until nMerges).map { i =>
      s"SELECT CAST($i AS BIGINT) AS it, a AS sym_a, b AS sym_b, a || b AS merged, cnt AS pair_count FROM b_$i"
    }.mkString("\nUNION ALL\n")
    s"WITH $baseSql,\n$steps\n$rows"
  }

  def bpeEncodeSql(nMerges: Int = 10): String = {
    val steps = (0 until nMerges).map(stepSql).mkString(",\n")
    s"""WITH $baseSql,
       |$steps,
       |dw AS (
       |  SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '\\s+')) AS word
       |  FROM documents),
       |fdw AS (SELECT doc_id, word FROM dw WHERE regexp_matches(word, '$WordPat'))
       |SELECT f.doc_id, CAST(COUNT(*) AS BIGINT) AS n_words,
       |       CAST(SUM(len(string_split(v.sym, ' '))) AS BIGINT) AS n_syms
       |FROM fdw f JOIN v_$nMerges v ON f.word = v.word
       |GROUP BY f.doc_id""".stripMargin
  }
}
