package graft.operators

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Term-level statistics — the inverted-index / feature-extraction building
  * blocks (TF, DF, TF-IDF). explode → groupBy is the canonical two-shuffle
  * shape; document counts broadcast back for scoring.
  */
object TermStats {

  /** Global top-N term frequencies (the word-count of LLM-corpus tooling). */
  def termFreq(documents: DataFrame, topN: Int = 20): DataFrame =
    documents
      .select(explode(split(trim(col("text")), "\\s+")).as("term"))
      .groupBy(col("term"))
      .agg(count(lit(1)).as("tf"))
      .orderBy(desc("tf"), col("term"))
      .limit(topN)

  def termFreqSql(topN: Int = 20): String =
    s"""SELECT term, COUNT(*) AS tf FROM (
       |  SELECT unnest(string_split_regex(trim(text), '\\s+')) AS term FROM documents)
       |GROUP BY term ORDER BY tf DESC, term LIMIT $topN""".stripMargin

  /** Vocabulary coverage / OOV rate per language — the tokenizer
    * diagnostic every pretraining pipeline tracks: fix the top-N corpus
    * vocabulary (a bounded model artifact, broadcast), then measure the
    * fraction of tokens it covers. One explode pass, one tiny top-N, one
    * broadcast probe — no corpus-sized shuffle. */
  def vocabCoverage(documents: DataFrame, vocabSize: Int = 15): DataFrame = {
    val toks = documents.select(
      col("lang"), explode(split(trim(col("text")), "\\s+")).as("tok"))
    val vocab = toks.groupBy(col("tok")).agg(count(lit(1)).as("c"))
      .orderBy(desc("c"), col("tok")).limit(vocabSize)
      .select(col("tok"), lit(true).as("in_vocab"))
    toks.join(broadcast(vocab), Seq("tok"), "left")
      .groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n_tokens"),
        sum(when(col("in_vocab").isNotNull, 1L).otherwise(0L)).as("n_covered"))
      .withColumn("oov_rate",
        lit(1.0) - col("n_covered").cast("double") / col("n_tokens").cast("double"))
  }

  def vocabCoverageSql(vocabSize: Int = 15): String =
    s"""WITH toks AS (
       |  SELECT lang, unnest(string_split_regex(trim(text), '\\s+')) AS tok FROM documents),
       |vocab AS (
       |  SELECT tok FROM (SELECT tok, COUNT(*) AS c FROM toks GROUP BY 1)
       |  ORDER BY c DESC, tok LIMIT $vocabSize),
       |j AS (
       |  SELECT t.lang, CASE WHEN v.tok IS NOT NULL THEN 1 ELSE 0 END AS cov
       |  FROM toks t LEFT JOIN vocab v ON t.tok = v.tok)
       |SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_tokens,
       |  CAST(SUM(cov) AS BIGINT) AS n_covered,
       |  1.0 - CAST(SUM(cov) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS oov_rate
       |FROM j GROUP BY lang""".stripMargin

  /** TF-IDF-style scores per (doc, term), log-free: score = tf · N / df
    * (rational arithmetic — engine-exact; a log() variant differs in last
    * ulp across libm implementations). Top terms per doc for the heaviest
    * documents. */
  def tfidf(documents: DataFrame, minTf: Int = 3): DataFrame = {
    val terms = documents
      .select(col("doc_id"), explode(split(trim(col("text")), "\\s+")).as("term"))
    val tf = terms.groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    val df = terms.select(col("doc_id"), col("term")).distinct()
      .groupBy(col("term")).agg(count(lit(1)).as("df"))
    val n = documents.agg(count(lit(1)).as("n_docs"))
    tf.filter(col("tf") >= minTf)
      .join(df, "term")
      .crossJoin(broadcast(n))
      .select(
        col("doc_id"), col("term"), col("tf"), col("df"),
        (col("tf").cast("double") * col("n_docs").cast("double") / col("df").cast("double"))
          .as("score"))
  }

  def tfidfSql(minTf: Int = 3): String =
    s"""WITH terms AS (
       |  SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS term FROM documents),
       |tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM terms GROUP BY doc_id, term),
       |dfx AS (SELECT term, COUNT(*) AS df FROM (SELECT DISTINCT doc_id, term FROM terms) GROUP BY term),
       |n AS (SELECT COUNT(*) AS n_docs FROM documents)
       |SELECT tf.doc_id, tf.term, tf.tf, dfx.df,
       |CAST(tf.tf AS DOUBLE) * CAST(n.n_docs AS DOUBLE) / CAST(dfx.df AS DOUBLE) AS score
       |FROM tf JOIN dfx USING (term) CROSS JOIN n
       |WHERE tf.tf >= $minTf""".stripMargin

  /** Sparse TF-IDF cosine similarity pairs — the weighted-sparse-vector
    * twin of dedup_ngram_jaccard (set overlap → weighted overlap): docs as
    * sparse term→weight maps with rational idf = N/df (no libm, tfidf
    * precedent), blocked by (lang, source).
    *
    * Candidate generation is ALL-PAIRS PREFIX FILTERING (Bayardo,Ma &
    * Srikant, "Scaling Up All Pairs Similarity Search", WWW'07) — an EXACT
    * bound, not a heuristic: order every doc's terms by global df
    * descending, accumulate the running similarity upper bound
    * b(t) = Σ_{t'≤t} x[t']·maxw(t') over the unit-normalized weights
    * (maxw = the corpus max of that term's normalized weight), and index
    * a posting only once b ≥ minCos. If two docs have cos ≥ minCos, the
    * smaller doc MUST index a shared term (if every shared term sat in
    * its unindexed prefix, dot ≤ Σ_prefix x[t]·maxw(t) < minCos), so
    * joining the indexed postings of the smaller side against the full
    * postings of the larger loses nothing — and a stopword structurally
    * CANNOT fan out pairs: its per-doc contribution bound x·maxw is
    * negligible, it sorts first (df desc), lands in every unindexed
    * prefix, and its indexed posting list is EMPTY. The df²-quadratic
    * inverted-index trap is closed without changing a single output row
    * (SparseCosineSpec pins both: zero candidates through a planted
    * stopword-heavy block, and output identity on near-dups).
    *
    * Determinism: pair dots and norm sums are DECIMAL(38,18)-exact over the
    * doubles' shortest reprs (order-independent); the running bound is a
    * DECIMAL window sum over a total order (df desc, term), so no float
    * accumulation order can differ across engines; sqrt is IEEE-exact on
    * both engines, and the final divide is one correctly-rounded op. */
  def sparseCosine(documents: DataFrame, minCos: Double = 0.8): DataFrame = {
    require(minCos > 0.0 && minCos <= 1.0,
      s"minCos=$minCos out of (0,1]: at 0 the prefix bound never prunes and the join degenerates to all pairs")
    val (w, norms, cand) = sparseCosineParts(documents, minCos)
    // Pair dots over PACKED per-doc posting arrays, not a pair ⋈ postings
    // row join: the row spelling expands candidates × full vocab(doc_a)
    // (368M intermediate rows at the 10× tier for 15.9M candidates) and
    // shuffles that expansion into the term-match join. Packing collapses
    // postings to one array row per doc, the two pair joins carry arrays
    // instead of exploding, and a merge-intersection kernel emits ONLY the
    // shared-term products — which flow into the same DECIMAL(38,18)
    // aggregation as before, so the dot is bit-identical (decimal sums are
    // order-independent; the kernel sorts both sides with one comparator,
    // so the intersection is exact regardless of collect_list order).
    val spark = documents.sparkSession
    import spark.implicits._
    // Pre-sort each doc's postings ONCE at pack time (n_docs sorts) instead
    // of re-sorting both sides per candidate pair (2×candidates sorts —
    // 31.8M at the 10× tier vs 50k docs). The sort uses the SAME
    // String.compareTo the merge kernel compares with, so the
    // merge-intersection stays exact; a Spark-side sort_array would order
    // by UTF8 bytes, which diverges from compareTo outside ASCII.
    val packed = w.groupBy(col("doc_id"))
      .agg(collect_list(struct(col("term").as("_1"), col("w").as("_2"))).as("post"))
      .as[(Long, Seq[(String, Double)])]
      .mapPartitions(_.map { case (d, p) => (d, p.sortBy(_._1)) })
      .toDF("doc_id", "post")
    // The dot is accumulated INSIDE the kernel with java.math.BigDecimal at
    // the same scale-18 HALF_UP semantics as the dec38 SQL recipe: each
    // addend is the shortest-repr string of the double product re-read as
    // DECIMAL(38,18) (bit-identical to cast(cast(prod as string) as
    // decimal(38,18))), decimal addition is exact and order-independent,
    // and the final parseDouble of the exact decimal string is the same
    // correctly-rounded double the decimal→string→double cast produces.
    // This removes the per-shared-term product row stream entirely —
    // candidates × ~|shared terms| rows (≈270M at the 10× tier) no longer
    // shuffle into a decimal hash aggregate; the kernel emits ONE row per
    // candidate pair. A zero-shared-terms pair emits dot=0 and is dropped
    // by the cos ≥ minCos filter exactly as its absent-row spelling was.
    val dots = cand
      .join(packed.select(col("doc_id").as("doc_a"), col("post").as("pa")), "doc_a")
      .join(packed.select(col("doc_id").as("doc_b"), col("post").as("pb")), "doc_b")
      .select(col("doc_a"), col("doc_b"), col("pa"), col("pb"))
      .as[(Long, Long, Seq[(String, Double)], Seq[(String, Double)])]
      .mapPartitions { it =>
        it.map { case (a, b, pa, pb) =>
          val sa = pa.toArray // pre-sorted by term at pack time
          val sb = pb.toArray
          var acc = java.math.BigDecimal.ZERO
          var i = 0; var j = 0
          while (i < sa.length && j < sb.length) {
            val c = sa(i)._1.compareTo(sb(j)._1)
            if (c == 0) {
              acc = acc.add(new java.math.BigDecimal(
                  java.lang.Double.toString(sa(i)._2 * sb(j)._2))
                .setScale(18, java.math.RoundingMode.HALF_UP))
              i += 1; j += 1
            } else if (c < 0) i += 1
            else j += 1
          }
          (a, b, java.lang.Double.parseDouble(acc.toPlainString))
        }
      }
      .toDF("doc_a", "doc_b", "dot")
    dots
      .join(norms.select(col("doc_id").as("doc_a"), col("norm").as("na")), "doc_a")
      .join(norms.select(col("doc_id").as("doc_b"), col("norm").as("nb")), "doc_b")
      .select(col("doc_a"), col("doc_b"), (col("dot") / (col("na") * col("nb"))).as("cos"))
      .filter(col("cos") >= minCos)
  }

  /** Candidate pairs only — exposed so SparseCosineSpec can pin the
    * sub-quadratic bound (a stopword-heavy block yields ZERO candidates,
    * not merely zero post-filter rows). */
  def sparseCosineCandidates(documents: DataFrame, minCos: Double = 0.8): DataFrame =
    sparseCosineParts(documents, minCos)._3

  private def dec38(c: org.apache.spark.sql.Column) = c.cast("string").cast("decimal(38,18)")

  private def sparseCosineParts(documents: DataFrame, minCos: Double)
      : (DataFrame, DataFrame, DataFrame) = {
    import org.apache.spark.sql.expressions.Window
    val terms = documents.select(
      col("doc_id"), col("lang"), col("source"),
      explode(split(trim(col("text")), "\\s+")).as("term"))
    val tf = terms.groupBy(col("doc_id"), col("lang"), col("source"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val df = terms.select(col("doc_id"), col("term")).distinct()
      .groupBy(col("term")).agg(count(lit(1)).as("df"))
    val n = documents.agg(count(lit(1)).as("n_docs"))
    // materialize: the weighted posting table feeds FIVE consumers (norms,
    // the normalized-weight table, the candidate probe side, both dot
    // sides); without it the tf⋈df pipeline re-executes per consumer
    // (ReuseExchange only dedups the exchange, not the upstream joins).
    // Same cluster-safety gate as GraphOps: spark.graft.reliableCheckpoint
    // switches to checkpoint().
    val gate = documents.sparkSession.conf
      .get("spark.graft.reliableCheckpoint", "false").toBoolean
    val w0 = tf.join(df, "term").crossJoin(broadcast(n))
      .select(col("doc_id"), col("lang"), col("source"), col("term"), col("df"),
        (col("tf").cast("double") * col("n_docs").cast("double") / col("df").cast("double"))
          .as("w"))
    val w = if (gate) w0.checkpoint() else w0.localCheckpoint()
    val norms = w.groupBy(col("doc_id"))
      .agg(sum(dec38(col("w") * col("w"))).cast("string").cast("double").as("nsq"))
      .select(col("doc_id"), sqrt(col("nsq")).as("norm"))
    // unit-normalized weights (feeds maxw + the running bound)
    val nw0 = w.join(norms, "doc_id")
      .select(col("doc_id"), col("lang"), col("source"), col("term"), col("df"),
        (col("w") / col("norm")).as("x"))
    val nw = if (gate) nw0.checkpoint() else nw0.localCheckpoint()
    val maxw = nw.groupBy(col("term")).agg(max(col("x")).as("mw"))
    // running upper bound over the GLOBAL term order (df desc, term):
    // per-doc window — partitioned by doc_id, frame bounded by doc vocab
    val win = Window.partitionBy(col("doc_id"))
      .orderBy(col("df").desc, col("term"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val bnd = nw.join(maxw, "term")
      .withColumn("b", sum(dec38(col("x") * col("mw"))).over(win))
    val idx = bnd.filter(col("b") >= lit(minCos.toString).cast("decimal(38,18)"))
      .select(col("doc_id"), col("lang"), col("source"), col("term"))
    // index ⋈ INDEX, not index ⋈ full postings (Bayardo's symmetric
    // argument): take t* = the globally-LAST shared term (df asc within
    // the bound's df-desc order). If t* sat in a's unindexed prefix, every
    // shared term would (the prefix is a downward-closed head of the
    // global order restricted to a's vocab), so dot ≤ b(prefix) < minCos —
    // hence t* is indexed by a, and symmetrically by b. Joining the two
    // indexed suffixes is therefore lossless and quadratically smaller
    // than suffix × full vocab (measured at the 10× tier: 16.0M → fewer
    // candidates, same 810.9k output rows — SparseCosineSpec pins output
    // identity and the planted-stopword zero-candidate gate).
    val cand = idx.as("i")
      .join(idx.as("p"),
        col("i.term") === col("p.term") && col("i.lang") === col("p.lang") &&
          col("i.source") === col("p.source") && col("i.doc_id") < col("p.doc_id"))
      .select(col("i.doc_id").as("doc_a"), col("p.doc_id").as("doc_b"))
      .distinct()
    (w, norms, cand)
  }

  def sparseCosineSql(minCos: Double = 0.8): String =
    s"""WITH terms AS (
       |  SELECT doc_id, lang, source, unnest(string_split_regex(trim(text), '\\s+')) AS term
       |  FROM documents),
       |tf AS (SELECT doc_id, lang, source, term, COUNT(*) AS tf
       |       FROM terms GROUP BY doc_id, lang, source, term),
       |dfx AS (SELECT term, COUNT(*) AS df FROM
       |       (SELECT DISTINCT doc_id, term FROM terms) GROUP BY term),
       |n AS (SELECT COUNT(*) AS n_docs FROM documents),
       |w AS MATERIALIZED (
       |  SELECT tf.doc_id, tf.lang, tf.source, tf.term, dfx.df,
       |    CAST(tf.tf AS DOUBLE) * CAST(n.n_docs AS DOUBLE) / CAST(dfx.df AS DOUBLE) AS w
       |  FROM tf JOIN dfx USING (term) CROSS JOIN n),
       |norms AS (
       |  SELECT doc_id, sqrt(CAST(CAST(SUM(CAST(CAST(w * w AS VARCHAR) AS DECIMAL(38,18)))
       |    AS VARCHAR) AS DOUBLE)) AS norm
       |  FROM w GROUP BY doc_id),
       |nw AS MATERIALIZED (
       |  SELECT w.doc_id, w.lang, w.source, w.term, w.df, w.w,
       |    w.w / norms.norm AS x
       |  FROM w JOIN norms USING (doc_id)),
       |maxw AS (SELECT term, MAX(x) AS mw FROM nw GROUP BY term),
       |bnd AS (
       |  SELECT nw.doc_id, nw.lang, nw.source, nw.term,
       |    SUM(CAST(CAST(nw.x * maxw.mw AS VARCHAR) AS DECIMAL(38,18)))
       |      OVER (PARTITION BY nw.doc_id ORDER BY nw.df DESC, nw.term
       |            ROWS UNBOUNDED PRECEDING) AS b
       |  FROM nw JOIN maxw USING (term)),
       |idx AS (SELECT doc_id, lang, source, term FROM bnd
       |        WHERE b >= CAST('$minCos' AS DECIMAL(38,18))),
       |cand AS (
       |  SELECT DISTINCT i.doc_id AS doc_a, p.doc_id AS doc_b
       |  FROM idx i JOIN w p ON p.term = i.term AND p.lang = i.lang
       |    AND p.source = i.source AND i.doc_id < p.doc_id),
       |dots AS (
       |  SELECT c.doc_a, c.doc_b,
       |    CAST(CAST(SUM(CAST(CAST(a.w * b.w AS VARCHAR) AS DECIMAL(38,18)))
       |      AS VARCHAR) AS DOUBLE) AS dot
       |  FROM cand c
       |  JOIN w a ON a.doc_id = c.doc_a
       |  JOIN w b ON b.doc_id = c.doc_b AND b.term = a.term
       |  GROUP BY c.doc_a, c.doc_b)
       |SELECT doc_a, doc_b, dot / (na.norm * nb.norm) AS cos
       |FROM dots
       |JOIN norms na ON na.doc_id = doc_a
       |JOIN norms nb ON nb.doc_id = doc_b
       |WHERE dot / (na.norm * nb.norm) >= $minCos""".stripMargin

  /** Per-doc top-k sparse-cosine neighbors — the BOUNDED-OUTPUT form of
    * [[sparseCosine]]. All-pairs output is the right contract for a dedup
    * resolution pass, but a 100 TB corpus with clique-dense near-dups
    * produces O(Σ clique²) pairs — unbounded by corpus size (the 10×
    * stress corpus legitimately emits 811 k pairs from 50 k docs). A
    * retrieval/curation sink wants each doc's k best neighbors instead:
    * output ≤ k·N rows no matter how pathological the duplicate structure.
    *
    * Plan shape: the exact All-Pairs candidate+dot pipeline is reused
    * verbatim (same losslessness bound), then pairs symmetrize (each
    * undirected pair ranks in BOTH endpoints' lists) and the native
    * bounded [[graft.functions.TopKAgg]] aggregate takes over — map-side
    * partial top-k means the post-dot shuffle is O(N·k), not O(pairs); a
    * window row_number here would re-shuffle and fully sort every pair.
    * Ordering ties are deterministic (cos DESC, neighbor_id ASC), and cos
    * doubles are bit-identical across engines (the decimal-exact dot/norm
    * recipe of sparseCosine), so rank numbers hash-match DuckDB's window
    * formulation exactly. */
  def sparseTopK(documents: DataFrame, minCos: Double = 0.8, k: Int = 5): DataFrame = {
    require(k >= 1 && k <= 1000, s"k=$k out of [1,1000]: per-doc neighbor lists are a bounded sink contract")
    val pairs = sparseCosine(documents, minCos)
    // Symmetrize via one explode, not a self-union: a union would put the
    // candidate+dot pipeline in the plan twice and lean on ReuseExchange to
    // dedup it; explode guarantees single execution by construction.
    val sym = pairs
      .select(explode(array(
        struct(col("doc_a").as("doc_id"), col("doc_b").as("neighbor_id"), col("cos")),
        struct(col("doc_b").as("doc_id"), col("doc_a").as("neighbor_id"), col("cos")))).as("e"))
      .select(col("e.doc_id"), col("e.neighbor_id"), col("e.cos"))
    sym.groupBy(col("doc_id"))
      .agg(graft.functions.TopKAgg.topK(col("cos"), col("neighbor_id"), k).as("topk"))
      .select(col("doc_id"), posexplode(col("topk")))
      .select(col("doc_id"), col("col.id").as("neighbor_id"),
        (col("pos") + 1).cast("long").as("rn"), col("col.score").as("cos"))
  }

  def sparseTopKSql(minCos: Double = 0.8, k: Int = 5): String =
    s"""WITH pairs AS MATERIALIZED (
       |  SELECT doc_a, doc_b, cos FROM (
       |${sparseCosineSql(minCos)})),
       |sym AS (
       |  SELECT doc_a AS doc_id, doc_b AS neighbor_id, cos FROM pairs
       |  UNION ALL
       |  SELECT doc_b AS doc_id, doc_a AS neighbor_id, cos FROM pairs)
       |SELECT doc_id, neighbor_id,
       |  CAST(ROW_NUMBER() OVER (PARTITION BY doc_id
       |    ORDER BY cos DESC, neighbor_id) AS BIGINT) AS rn,
       |  cos
       |FROM sym
       |QUALIFY rn <= $k""".stripMargin

  /** Edit-distance near-dup pairs. Candidate generation is the df-capped
    * RARE-SHINGLE inverted index (Containment.scala's bounded pattern):
    * two docs are compared ONLY if they share a shingle that ≤ maxDf docs
    * of their language contain AND they sit in the same (lang, length-
    * bucket) block — so a block full of unrelated same-length docs
    * generates nothing, per-shingle fan-out is ≤ maxDf², and total cost
    * tracks true shared-content density (output-sensitive), never block².
    * The sf1 scale-stress exposed the previous unfiltered block self-join
    * as the repo's last quadratic plan (100× cost at 10× data); no
    * LOSSLESS prefilter exists at τ/prefix = 12/30 (q-gram / PassJoin
    * count filtering is vacuous at 40% relative distance), so the gate is
    * the same recall-justified screen every other dedup operator uses:
    * docs within a small edit distance share rare shingles unless every
    * edit lands on them. Verification is then Levenshtein on a fixed
    * prefix — identical DP semantics in both engines (banded: the
    * threshold variant early-exits at O(len·k) per pair, returning -1
    * past the threshold). */
  def editDistancePairs(documents: DataFrame, prefixLen: Int = 30, maxDist: Int = 12,
                        lenBucket: Int = 64, w: Int = 3, maxDf: Int = 50): DataFrame = {
    require(prefixLen > 0 && maxDist >= 0 && lenBucket > 0 && w > 0 && maxDf > 0,
      s"bad params prefixLen=$prefixLen maxDist=$maxDist lenBucket=$lenBucket w=$w maxDf=$maxDf")
    val spark = documents.sparkSession
    import spark.implicits._
    val sh = documents.select(col("doc_id"), col("lang"),
        (col("n_chars") / lenBucket).cast("long").as("len_b"), col("text"))
      .as[(Long, String, Long, String)]
      .mapPartitions { iter =>
        iter.flatMap { case (docId, lang, lenB, text) =>
          Dedup.shinglesOf(text, w).map(s => (docId, lang, lenB, Dedup.hashShingle(s)))
        }
      }
      .toDF("doc_id", "lang", "len_b", "s").distinct()
    val rareKeys = sh.groupBy(col("lang"), col("s"))
      .agg(count(lit(1)).as("df")).filter(col("df") <= maxDf)
      .select(col("lang"), col("s"))
    val rare = sh.join(rareKeys, Seq("lang", "s"))
    val cand = rare.as("a")
      .join(rare.as("b"),
        col("a.lang") === col("b.lang") && col("a.s") === col("b.s") &&
          col("a.len_b") === col("b.len_b") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    val p = documents.select(col("doc_id"), substring(col("text"), 1, prefixLen).as("p"))
    cand
      .join(p.select(col("doc_id").as("doc_a"), col("p").as("pa")), "doc_a")
      .join(p.select(col("doc_id").as("doc_b"), col("p").as("pb")), "doc_b")
      // lev(x,y) >= |len(x)-len(y)| — a theorem, so this prune can never
      // change the result; it just skips the DP for hopeless pairs
      .filter(abs(length(col("pa")) - length(col("pb"))) <= maxDist)
      // banded levenshtein: the threshold variant early-exits at O(len·k)
      // per pair instead of O(len²), returning -1 past the threshold
      .withColumn("dist", levenshtein(col("pa"), col("pb"), maxDist).cast("long"))
      .filter(col("dist") >= 0)
      .select(col("doc_a"), col("doc_b"), col("dist"))
  }

  /** Exact top-k heavy hitters (token bigrams) via the two-pass
    * Misra-Gries pattern — the 100 TB formulation of "top terms": a full
    * groupBy over every bigram shuffles the whole token stream; instead
    * pass 1 runs a BOUNDED Misra-Gries summary per partition (mapPartitions,
    * ≤`cap` candidates each, classic mergeable-sketch guarantee: any item
    * with partition frequency > n_p/cap survives), pass 2 recounts ONLY the
    * candidate set exactly (semi-join before the aggregate, so the shuffle
    * carries candidate matches, not the full stream). The final top-k is
    * EXACT whenever the candidate union covers the true top-k. Coverage
    * regime: MG keeps any item with partition frequency > n_p/cap, so on
    * Zipf-shaped real corpora a small cap suffices; the synthetic test
    * bigrams are near-UNIFORM (~930 distinct, MG's adversarial case), so
    * cap=4096 > cardinality makes the summary lossless here — the bounded-
    * memory plumbing is what's under test. The DuckDB oracle is the plain
    * exact top-k, so the equality is hash-proven. Ties break by bigram
    * text ascending. */
  def heavyHitters(documents: DataFrame, k: Int = 25, cap: Int = 4096): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    val cands = documents.select(col("text")).as[String]
      .mapPartitions { iter =>
        val counts = scala.collection.mutable.HashMap.empty[String, Long]
        iter.foreach { text =>
          val toks = text.trim.toLowerCase.split("\\s+")
          var i = 0
          while (i < toks.length - 1) {
            val bg = toks(i) + " " + toks(i + 1)
            counts.get(bg) match {
              case Some(c) => counts.update(bg, c + 1)
              case None =>
                if (counts.size < cap) counts.update(bg, 1L)
                else {
                  // decrement-all step: drop every count by one, evict zeros
                  val dead = ArrayBuffer.empty[String]
                  counts.foreach { case (key, c) =>
                    if (c == 1L) dead += key else counts.update(key, c - 1)
                  }
                  dead.foreach(counts.remove)
                }
            }
            i += 1
          }
        }
        counts.keysIterator
      }
      .toDF("bg").distinct()
    // the candidate union is a bounded model artifact (≤ cap per partition;
    // O(k) on Zipf corpora) — collect + broadcast it, then recount in the
    // same narrow kernel: per-partition partial counts over candidates
    // only, so the shuffle carries |candidates|·|partitions| counters and
    // the per-bigram HOF explode (CodegenFallback, interpreted) never runs
    val bc = spark.sparkContext.broadcast(cands.as[String].collect().toSet)
    documents.select(col("text")).as[String]
      .mapPartitions { iter =>
        val cs = bc.value
        val m = scala.collection.mutable.HashMap.empty[String, Long]
        iter.foreach { text =>
          val toks = text.trim.toLowerCase.split("\\s+")
          var i = 0
          while (i < toks.length - 1) {
            val bg = toks(i) + " " + toks(i + 1)
            if (cs.contains(bg)) m.update(bg, m.getOrElse(bg, 0L) + 1L)
            i += 1
          }
        }
        m.iterator
      }
      .toDF("bg", "c")
      .groupBy(col("bg")).agg(sum(col("c")).as("cnt"))
      .orderBy(desc("cnt"), col("bg"))
      .limit(k)
  }

  def heavyHittersSql(k: Int = 25): String =
    """WITH tk AS (
      |  SELECT string_split_regex(lower(trim(text)), '\s+') AS t FROM documents),
      |bg AS (
      |  SELECT unnest(list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1])) AS bg
      |  FROM tk WHERE len(t) >= 2)
      |SELECT bg, CAST(COUNT(*) AS BIGINT) AS cnt FROM bg GROUP BY bg
      |ORDER BY cnt DESC, bg LIMIT """.stripMargin + k

  /** DuckDB replay over raw shingle strings (Spark joins 64-bit shingle
    * hashes — counts agree unless two distinct shingles collide, odds
    * ≈ n²/2⁶⁵; the Containment oracle precedent). The collision exposure
    * runs BOTH directions: an equality-join collision can add a candidate
    * pair only Spark sees, and a collision can also merge two distinct
    * shingles' df counts past `maxDf` on the Spark side, dropping a
    * candidate only the oracle keeps. Both have the same ≈ n²/2⁶⁵ odds;
    * if either ever fires at scale, compute df on (lang, raw shingle)
    * before hashing. Short docs (< w tokens): shinglesSqlFromToks's
    * concat_ws skips out-of-range NULLs, degrading to the same single
    * partial shingle shinglesOf emits, so no length filter is applied
    * here — both engines shingle every doc. */
  def editDistancePairsSql(prefixLen: Int = 30, maxDist: Int = 12, lenBucket: Int = 64,
                           w: Int = 3, maxDf: Int = 50): String =
    s"""WITH tk AS (
       |  SELECT doc_id, lang, n_chars // $lenBucket AS len_b,
       |    string_split_regex(trim(text), '\\s+') AS t,
       |    substr(text, 1, $prefixLen) AS p
       |  FROM documents),
       |shx AS (
       |  SELECT doc_id, lang, len_b,
       |    unnest(${Dedup.shinglesSqlFromToks("t", w)}) AS s
       |  FROM tk),
       |sh AS (SELECT DISTINCT doc_id, lang, len_b, s FROM shx),
       |rare AS (
       |  SELECT sh.doc_id, sh.lang, sh.len_b, sh.s FROM sh
       |  JOIN (SELECT lang, s FROM sh GROUP BY 1, 2 HAVING COUNT(*) <= $maxDf) r
       |    ON sh.lang = r.lang AND sh.s = r.s),
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM rare a JOIN rare b ON a.lang = b.lang AND a.s = b.s
       |    AND a.len_b = b.len_b AND a.doc_id < b.doc_id),
       |pfx AS (SELECT doc_id, substr(text, 1, $prefixLen) AS p FROM documents)
       |SELECT c.doc_a, c.doc_b, CAST(levenshtein(pa.p, pb.p) AS BIGINT) AS dist
       |FROM cand c
       |JOIN pfx pa ON pa.doc_id = c.doc_a
       |JOIN pfx pb ON pb.doc_id = c.doc_b
       |WHERE abs(length(pa.p) - length(pb.p)) <= $maxDist
       |  AND levenshtein(pa.p, pb.p) <= $maxDist""".stripMargin

  /** Term drift between corpus snapshots — the topic-shift monitor every
    * continuously-crawled corpus runs: split the corpus into old/new
    * halves (doc_id parity ≙ snapshot id), count each term in both, and
    * rank by the normalized rate ratio drift = (c_new·t_old)/(c_old·t_new)
    * — 1.0 means stable, far from 1 (either way) means the term's share
    * moved. Magnitude = max(drift, 1/drift) sorts risers and faders
    * together. One explode + term groupBy + two broadcast scalars; ratios
    * are single IEEE divisions of exact integers. */
  def termDrift(documents: DataFrame, minCount: Int = 20, topN: Int = 20): DataFrame = {
    val toks = documents.select(pmod(col("doc_id"), lit(2L)).as("half"),
      explode(split(trim(col("text")), "\\s+")).as("term"))
    val counts = toks.groupBy(col("term")).agg(
      sum(when(col("half") === 0L, 1L).otherwise(0L)).as("c_old"),
      sum(when(col("half") === 1L, 1L).otherwise(0L)).as("c_new"))
    val totals = counts.agg(sum(col("c_old")).as("t_old"), sum(col("c_new")).as("t_new"))
    counts
      .filter(col("c_old") + col("c_new") >= minCount &&
        col("c_old") > 0L && col("c_new") > 0L)
      .crossJoin(broadcast(totals))
      .withColumn("drift_x", (col("c_new") * col("t_old")).cast("double") /
        (col("c_old") * col("t_new")).cast("double"))
      .withColumn("mag", greatest(col("drift_x"), lit(1.0) / col("drift_x")))
      .select(col("term"), col("c_old"), col("c_new"), col("drift_x"), col("mag"))
      .orderBy(desc("mag"), col("term"))
      .limit(topN)
  }

  def termDriftSql(minCount: Int = 20, topN: Int = 20): String =
    s"""WITH toks AS (
       |  SELECT doc_id % 2 AS half,
       |    unnest(string_split_regex(trim(text), '\\s+')) AS term
       |  FROM documents),
       |c AS (
       |  SELECT term,
       |    CAST(SUM(CASE WHEN half = 0 THEN 1 ELSE 0 END) AS BIGINT) AS c_old,
       |    CAST(SUM(CASE WHEN half = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c_new
       |  FROM toks GROUP BY 1),
       |t AS (SELECT CAST(SUM(c_old) AS BIGINT) AS t_old,
       |             CAST(SUM(c_new) AS BIGINT) AS t_new FROM c)
       |SELECT term, c_old, c_new,
       |  CAST(c_new * t_old AS DOUBLE) / CAST(c_old * t_new AS DOUBLE) AS drift_x,
       |  GREATEST(CAST(c_new * t_old AS DOUBLE) / CAST(c_old * t_new AS DOUBLE),
       |           1.0 / (CAST(c_new * t_old AS DOUBLE) / CAST(c_old * t_new AS DOUBLE)))
       |    AS mag
       |FROM c CROSS JOIN t
       |WHERE c_old + c_new >= $minCount AND c_old > 0 AND c_new > 0
       |ORDER BY mag DESC, term LIMIT $topN""".stripMargin
}
