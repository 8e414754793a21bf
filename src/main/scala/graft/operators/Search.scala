package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.VectorOps

/** Search family: keyword search, heuristic ranking, vector top-k, knn join,
  * hybrid merge — the reference's retrieval surface re-expressed as
  * declarative plans.
  *
  * - keyword search  ⇐ graph_service.py:474 fulltext_search / :513 fallback
  * - rankDocs        ⇐ ranker.py:14 rank_files
  * - vectorTopK      ⇐ neo4j_knowledge_service.py:922 search_similar_nodes
  * - knnJoin         ⇐ batch retrieval (the 100 TB shape: score many probes at once)
  * - hybrid          ⇐ neo4j_knowledge_service.py:72 QueryPipeline (vector ⊎ keyword,
  *                     merge by id keeping max, rank)
  */
object Search {

  /** Exact substring-occurrence count, engine-portable (no regex). */
  def occurrences(c: Column, term: String): Column =
    ((length(c) - length(regexp_replace(c, java.util.regex.Pattern.quote(term), ""))) / term.length).cast("long")

  private def occSimple(c: Column, term: String): Column =
    ((length(c) - length(replaceLit(c, term))) / term.length).cast("long")

  private def replaceLit(c: Column, term: String): Column =
    regexp_replace(c, java.util.regex.Pattern.quote(term), "")

  /** Scored keyword search: score = total occurrences of the query terms.
    * Narrow scan + TakeOrdered; filters/projection push to parquet. */
  def keywordSearch(documents: DataFrame, terms: Seq[String], limit: Int = 30): DataFrame = {
    val score = terms.map(t => occSimple(col("text"), t)).reduce(_ + _)
    documents
      .select(col("doc_id"), score.as("score"))
      .filter(col("score") > 0)
      .orderBy(desc("score"), col("doc_id"))
      .limit(limit)
  }

  def keywordSearchSql(terms: Seq[String], limit: Int = 30): String = {
    val score = terms
      .map(t => s"CAST((length(text) - length(replace(text, '$t', '')))/${t.length} AS BIGINT)")
      .mkString(" + ")
    s"""SELECT doc_id, $score AS score FROM documents
       |WHERE $score > 0 ORDER BY score DESC, doc_id LIMIT $limit""".stripMargin
  }

  /** Test-class sources — the documents-table analog of the reference's
    * `test/`/`spec/` path classes (a source shard holding test-ish docs),
    * so the penalty term is exercised on the synthetic corpus (whose texts
    * contain no literal 'test'/'spec' tokens). */
  val TestClassSources: Seq[String] = Seq("src17", "src18", "src19")

  /** Multiplicative heuristic ranking (ranker.py:14): phrase boost, per-term
    * boost, language boost, source-prefix boost, and the test-file PENALTY
    * (ranker.py:52: ×0.5 for 'test'/'spec' files unless the query asks for
    * tests — keyed on the synthetic pseudo-path `source/doc_<id>.md` or a
    * test-class source shard, mirroring the reference's path-only check).
    * All double products of exact constants — deterministic across engines. */
  /** The corpus's deterministic pseudo-path `source/doc_<id>.md` — the
    * single recipe behind BOTH the rankDocs test-penalty key and the
    * fileSummaries ref:// handles (plus their SQL twins): the reference
    * keys both on the file path, so the two must never drift apart. */
  private val pseudoPath = concat(col("source"), lit("/doc_"), col("doc_id"), lit(".md"))
  private val pseudoPathSql = "source || '/doc_' || doc_id || '.md'"

  def rankDocs(documents: DataFrame, queryTerms: Seq[String], phrase: String,
               lang: String, limit: Int = 30): DataFrame = {
    val termBoost = queryTerms
      .map(t => when(col("text").contains(t), lit(1L)).otherwise(lit(0L)))
      .reduce(_ + _)
    // ranker.py:52 guard: no penalty when the query itself asks for tests
    val queryWantsTests = (phrase +: queryTerms).exists(_.toLowerCase.contains("test"))
    // ranker.py:52 keys the penalty on the file PATH, not the content — use
    // the deterministic pseudo-path (fileSummaries' `source/doc_<id>.md`)
    // plus the test-class source shards (the corpus analog of test/ dirs).
    // Keying on text halved any doc merely containing 'latest'/'inspect'
    // (ADVICE r09) — a semantic divergence from the reference, now closed.
    val isTestDoc = pseudoPath.contains("test") || pseudoPath.contains("spec") ||
      col("source").isin(TestClassSources: _*)
    val penalty =
      if (queryWantsTests) lit(1.0)
      else when(isTestDoc, lit(0.5)).otherwise(lit(1.0))
    val score = lit(1.0) *
      when(col("text").contains(phrase), lit(2.0)).otherwise(lit(1.0)) *
      (lit(1.0) + lit(0.3) * termBoost) *
      when(col("lang") === lang, lit(1.5)).otherwise(lit(1.0)) *
      when(col("source").isin("src0", "src1", "src2", "src3"), lit(1.2)).otherwise(lit(1.0)) *
      penalty
    documents
      .select(col("doc_id"), score.as("score"))
      .orderBy(desc("score"), col("doc_id"))
      .limit(limit)
  }

  def rankDocsSql(queryTerms: Seq[String], phrase: String, lang: String, limit: Int = 30): String = {
    val termBoost = queryTerms
      .map(t => s"(CASE WHEN contains(text, '$t') THEN 1 ELSE 0 END)")
      .mkString(" + ")
    val queryWantsTests = (phrase +: queryTerms).exists(_.toLowerCase.contains("test"))
    val testSrcs = TestClassSources.map(s => s"'$s'").mkString(",")
    val penalty =
      if (queryWantsTests) "1.0::DOUBLE"
      else s"""(CASE WHEN contains($pseudoPathSql, 'test')
              |         OR contains($pseudoPathSql, 'spec')
              |         OR source IN ($testSrcs)
              |    THEN 0.5::DOUBLE ELSE 1.0::DOUBLE END)""".stripMargin
    s"""SELECT doc_id,
       |1.0::DOUBLE
       | * (CASE WHEN contains(text, '$phrase') THEN 2.0::DOUBLE ELSE 1.0::DOUBLE END)
       | * (1.0::DOUBLE + 0.3::DOUBLE * ($termBoost))
       | * (CASE WHEN lang = '$lang' THEN 1.5::DOUBLE ELSE 1.0::DOUBLE END)
       | * (CASE WHEN source IN ('src0','src1','src2','src3') THEN 1.2::DOUBLE ELSE 1.0::DOUBLE END)
       | * $penalty
       | AS score
       |FROM documents ORDER BY score DESC, doc_id LIMIT $limit""".stripMargin
  }

  /** Rule-based file summaries + ref:// handles (ranker.py:64
    * generate_file_summary and ranker.py:77 generate_ref_handle — the last
    * uncovered surface of the reference ranker): documents get a
    * deterministic pseudo-path `source/doc_<id>.md` (the corpus has no
    * path column; source is its directory analog, as in rankDocs), then
    * the reference's exact format strings — "<Lang> file <name> in
    * <dir>/ directory" and "ref://file/<path>#L<start>-L<end>". Pure
    * narrow projection (one codegen'd pass, zero shuffle); capitalize is
    * spelled upper(first)+lower(rest) on BOTH engines, no initcap
    * (locale-dependent word splitting). */
  def fileSummaries(documents: DataFrame): DataFrame = {
    val path = pseudoPath // shared recipe — see rankDocs' penalty key
    val fname = concat(lit("doc_"), col("doc_id"), lit(".md"))
    val langCap = concat(upper(substring(col("lang"), 1, 1)),
      lower(substring(col("lang"), 2, 1000)))
    documents.select(
      col("doc_id"),
      concat(langCap, lit(" file "), fname, lit(" in "), col("source"),
        lit("/ directory")).as("summary"),
      concat(lit("ref://file/"), path, lit("#L1-L1000")).as("ref_handle"))
  }

  val fileSummariesSql: String =
    s"""SELECT doc_id,
       |  upper(substr(lang, 1, 1)) || lower(substr(lang, 2))
       |    || ' file doc_' || doc_id || '.md in ' || source || '/ directory'
       |    AS summary,
       |  'ref://file/' || $pseudoPathSql || '#L1-L1000'
       |    AS ref_handle
       |FROM documents""".stripMargin

  /** Brute-force cosine top-k against one query vector (the exact baseline;
    * the scale path is Dedup.annLsh). Query side is a broadcast of one row —
    * the scan side streams, no shuffle before the TakeOrdered. */
  def vectorTopK(embeddings: DataFrame, queryVecId: Long = 0L, k: Int = 10): DataFrame = {
    val q = embeddings.filter(col("vec_id") === queryVecId)
      .select(col("embedding").as("qv"))
    embeddings
      .crossJoin(broadcast(q))
      .filter(col("vec_id") =!= queryVecId)
      .select(col("vec_id"), VectorOps.cosine(col("embedding"), col("qv")).as("cos"))
      .orderBy(desc("cos"), col("vec_id"))
      .limit(k)
  }

  def vectorTopKSql(queryVecId: Long = 0L, k: Int = 10): String = {
    val cos = VectorOps.cosineSql("embedding", "qv")
    s"""WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = $queryVecId)
       |SELECT vec_id, $cos AS cos FROM embeddings, q
       |WHERE vec_id <> $queryVecId
       |ORDER BY cos DESC, vec_id LIMIT $k""".stripMargin
  }

  /** k-NN join: top-k neighbors for each probe vector. Probe side broadcast
    * (small); at scale with a large probe side, swap to the LSH-bucketed
    * plan (Dedup.annLsh) — same output contract.
    *
    * `probes`: any (vec_id, embedding) frame — e.g. the split_holdout
    * test split — defaulting to the first-nProbes slice ([[Probes]]).
    *
    * Per-probe top-k uses the native bounded [[graft.functions.TopKAgg]]
    * aggregate: map-side partial aggregation emits ≤k rows per probe per
    * task, so the shuffle is O(probes·k) — a window row_number would
    * shuffle every scored pair. */
  def knnJoin(embeddings: DataFrame, nProbes: Int = 10, k: Int = 5,
              probes: Option[DataFrame] = None): DataFrame = {
    val probeDf = Probes.resolve(embeddings, probes, nProbes)
      .select(col("vec_id").as("probe_id"), col("embedding").as("pv"))
    embeddings
      .select(col("vec_id").as("neighbor_id"), col("embedding"))
      .crossJoin(broadcast(probeDf))
      .filter(col("neighbor_id") =!= col("probe_id"))
      .withColumn("cos", VectorOps.cosine(col("embedding"), col("pv")))
      .groupBy(col("probe_id"))
      .agg(graft.functions.TopKAgg.topK(col("cos"), col("neighbor_id"), k).as("topk"))
      .select(col("probe_id"), posexplode(col("topk")))
      .select(col("probe_id"), col("col.id").as("neighbor_id"),
        (col("pos") + 1).cast("long").as("rn"), col("col.score").as("cos"))
  }

  def knnJoinSql(nProbes: Int = 10, k: Int = 5): String = {
    val cos = VectorOps.cosineSql("e.embedding", "p.embedding")
    s"""SELECT p.vec_id AS probe_id, e.vec_id AS neighbor_id,
       |CAST(ROW_NUMBER() OVER (PARTITION BY p.vec_id ORDER BY $cos DESC, e.vec_id) AS BIGINT) AS rn,
       |$cos AS cos
       |FROM embeddings e JOIN embeddings p ON p.vec_id < $nProbes AND e.vec_id <> p.vec_id
       |QUALIFY rn <= $k""".stripMargin
  }

  /** Late-interaction MaxSim retrieval (the ColBERT scoring pattern): a
    * document is a BAG of vectors (here: the label groups its member
    * vectors ≙ a doc's token/chunk embeddings) and its score against a
    * probe is the MAX similarity over the bag — far more robust than one
    * pooled vector when only part of a doc matches. Same scale shape as
    * knnJoin (probe side broadcast, one codegen scoring pass) with the
    * per-(probe, doc) MAX folded into the same shuffle as a partial
    * aggregate, then the bounded TopKAgg keeps shuffle O(probes·k). */
  def maxsimRetrieve(embeddings: DataFrame, nProbes: Int = 10, k: Int = 3,
                     probes: Option[DataFrame] = None): DataFrame = {
    val probeDf = Probes.resolve(embeddings, probes, nProbes)
      .select(col("vec_id").as("probe_id"), col("embedding").as("pv"))
    embeddings
      .select(col("vec_id").as("vid"), col("label").cast("long").as("doc"), col("embedding"))
      .crossJoin(broadcast(probeDf))
      .filter(col("vid") =!= col("probe_id"))
      .withColumn("cos", VectorOps.cosine(col("embedding"), col("pv")))
      .groupBy(col("probe_id"), col("doc"))
      .agg(max(col("cos")).as("maxsim"))
      .groupBy(col("probe_id"))
      .agg(graft.functions.TopKAgg.topK(col("maxsim"), col("doc"), k).as("topk"))
      .select(col("probe_id"), posexplode(col("topk")))
      .select(col("probe_id"), col("col.id").as("doc"),
        (col("pos") + 1).cast("long").as("rn"), col("col.score").as("maxsim"))
  }

  def maxsimRetrieveSql(nProbes: Int = 10, k: Int = 3): String = {
    val cos = VectorOps.cosineSql("e.embedding", "p.embedding")
    s"""WITH ms AS (
       |  SELECT p.vec_id AS probe_id, CAST(e.label AS BIGINT) AS doc,
       |    MAX($cos) AS maxsim
       |  FROM embeddings e JOIN embeddings p
       |    ON p.vec_id < $nProbes AND e.vec_id <> p.vec_id
       |  GROUP BY 1, 2)
       |SELECT probe_id, doc,
       |  CAST(ROW_NUMBER() OVER (PARTITION BY probe_id
       |                          ORDER BY maxsim DESC, doc) AS BIGINT) AS rn,
       |  maxsim
       |FROM ms QUALIFY rn <= $k""".stripMargin
  }

  /** Positional inverted-index build — the persistent artifact behind
    * keyword/BM25 search (term → postings): one posexplode pass + a
    * (term, doc) groupBy, bounded to the top-`vocabSize` corpus
    * vocabulary (real indexes stop at a vocabulary too; the unbounded
    * long tail is hapax noise). Emits (term, doc_id, n_occ, first_pos) —
    * the posting row with its minimal positional payload. */
  def invertedIndex(documents: DataFrame, vocabSize: Int = 500): DataFrame = {
    val toks = documents.select(col("doc_id"),
      posexplode(split(trim(col("text")), "\\s+")).as(Seq("pos", "term")))
    val vocab = toks.groupBy(col("term")).agg(count(lit(1)).as("c"))
      .orderBy(desc("c"), col("term")).limit(vocabSize)
      .select(col("term"))
    toks.join(broadcast(vocab), Seq("term"))
      .groupBy(col("term"), col("doc_id"))
      .agg(count(lit(1)).as("n_occ"), min(col("pos")).cast("long").as("first_pos"))
  }

  def invertedIndexSql(vocabSize: Int = 500): String =
    s"""WITH toks AS (
       |  SELECT doc_id,
       |    unnest(string_split_regex(trim(text), '\\s+')) AS term,
       |    unnest(range(1, len(string_split_regex(trim(text), '\\s+')) + 1)) AS pos
       |  FROM documents),
       |vocab AS (
       |  SELECT term FROM toks GROUP BY term
       |  ORDER BY COUNT(*) DESC, term LIMIT $vocabSize)
       |SELECT t.term, t.doc_id, COUNT(*) AS n_occ,
       |  CAST(MIN(t.pos) - 1 AS BIGINT) AS first_pos
       |FROM toks t JOIN vocab v ON t.term = v.term
       |GROUP BY t.term, t.doc_id""".stripMargin

  /** Search-result snippet extraction — the highlight window every search
    * UI renders: for each keyword hit, a ±`width`-token window around the
    * first exact-token query match (fallback: document head when the
    * substring match never aligns to a whole token). Narrow string ops
    * over the bounded hit set only. */
  def searchSnippets(documents: DataFrame, terms: Seq[String], limit: Int = 20,
                     width: Int = 5): DataFrame = {
    val top = keywordSearch(documents, terms, limit)
    val toks = split(trim(col("text")), "\\s+")
    val Far = 1000000000L
    val minPos = terms
      .map(t => when(array_position(toks, t) === 0L, lit(Far))
        .otherwise(array_position(toks, t)))
      .reduce(least(_, _))
    documents.join(broadcast(top), Seq("doc_id"))
      .withColumn("mp", minPos)
      .withColumn("start",
        when(col("mp") === Far, lit(1L)).otherwise(greatest(col("mp") - width, lit(1L))))
      .select(col("doc_id"), col("score"),
        concat_ws(" ", slice(toks, col("start").cast("int"), lit(2 * width + 1))).as("snippet"))
  }

  def searchSnippetsSql(terms: Seq[String], limit: Int = 20, width: Int = 5): String = {
    val far = 1000000000L
    // list_position returns 0 (not NULL) for a missing element — map the
    // miss to `far` so it can't win the LEAST (mirrors Spark's === 0 guard)
    val minPos = terms
      .map(t => s"(CASE WHEN COALESCE(list_position(string_split_regex(trim(text), '\\s+'), '$t'), 0) = 0 THEN $far ELSE list_position(string_split_regex(trim(text), '\\s+'), '$t') END)")
      .mkString("LEAST(", ", ", ")")
    s"""WITH top AS (${keywordSearchSql(terms, limit)}),
       |j AS (
       |  SELECT d.doc_id, top.score,
       |    string_split_regex(trim(d.text), '\\s+') AS t,
       |    $minPos AS mp
       |  FROM documents d JOIN top ON d.doc_id = top.doc_id),
       |s AS (
       |  SELECT doc_id, score, t,
       |    CASE WHEN mp = $far THEN 1 ELSE GREATEST(mp - $width, 1) END AS start
       |  FROM j)
       |SELECT doc_id, score,
       |  array_to_string(t[start:start + ${2 * width}], ' ') AS snippet
       |FROM s""".stripMargin
  }

  /** Pseudo-relevance feedback query expansion (Rocchio/PRF — the classic
    * IR trick): run the keyword query, take the top feedback docs, and
    * surface the terms that co-occur most in them (minus the query terms
    * themselves) as expansion candidates. The feedback set is bounded
    * (top-N docs → broadcast semi-join); the term rollup is one explode +
    * groupBy over only those docs. */
  def prfExpand(documents: DataFrame, terms: Seq[String], fbDocs: Int = 10,
                expansions: Int = 10): DataFrame = {
    val top = keywordSearch(documents, terms, fbDocs).select(col("doc_id"))
    documents.join(broadcast(top), Seq("doc_id"))
      .select(explode(split(trim(col("text")), "\\s+")).as("term"))
      .filter(!col("term").isin(terms: _*) && col("term") =!= "")
      .groupBy(col("term")).agg(count(lit(1)).as("c"))
      .orderBy(desc("c"), col("term"))
      .limit(expansions)
  }

  def prfExpandSql(terms: Seq[String], fbDocs: Int = 10, expansions: Int = 10): String = {
    val notIn = terms.map(t => s"'$t'").mkString(", ")
    s"""WITH top AS (${keywordSearchSql(terms, fbDocs)}),
       |tk AS (
       |  SELECT unnest(string_split_regex(trim(d.text), '\\s+')) AS term
       |  FROM documents d JOIN top ON d.doc_id = top.doc_id)
       |SELECT term, COUNT(*) AS c FROM tk
       |WHERE term NOT IN ($notIn) AND term <> ''
       |GROUP BY term ORDER BY c DESC, term LIMIT $expansions""".stripMargin
  }

  /** MMR diversified reranking (Carbonell & Goldstein; every RAG stack's
    * post-retrieval step): greedily select k results maximizing
    * λ·relevance − (1−λ)·max-similarity-to-already-selected, so near-
    * duplicate hits don't crowd out coverage. The candidate pool is the
    * bounded top-nCand retrieval (a model-parameter-sized artifact — the
    * IVF-centroid collect precedent); relevance and the nCand² candidate
    * sim matrix are computed by the ENGINE's cosine kernel and only the
    * greedy argmax loop (k steps over ≤ nCand doubles) runs on the
    * driver, reusing those exact numbers — so the oracle's unrolled
    * k-step replay is bit-identical. λ = 0.7 and 1−λ = 0.3 appear as the
    * same two literals in both engines.
    *
    * Driver-side contract: the greedy argmax is inherently sequential, so
    * the pool and its nCand² sim matrix are collected — O(nCand²) driver
    * memory and k·nCand driver work BY DESIGN. The require() caps the knob
    * so nobody scales nCand into a driver OOM; at larger pools, rerank
    * per-shard first. */
  def mmrRerank(embeddings: DataFrame, queryVecId: Long = 0L, nCand: Int = 30,
                k: Int = 5): DataFrame = {
    require(nCand <= 1024,
      s"mmrRerank collects an nCand² sim matrix on the driver; nCand=$nCand > 1024 " +
        "would OOM — rerank per-shard or raise the retrieval threshold instead")
    val spark = embeddings.sparkSession
    import spark.implicits._
    val q = embeddings.filter(col("vec_id") === queryVecId)
      .select(col("embedding").as("qv"))
    val cand = embeddings.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= queryVecId)
      .select(col("vec_id"), col("embedding"),
        VectorOps.cosine(col("embedding"), col("qv")).as("rel"))
      .orderBy(desc("rel"), col("vec_id"))
      .limit(nCand)
    val rels: Array[(Long, Double)] =
      cand.select(col("vec_id"), col("rel")).as[(Long, Double)].collect().sortBy(_._1)
    val simRows: Map[(Long, Long), Double] = cand.as("a").join(cand.as("b"),
        col("a.vec_id") =!= col("b.vec_id"))
      .select(col("a.vec_id").as("ia"), col("b.vec_id").as("ib"),
        VectorOps.cosine(col("a.embedding"), col("b.embedding")).as("sim"))
      .as[(Long, Long, Double)].collect()
      .map { case (a, b, s) => (a, b) -> s }.toMap
    val selected = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double, Double)]
    val remaining = scala.collection.mutable.LinkedHashMap(rels: _*)
    for (rank <- 1 to math.min(k, rels.length)) {
      val scored = remaining.toSeq.map { case (id, rel) =>
        val pen =
          if (selected.isEmpty) 0.0
          else selected.map(s => simRows((id, s._2))).max
        (id, rel, 0.7 * rel - 0.3 * pen)
      }
      val (id, rel, mmr) = scored.maxBy { case (id, _, m) => (m, -id) }
      selected += ((rank.toLong, id, rel, mmr))
      remaining.remove(id)
    }
    selected.toSeq.toDF("rank", "vec_id", "rel", "mmr")
  }

  /** DISTRIBUTED MMR — the same greedy trajectory as [[mmrRerank]] with
    * NO driver-side pool: at each of the k steps the argmax of
    * 0.7·rel − 0.3·pen decomposes over partitions (pen is per-candidate
    * state), so the step is a distributed top-1 (partition-local argmax +
    * single-row merge — Spark's TakeOrdered IS the per-shard greedy +
    * bounded merge), and the penalty update is one broadcast of the 1-row
    * winner joined against the pool: pen′ = max(pen, cos(c, winner)).
    * Running max over the same cosine values the driver version takes
    * max over ⇒ bit-identical trajectory, same oracle. k rounds × one
    * narrow pool pass; driver never holds more than the plan — the
    * require(nCand ≤ 1024) cap is gone because nothing scales with
    * nCand² anywhere. Per-round materialize + release: the Iterative
    * loop contract. */
  def mmrRerankDist(embeddings: DataFrame, queryVecId: Long = 0L, nCand: Int = 30,
                    k: Int = 5): DataFrame = {
    import Iterative._
    val q = embeddings.filter(col("vec_id") === queryVecId)
      .select(col("embedding").as("qv"))
    val cand = embeddings.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= queryVecId)
      .select(col("vec_id"), col("embedding"),
        VectorOps.cosine(col("embedding"), col("qv")).as("rel"))
      .orderBy(desc("rel"), col("vec_id"))
      .limit(nCand)
    // round 1 has NO selected set: its penalty is the literal 0.0 (the
    // driver loop's empty-case), and the FIRST update sets pen = cos
    // directly — a 0.0-seeded running max would silently FLOOR the
    // penalty at 0, and max-sim penalties are legitimately negative when
    // every selected item anti-correlates with the candidate (caught by
    // the oracle at sf0.01: one selection's pen was −0.0216)
    var pool = cand.withColumn("pen", lit(0.0)).materialize // never read: round 1 uses the literal, the first update overwrites
    var out: DataFrame = null
    for (rank <- 1 to k) {
      val pen = if (rank == 1) lit(0.0) else col("pen")
      val winner = pool
        .select(col("vec_id"), col("embedding"), col("rel"),
          (lit(0.7) * col("rel") - lit(0.3) * pen).as("mmr"))
        .orderBy(desc("mmr"), col("vec_id")).limit(1).materialize
      val sel = winner.select(lit(rank.toLong).as("rank"), col("vec_id"),
        col("rel"), col("mmr"))
      out = if (out == null) sel else out.unionAll(sel)
      if (rank < k) {
        val w = winner.select(col("vec_id").as("wid"), col("embedding").as("wemb"))
        val wcos = VectorOps.cosine(col("embedding"), col("wemb"))
        val next = pool.crossJoin(broadcast(w))
          .filter(col("vec_id") =!= col("wid"))
          .select(col("vec_id"), col("embedding"), col("rel"),
            (if (rank == 1) wcos else greatest(col("pen"), wcos)).as("pen"))
          .materialize
        release(pool) // superseded: winner and next are both materialized
        pool = next
      } else release(pool) // the winner row is materialized; pool is done
    }
    out
  }

  def mmrRerankSql(queryVecId: Long = 0L, nCand: Int = 30, k: Int = 5): String = {
    val relCos = VectorOps.cosineSql("e.embedding", "q.qv")
    val simCos = VectorOps.cosineSql("a.embedding", "b.embedding")
    val steps = (1 to k).map { i =>
      if (i == 1)
        s"""s1 AS (
           |  SELECT CAST(1 AS BIGINT) AS rank, vec_id, rel, 0.7 * rel - 0.3 * 0.0 AS mmr
           |  FROM cand ORDER BY 0.7 * rel - 0.3 * 0.0 DESC, vec_id LIMIT 1)""".stripMargin
      else {
        val prev = (1 until i).map(j => s"SELECT vec_id FROM s$j").mkString(" UNION ALL ")
        s"""s$i AS (
           |  SELECT CAST($i AS BIGINT) AS rank, c.vec_id, c.rel,
           |    0.7 * c.rel - 0.3 * (SELECT MAX(s.sim) FROM sims s
           |                         WHERE s.ia = c.vec_id AND s.ib IN ($prev)) AS mmr
           |  FROM cand c WHERE c.vec_id NOT IN ($prev)
           |  ORDER BY mmr DESC, c.vec_id LIMIT 1)""".stripMargin
      }
    }.mkString(",\n")
    val out = (1 to k).map(i => s"SELECT * FROM s$i").mkString("\nUNION ALL\n")
    s"""WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = $queryVecId),
       |cand AS MATERIALIZED (
       |  SELECT e.vec_id, e.embedding, $relCos AS rel
       |  FROM embeddings e CROSS JOIN q
       |  WHERE e.vec_id <> $queryVecId
       |  ORDER BY rel DESC, e.vec_id LIMIT $nCand),
       |sims AS MATERIALIZED (
       |  SELECT a.vec_id AS ia, b.vec_id AS ib, $simCos AS sim
       |  FROM cand a JOIN cand b ON a.vec_id <> b.vec_id),
       |$steps
       |$out""".stripMargin
  }

  /** Hard-negative mining — the contrastive-training data step (DPR/SBERT
    * recipe): for each probe, the top-k most-similar vectors with a
    * DIFFERENT label are exactly the "hard" negatives a bi-encoder trains
    * against (random negatives are too easy; same-label hits are
    * positives). Same scale shape as `knnJoin`: probe side broadcast,
    * scoring in one codegen pass, the label filter prunes BEFORE the
    * bounded TopKAgg so the shuffle stays O(probes·k). */
  def hardNegatives(embeddings: DataFrame, nProbes: Int = 10, k: Int = 5,
                    probes: Option[DataFrame] = None): DataFrame = {
    // probe contract here additionally carries `label` (the positive class)
    val probeDf = probes.getOrElse(embeddings.filter(col("vec_id") < nProbes))
      .select(col("vec_id").as("probe_id"), col("embedding").as("pv"),
        col("label").as("p_label"))
    embeddings
      .select(col("vec_id").as("neg_id"), col("embedding"), col("label"))
      .crossJoin(broadcast(probeDf))
      .filter(col("label") =!= col("p_label"))
      .withColumn("cos", VectorOps.cosine(col("embedding"), col("pv")))
      .groupBy(col("probe_id"))
      .agg(graft.functions.TopKAgg.topK(col("cos"), col("neg_id"), k).as("topk"))
      .select(col("probe_id"), posexplode(col("topk")))
      .select(col("probe_id"), col("col.id").as("neg_id"),
        (col("pos") + 1).cast("long").as("rn"), col("col.score").as("cos"))
  }

  def hardNegativesSql(nProbes: Int = 10, k: Int = 5): String = {
    val cos = VectorOps.cosineSql("e.embedding", "p.embedding")
    s"""SELECT p.vec_id AS probe_id, e.vec_id AS neg_id,
       |CAST(ROW_NUMBER() OVER (PARTITION BY p.vec_id ORDER BY $cos DESC, e.vec_id) AS BIGINT) AS rn,
       |$cos AS cos
       |FROM embeddings e JOIN embeddings p
       |  ON p.vec_id < $nProbes AND e.label <> p.label
       |QUALIFY rn <= $k""".stripMargin
  }

  /** Retrieval-quality evaluation (MRR) — the metric loop every retrieval
    * stack runs against its index: treat same-label vectors as relevant,
    * retrieve top-k with the exact knn join, and report each probe's
    * reciprocal rank of the first relevant hit (0 when none retrieved).
    * Rational arithmetic only (1/rank) — no libm, oracle-exact; the global
    * MRR is the mean of the rr column (left to the caller so no
    * summation-order dependence enters the registered result). */
  def mrrEval(embeddings: DataFrame, nProbes: Int = 10, k: Int = 5): DataFrame = {
    val labels = embeddings.select(col("vec_id"), col("label"))
    val retrieved = knnJoin(embeddings, nProbes, k)
    retrieved
      .join(labels.select(col("vec_id").as("probe_id"), col("label").as("p_label")), "probe_id")
      .join(labels.select(col("vec_id").as("neighbor_id"), col("label").as("n_label")), "neighbor_id")
      .groupBy(col("probe_id"))
      .agg(min(when(col("p_label") === col("n_label"), col("rn"))).as("first_rel_rank"))
      .select(col("probe_id"), col("first_rel_rank"),
        when(col("first_rel_rank").isNotNull,
          lit(1.0) / col("first_rel_rank").cast("double")).otherwise(lit(0.0)).as("rr"))
  }

  def mrrEvalSql(nProbes: Int = 10, k: Int = 5): String =
    s"""WITH knn AS (${knnJoinSql(nProbes, k)}),
       |m AS (
       |  SELECT knn.probe_id,
       |    MIN(CASE WHEN pl.label = nl.label THEN knn.rn END) AS first_rel_rank
       |  FROM knn
       |  JOIN embeddings pl ON pl.vec_id = knn.probe_id
       |  JOIN embeddings nl ON nl.vec_id = knn.neighbor_id
       |  GROUP BY knn.probe_id)
       |SELECT probe_id, first_rel_rank,
       |  CASE WHEN first_rel_rank IS NOT NULL
       |       THEN 1.0 / CAST(first_rel_rank AS DOUBLE) ELSE 0.0 END AS rr
       |FROM m""".stripMargin

  // ---- NDCG@k ----

  /** 1/log2(r+1) as a shortest-repr double literal — computed ONCE here and
    * inlined verbatim into BOTH engines' SQL, so no libm call happens at
    * query time and the discounts are bit-identical by construction. */
  private def discStr(r: Int): String = (1.0 / (math.log(r + 1.0) / math.log(2.0))).toString

  private def discCase(k: Int): String =
    "CASE rn " +
      (1 to k).map(r => s"WHEN $r THEN CAST('${discStr(r)}' AS DECIMAL(38,18))").mkString(" ") +
      " ELSE CAST('0' AS DECIMAL(38,18)) END"

  /** Ideal DCG for m = least(n_rel, k) relevant docs: exact decimal
    * cumulative sums of the same discount literals. */
  private def idcgCase(k: Int): String = {
    val cums = (1 to k).scanLeft(BigDecimal(0))((acc, r) => acc + BigDecimal(discStr(r))).tail
    s"CASE least(n_rel, $k) WHEN 0 THEN CAST('0' AS DECIMAL(38,18)) " +
      (1 to k).map(r => s"WHEN $r THEN CAST('${cums(r - 1)}' AS DECIMAL(38,18))").mkString(" ") +
      " ELSE CAST('0' AS DECIMAL(38,18)) END"
  }

  /** Decimal→double goes through a string cast: both engines' decimal→string
    * (full scale-18 digits) and string→double (correctly-rounded strtod) agree,
    * whereas DuckDB's direct decimal→double (int128 / 1e18 in FP) can land one
    * ulp off Spark's BigDecimal.doubleValue. */
  private val ndcgExpr =
    """CASE WHEN CAST(CAST(idcg_dec AS STRING) AS DOUBLE) = 0.0 THEN 0.0
      |ELSE CAST(CAST(dcg_dec AS STRING) AS DOUBLE) / CAST(CAST(idcg_dec AS STRING) AS DOUBLE) END""".stripMargin

  /** NDCG@k retrieval-quality eval over the exact knn (binary relevance =
    * same label as the probe) — the ranking-aware counterpart of mrrEval.
    * NDCG needs 1/log2(r+1) discounts, which are not reproducible across
    * engines if computed at query time; instead the discounts AND their
    * ideal cumulative sums are inlined as identical decimal literals in
    * both plans, and the DCG sum runs in DECIMAL(38,18) so it is
    * summation-order-independent. Costs one bounded knn (probes broadcast)
    * + one label-count aggregate broadcast back — nothing corpus². */
  def ndcgEval(embeddings: DataFrame, nProbes: Int = 10, k: Int = 5): DataFrame = {
    val labels = embeddings.select(col("vec_id"), col("label"))
    val lc = labels.groupBy(col("label")).agg(count(lit(1)).as("n_tot"))
    val probeRel = labels.filter(col("vec_id") < nProbes)
      .join(broadcast(lc), "label")
      .select(col("vec_id").as("probe_id"), (col("n_tot") - 1).as("n_rel"))
    val dcg = knnJoin(embeddings, nProbes, k)
      .join(labels.select(col("vec_id").as("probe_id"), col("label").as("p_label")), "probe_id")
      .join(labels.select(col("vec_id").as("neighbor_id"), col("label").as("n_label")), "neighbor_id")
      .withColumn("disc", expr(
        s"CASE WHEN p_label = n_label THEN ${discCase(k)} ELSE CAST('0' AS DECIMAL(38,18)) END"))
      .groupBy(col("probe_id")).agg(sum(col("disc")).as("dcg_dec"))
    probeRel.join(dcg, "probe_id")
      .withColumn("idcg_dec", expr(idcgCase(k)))
      .select(col("probe_id"), col("n_rel"), expr(ndcgExpr).as("ndcg"))
  }

  def ndcgEvalSql(nProbes: Int = 10, k: Int = 5): String =
    s"""WITH knn AS (${knnJoinSql(nProbes, k)}),
       |lc AS (SELECT label, COUNT(*) AS n_tot FROM embeddings GROUP BY label),
       |pr AS (
       |  SELECT e.vec_id AS probe_id, CAST(lc.n_tot - 1 AS BIGINT) AS n_rel
       |  FROM embeddings e JOIN lc ON e.label = lc.label WHERE e.vec_id < $nProbes),
       |d AS (
       |  SELECT knn.probe_id,
       |    SUM(CASE WHEN pl.label = nl.label THEN ${discCase(k)}
       |        ELSE CAST('0' AS DECIMAL(38,18)) END) AS dcg_dec
       |  FROM knn
       |  JOIN embeddings pl ON pl.vec_id = knn.probe_id
       |  JOIN embeddings nl ON nl.vec_id = knn.neighbor_id
       |  GROUP BY knn.probe_id)
       |SELECT pr.probe_id, pr.n_rel, $ndcgExpr AS ndcg
       |FROM (SELECT pr.probe_id, pr.n_rel, d.dcg_dec, ${idcgCase(k)} AS idcg_dec
       |      FROM pr JOIN d ON pr.probe_id = d.probe_id) AS pr""".stripMargin

  // ---- Reciprocal-rank fusion ----

  /** RRF hybrid retrieval: rank candidates independently by keyword score
    * and by vector cosine, then fuse with score = Σ 1/(k0 + rank) — the
    * standard rank-based fusion (Cormack et al.), complementing [[hybrid]]'s
    * max-score merge. Rational arithmetic only (two exact divisions added in
    * a fixed order) — engine-portable bit-for-bit.
    *
    * Both candidate ranks come from the bounded global [[TopKAgg]] aggregate
    * (map-side partials emit ≤n rows per task, posexplode ⇒ rank), NOT an
    * unpartitioned window — so candidate generation stays O(n) shuffle bytes
    * per list at any corpus size. documents.doc_id ↔ embeddings.vec_id. */
  def rrfFusion(documents: DataFrame, embeddings: DataFrame, terms: Seq[String],
                queryVecId: Long = 0L, n: Int = 30, k0: Int = 60,
                limit: Int = 20): DataFrame = {
    val kwScore = terms.map(t => occSimple(col("text"), t)).reduce(_ + _)
    val kw = documents
      .select(col("doc_id"), kwScore.cast("double").as("s"))
      .filter(col("s") > 0)
      .groupBy()
      .agg(graft.functions.TopKAgg.topK(col("s"), col("doc_id"), n).as("topk"))
      .select(posexplode(col("topk")))
      .select(col("col.id").as("doc_id"), (col("pos") + 1).cast("long").as("kw_rank"))
    val q = embeddings.filter(col("vec_id") === queryVecId)
      .select(col("embedding").as("qv"))
    val vec = embeddings
      .crossJoin(broadcast(q))
      .filter(col("vec_id") =!= queryVecId)
      .select(col("vec_id"), VectorOps.cosine(col("embedding"), col("qv")).as("cos"))
      .groupBy()
      .agg(graft.functions.TopKAgg.topK(col("cos"), col("vec_id"), n).as("topk"))
      .select(posexplode(col("topk")))
      .select(col("col.id").as("doc_id"), (col("pos") + 1).cast("long").as("vec_rank"))
    kw.join(vec, Seq("doc_id"), "full_outer")
      .select(col("doc_id"), col("kw_rank"), col("vec_rank"),
        (coalesce(lit(1.0) / (lit(k0) + col("kw_rank")).cast("double"), lit(0.0)) +
          coalesce(lit(1.0) / (lit(k0) + col("vec_rank")).cast("double"), lit(0.0))).as("rrf"))
      .orderBy(desc("rrf"), col("doc_id"))
      .limit(limit)
  }

  def rrfFusionSql(terms: Seq[String], queryVecId: Long = 0L, n: Int = 30,
                   k0: Int = 60, limit: Int = 20): String = {
    val kwScore = terms
      .map(t => s"CAST((length(text) - length(replace(text, '$t', '')))/${t.length} AS BIGINT)")
      .mkString(" + ")
    val cos = VectorOps.cosineSql("embedding", "qv")
    s"""WITH kw AS (
       |  SELECT doc_id, CAST(ROW_NUMBER() OVER (ORDER BY s DESC, doc_id) AS BIGINT) AS kw_rank
       |  FROM (SELECT doc_id, CAST($kwScore AS DOUBLE) AS s FROM documents) WHERE s > 0
       |  QUALIFY kw_rank <= $n),
       |q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = $queryVecId),
       |vec AS (
       |  SELECT doc_id, CAST(ROW_NUMBER() OVER (ORDER BY cos DESC, doc_id) AS BIGINT) AS vec_rank
       |  FROM (SELECT vec_id AS doc_id, $cos AS cos FROM embeddings, q
       |        WHERE vec_id <> $queryVecId)
       |  QUALIFY vec_rank <= $n)
       |SELECT COALESCE(kw.doc_id, vec.doc_id) AS doc_id, kw_rank, vec_rank,
       |  COALESCE(1.0 / CAST($k0 + kw_rank AS DOUBLE), 0.0)
       |    + COALESCE(1.0 / CAST($k0 + vec_rank AS DOUBLE), 0.0) AS rrf
       |FROM kw FULL OUTER JOIN vec ON kw.doc_id = vec.doc_id
       |ORDER BY rrf DESC, doc_id LIMIT $limit""".stripMargin
  }

  /** Hybrid retrieval: vector candidates ⊎ keyword candidates, full-outer
    * merge by id keeping the max normalized score (QueryPipeline._merge_nodes
    * semantics), re-ranked. documents.doc_id ↔ embeddings.vec_id. */
  def hybrid(documents: DataFrame, embeddings: DataFrame,
             terms: Seq[String], queryVecId: Long = 0L, limit: Int = 20): DataFrame = {
    val vcand = vectorTopK(embeddings, queryVecId, limit)
      .select(col("vec_id").as("id"), ((col("cos") + lit(1.0)) / lit(2.0)).as("vscore"))
    val kraw = keywordSearch(documents, terms, limit)
    val kmax = kraw.agg(max(col("score")).as("kmax"))
    val kcand = kraw.crossJoin(broadcast(kmax))
      .select(col("doc_id").as("id"),
        (col("score").cast("double") / col("kmax").cast("double")).as("kscore"))
    vcand.join(kcand, Seq("id"), "full_outer")
      .select(
        col("id"),
        greatest(coalesce(col("vscore"), lit(0.0)), coalesce(col("kscore"), lit(0.0))).as("score"),
        when(col("vscore").isNotNull && col("kscore").isNotNull, "both")
          .when(col("vscore").isNotNull, "vector").otherwise("keyword").as("src"))
      .orderBy(desc("score"), col("id"))
      .limit(limit)
  }

  def hybridSql(terms: Seq[String], queryVecId: Long = 0L, limit: Int = 20): String = {
    val cos = VectorOps.cosineSql("embedding", "qv")
    val score = terms
      .map(t => s"CAST((length(text) - length(replace(text, '$t', '')))/${t.length} AS BIGINT)")
      .mkString(" + ")
    s"""WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = $queryVecId),
       |v AS (SELECT vec_id AS id, ($cos + 1.0::DOUBLE)/2.0::DOUBLE AS vscore FROM embeddings, q
       |      WHERE vec_id <> $queryVecId ORDER BY vscore DESC, vec_id LIMIT $limit),
       |kraw AS (SELECT doc_id, $score AS score FROM documents WHERE $score > 0
       |      ORDER BY score DESC, doc_id LIMIT $limit),
       |k AS (SELECT doc_id AS id, CAST(score AS DOUBLE)/CAST((SELECT MAX(score) FROM kraw) AS DOUBLE) AS kscore FROM kraw)
       |SELECT COALESCE(v.id, k.id) AS id,
       |       GREATEST(COALESCE(vscore, 0.0::DOUBLE), COALESCE(kscore, 0.0::DOUBLE)) AS score,
       |       CASE WHEN vscore IS NOT NULL AND kscore IS NOT NULL THEN 'both'
       |            WHEN vscore IS NOT NULL THEN 'vector' ELSE 'keyword' END AS src
       |FROM v FULL OUTER JOIN k ON v.id = k.id
       |ORDER BY score DESC, id LIMIT $limit""".stripMargin
  }

  /** BM25 ranking — the standard full-text relevance function behind every
    * serious keyword index (what the reference's Neo4j fulltext index
    * computes internally; `fulltext_search` at graph_service.py:474 returns
    * its scores). One narrow scan computes per-doc term frequencies and
    * length; ONE tiny aggregate (N, Σlen, per-term df) broadcasts back; the
    * score is a codegen'd expression — corpus never shuffles, TakeOrdered
    * bounds the result. idf uses the log-free rational variant
    * (N−df+0.5)/(df+0.5) — monotone in the classic idf, and exactly
    * reproducible cross-engine where ln() is libm-dependent (same
    * precedent as tfidf).
    */
  def bm25(documents: DataFrame, terms: Seq[String], k1: Double = 1.2,
           b: Double = 0.75, limit: Int = 30): DataFrame = {
    val len = size(split(trim(col("text")), "\\s+")).cast("long")
    val withTf = documents.select(
      col("doc_id") +: len.as("len") +:
        terms.indices.map(i => occSimple(col("text"), terms(i)).as(s"tf_$i")): _*)
    val stats = withTf.agg(
      count(lit(1)).as("n_docs"),
      sum(col("len")).as("sum_len") +:
        terms.indices.map(i =>
          sum(when(col(s"tf_$i") > 0, 1L).otherwise(0L)).as(s"df_$i")): _*)
    val avgdl = col("sum_len").cast("double") / col("n_docs").cast("double")
    def tscore(i: Int): Column = {
      val tf = col(s"tf_$i").cast("double")
      val idf = ((col("n_docs") - col(s"df_$i")).cast("double") + lit(0.5)) /
        (col(s"df_$i").cast("double") + lit(0.5))
      idf * (tf * lit(k1 + 1.0)) /
        (tf + lit(k1) * (lit(1.0 - b) + lit(b) * (col("len").cast("double") / avgdl)))
    }
    val score = terms.indices.map(tscore).reduce(_ + _)
    withTf.crossJoin(broadcast(stats))
      .select(col("doc_id"), score.as("score"))
      .filter(col("score") > 0.0)
      .orderBy(desc("score"), col("doc_id"))
      .limit(limit)
  }

  def bm25Sql(terms: Seq[String], k1: Double = 1.2, b: Double = 0.75,
              limit: Int = 30): String = {
    val tfCols = terms.indices.map(i =>
      s"CAST((length(text) - length(replace(text, '${terms(i)}', '')))/${terms(i).length} AS BIGINT) AS tf_$i")
      .mkString(", ")
    val dfCols = terms.indices.map(i =>
      s"CAST(SUM(CASE WHEN tf_$i > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df_$i").mkString(", ")
    val avgdl = "(CAST(sum_len AS DOUBLE) / CAST(n_docs AS DOUBLE))"
    val score = terms.indices.map { i =>
      val idf = s"((CAST(n_docs - df_$i AS DOUBLE) + 0.5) / (CAST(df_$i AS DOUBLE) + 0.5))"
      s"$idf * (CAST(tf_$i AS DOUBLE) * ${k1 + 1.0}) / " +
        s"(CAST(tf_$i AS DOUBLE) + $k1 * (${1.0 - b} + $b * (CAST(len AS DOUBLE) / $avgdl)))"
    }.reduce((a, c) => s"($a + $c)")
    s"""WITH f AS (
       |  SELECT doc_id, CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS len,
       |    $tfCols
       |  FROM documents),
       |st AS (
       |  SELECT CAST(COUNT(*) AS BIGINT) AS n_docs, CAST(SUM(len) AS BIGINT) AS sum_len, $dfCols
       |  FROM f),
       |sc AS (
       |  SELECT doc_id, $score AS score FROM f CROSS JOIN st)
       |SELECT doc_id, score FROM sc
       |WHERE score > 0.0 ORDER BY score DESC, doc_id LIMIT $limit""".stripMargin
  }

  /** Tokenized index artifacts for one corpus slice: full postings
    * (term, doc_id, n_occ) and per-doc lengths — the two raw tables a
    * Lucene-family index persists. One explode + one (term, doc_id)
    * groupBy; everything else derives or maintains additively. */
  private[graft] def bm25IndexParts(docs: DataFrame): (DataFrame, DataFrame) = {
    val toks = docs.select(col("doc_id"),
      explode(split(trim(col("text")), "\\s+")).as("term"))
    val postings = toks.groupBy(col("term"), col("doc_id"))
      .agg(count(lit(1)).as("n_occ"))
    val doclens = docs.select(col("doc_id"),
      size(split(trim(col("text")), "\\s+")).cast("long").as("len"))
    (postings, doclens)
  }

  /** Incremental BM25 search-index maintenance — the SEARCH-side member of
    * the index-maintenance family (ivf_upsert / kmv_merge /
    * minhash_lsh_upsert): the standing index is the four artifacts a
    * fulltext engine persists — postings, doc lengths, per-term document
    * frequency, and the corpus scalars (N, Σlen) — and every one is
    * ADDITIVE under corpus growth, so an arrival batch (delta =
    * doc_id%10 == 0, the deterministic stand-in for "newly committed")
    * maintains the index with O(Δ text) tokenize work: postings/doclens
    * append, df and the scalars add. No base text is ever re-read.
    *
    * The registered query then scores the fixed query terms FROM the
    * maintained index — tf from postings (filtered to the query terms:
    * bucketed-by-term postings make that a partition prune at scale),
    * len from doclens, df/N/avgdl from the maintained stats — while the
    * oracle recomputes BM25 over the FULL corpus from scratch. The hash
    * gate therefore proves the additive maintenance lossless: a
    * double-counted df, a missed delta posting, or a stale scalar breaks
    * the hash. This is the contract behind the reference's fulltext index
    * (graph_service.py:474 fulltext_search — Neo4j maintains its index
    * incrementally on entity upsert). tf here is exact-token count (the
    * index's definition), not bm25_search's substring count, hence the
    * separate oracle.
    *
    * Contract: the arrival batch contains NEW doc_ids (insert semantics —
    * guaranteed here by the doc_id%10 split). Replacing an existing doc
    * would first retract its contributions, which the same additive
    * artifacts support with negated counts; that retract path is not
    * registered. */
  def bm25Upsert(documents: DataFrame, terms: Seq[String], k1: Double = 1.2,
                 b: Double = 0.75, limit: Int = 30): DataFrame = {
    val isDelta = pmod(col("doc_id"), lit(10L)) === 0L
    // standing index (computed here from the base slice; persisted tables
    // in production — bm25UpsertFrom consumes them as-is)
    val (postBase, dlBase) = bm25IndexParts(documents.filter(!isDelta))
    val dfBase = postBase.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val scBase = dlBase.agg(count(lit(1)).as("n_docs"), sum(col("len")).as("sum_len"))
    bm25UpsertFrom(postBase, dlBase, dfBase, scBase,
      documents.filter(isDelta), terms, k1, b, limit)
  }

  /** Production-shaped core of [[bm25Upsert]]: given the PERSISTED standing
    * index (postings, doclens, per-term df, corpus scalars — loaded from
    * storage) and an arrival batch, tokenize ONLY the batch, maintain all
    * four artifacts additively, and score the query terms from the result.
    * At 100 TB the postings table is bucketed by term so the query-term
    * restriction prunes, the df/scalar tables are tiny broadcasts, and the
    * per-batch cost is O(Δ tokens) — never O(corpus). */
  def bm25UpsertFrom(postBase: DataFrame, dlBase: DataFrame, dfBase: DataFrame,
                     scBase: DataFrame, deltaDocs: DataFrame, terms: Seq[String],
                     k1: Double = 1.2, b: Double = 0.75, limit: Int = 30): DataFrame = {
    val (postM, dlM, dfM, scM) =
      bm25UpsertArtifacts(postBase, dlBase, dfBase, scBase, deltaDocs)
    bm25ScoreFromIndex(postM, dlM, dfM, scM, terms, k1, b, limit)
  }

  /** The maintained (postings, doclens, df, scalars) after the arrival
    * batch — the additive half, package-level like [[bm25DeleteArtifacts]]
    * so the WRITE-BACK cycle (Stores.bm25Cycle2Store) can persist the
    * maintained artifacts between batches. */
  private[graft] def bm25UpsertArtifacts(
      postBase: DataFrame, dlBase: DataFrame, dfBase: DataFrame,
      scBase: DataFrame, deltaDocs: DataFrame): (DataFrame, DataFrame, DataFrame, DataFrame) = {
    val (postD, dlD) = bm25IndexParts(deltaDocs)
    // additive maintenance: postings/doclens append; df outer-adds; scalars add
    val dfD = postD.groupBy(col("term")).agg(count(lit(1)).as("df_d"))
    val dfM = dfBase.join(dfD, Seq("term"), "full_outer")
      .select(col("term"),
        (coalesce(col("df"), lit(0L)) + coalesce(col("df_d"), lit(0L))).as("df"))
    val scD = dlD.agg(count(lit(1)).as("n_docs_d"), sum(col("len")).as("sum_len_d"))
    val scM = scBase.crossJoin(scD).select(
      (col("n_docs") + col("n_docs_d")).as("n_docs"),
      (col("sum_len") + coalesce(col("sum_len_d"), lit(0L))).as("sum_len"))
    (postBase.union(postD), dlBase.union(dlD), dfM, scM)
  }

  /** One full maintenance CYCLE over the four persisted BM25 artifacts:
    * apply an arrival batch (additive) then a departure batch
    * (subtractive) and return the maintained artifact set — the unit the
    * write-back loop persists between batches (Stores.bm25Cycle2Store).
    * Counts are exact, so upsert∘delete composes losslessly in any
    * order; the hash gate proves it against one from-scratch index of
    * the final corpus. */
  def bm25MaintainCycle(postBase: DataFrame, dlBase: DataFrame,
                        dfBase: DataFrame, scBase: DataFrame,
                        arrivals: DataFrame, departures: DataFrame)
      : (DataFrame, DataFrame, DataFrame, DataFrame) = {
    val (p1, d1, f1, s1) =
      bm25UpsertArtifacts(postBase, dlBase, dfBase, scBase, arrivals)
    bm25DeleteArtifacts(p1, d1, f1, s1, departures)
  }

  /** Score fixed query terms FROM maintained index artifacts — the tail
    * shared by the upsert and delete directions of BM25 index
    * maintenance: tf via a query-term pivot over the postings (at scale:
    * a pushed term filter over term-bucketed postings), df/N/avgdl via
    * one broadcast stats row, doclens joined per scoring row. */
  private def bm25ScoreFromIndex(postings: DataFrame, doclens: DataFrame,
                                 dfM: DataFrame, scM: DataFrame, terms: Seq[String],
                                 k1: Double, b: Double, limit: Int): DataFrame = {
    def pivot(value: Column, prefix: String): Seq[Column] = terms.indices.map(i =>
      coalesce(sum(when(col("term") === terms(i), value)), lit(0L))
        .as(s"$prefix$i"))
    val qpost = postings.filter(col("term").isin(terms: _*))
    val tfCols = pivot(col("n_occ"), "tf_")
    val tfs = qpost.groupBy(col("doc_id")).agg(tfCols.head, tfCols.tail: _*)
    val dfColsP = pivot(col("df"), "df_")
    val dfRow = dfM.filter(col("term").isin(terms: _*))
      .agg(dfColsP.head, dfColsP.tail: _*)
    val stats = dfRow.crossJoin(scM)
    val avgdl = col("sum_len").cast("double") / col("n_docs").cast("double")
    def tscore(i: Int): Column = {
      val tf = col(s"tf_$i").cast("double")
      val idf = ((col("n_docs") - col(s"df_$i")).cast("double") + lit(0.5)) /
        (col(s"df_$i").cast("double") + lit(0.5))
      idf * (tf * lit(k1 + 1.0)) /
        (tf + lit(k1) * (lit(1.0 - b) + lit(b) * (col("len").cast("double") / avgdl)))
    }
    val score = terms.indices.map(tscore).reduce(_ + _)
    tfs.join(doclens, Seq("doc_id"))
      .crossJoin(broadcast(stats))
      .select(col("doc_id"), score.as("score"))
      .filter(col("score") > 0.0)
      .orderBy(desc("score"), col("doc_id"))
      .limit(limit)
  }

  /** Pure READ path of the BM25 index family: score the query terms from
    * the four PERSISTED artifacts with zero maintenance work — the serving
    * shape (Stores.bm25SearchStore registers it over the bucketed postings
    * store, where the query-term restriction is a bucket prune). tf is the
    * index's exact-token count, so the oracle is the tokenized from-scratch
    * recompute over the full corpus ([[bm25UpsertSql]]) — the hash gate
    * proves store round-trip + read-path scoring equals a fresh index. */
  def bm25SearchFrom(postings: DataFrame, doclens: DataFrame, dfM: DataFrame,
                     scM: DataFrame, terms: Seq[String], k1: Double = 1.2,
                     b: Double = 0.75, limit: Int = 30): DataFrame =
    bm25ScoreFromIndex(postings, doclens, dfM, scM, terms, k1, b, limit)

  /** DELETE direction of BM25 index maintenance — the retract half the
    * upsert scaladoc declares possible: every index artifact is ADDITIVE,
    * so a departure batch (delta = doc_id%10 == 0, the deterministic
    * stand-in for "just deleted") maintains the standing index with
    * O(Δ text) tokenize work and exact SUBTRACTION — postings/doclens
    * drop the deleted doc_ids (per-(term,doc) rows make that an anti-join
    * against the delete list; at scale a broadcast anti-join over the
    * query-term-pruned slice), df decrements by the deleted docs that
    * contained each term, the corpus scalars subtract. No surviving text
    * is ever re-read. Reference analog: graph_service.py:241 delete_node —
    * Neo4j maintains its fulltext index through entity deletes.
    *
    * The oracle recomputes BM25 from scratch over the POST-DELETE corpus,
    * so the hash gate proves subtractive maintenance exact: a stale df, a
    * surviving posting of a deleted doc, or an unsubtracted scalar breaks
    * the hash. Exactness is structural, not approximate: counts subtract
    * to precisely the survivor-only values (unlike sketch families where
    * deletes need turnstile variants). */
  def bm25Delete(documents: DataFrame, terms: Seq[String], k1: Double = 1.2,
                 b: Double = 0.75, limit: Int = 30): DataFrame = {
    val isDel = pmod(col("doc_id"), lit(10L)) === 0L
    // standing index over the full corpus (persisted tables in production)
    val (postBase, dlBase) = bm25IndexParts(documents)
    val dfBase = postBase.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val scBase = dlBase.agg(count(lit(1)).as("n_docs"), sum(col("len")).as("sum_len"))
    bm25DeleteFrom(postBase, dlBase, dfBase, scBase,
      documents.filter(isDel), terms, k1, b, limit)
  }

  /** Production-shaped core of [[bm25Delete]]: given the PERSISTED
    * standing index and the departing docs (id + text — in an engine that
    * stores postings doc-keyed, the text re-tokenize is replaced by a
    * doc-keyed postings fetch; both are O(Δ)), subtract their
    * contributions from all four artifacts and score the query terms from
    * the result. */
  def bm25DeleteFrom(postBase: DataFrame, dlBase: DataFrame, dfBase: DataFrame,
                     scBase: DataFrame, delDocs: DataFrame, terms: Seq[String],
                     k1: Double = 1.2, b: Double = 0.75, limit: Int = 30): DataFrame = {
    val (postM, dlM, dfM, scM) =
      bm25DeleteArtifacts(postBase, dlBase, dfBase, scBase, delDocs)
    bm25ScoreFromIndex(postM, dlM, dfM, scM, terms, k1, b, limit)
  }

  /** The maintained (postings, doclens, df, scalars) after the delete —
    * package-level so the delete-then-reinsert identity spec can compose
    * them back through [[bm25UpsertFrom]]. */
  private[graft] def bm25DeleteArtifacts(
      postBase: DataFrame, dlBase: DataFrame, dfBase: DataFrame,
      scBase: DataFrame, delDocs: DataFrame): (DataFrame, DataFrame, DataFrame, DataFrame) = {
    val (postD, dlD) = bm25IndexParts(delDocs)
    val delIds = delDocs.select(col("doc_id"))
    // subtractive maintenance: df decrements (terms reaching 0 drop out of
    // the dictionary), scalars subtract, postings/doclens anti-join the
    // delete list (broadcast at scale — the delete batch is tiny)
    val dfD = postD.groupBy(col("term")).agg(count(lit(1)).as("df_d"))
    val dfM = dfBase.join(dfD, Seq("term"), "left_outer")
      .select(col("term"),
        (col("df") - coalesce(col("df_d"), lit(0L))).as("df"))
      .filter(col("df") > 0L)
    val scD = dlD.agg(count(lit(1)).as("n_docs_d"), sum(col("len")).as("sum_len_d"))
    val scM = scBase.crossJoin(scD).select(
      (col("n_docs") - col("n_docs_d")).as("n_docs"),
      (col("sum_len") - coalesce(col("sum_len_d"), lit(0L))).as("sum_len"))
    // re-select canonical column order: the USING anti-join fronts the key
    // column, and downstream unions (bm25UpsertFrom's positional
    // postBase.union(postD)) align by position
    val postM = postBase.join(broadcast(delIds), Seq("doc_id"), "left_anti")
      .select(col("term"), col("doc_id"), col("n_occ"))
    val dlM = dlBase.join(broadcast(delIds), Seq("doc_id"), "left_anti")
      .select(col("doc_id"), col("len"))
    (postM, dlM, dfM, scM)
  }

  /** Oracle for [[bm25Upsert]]: full-corpus from-scratch BM25 over the
    * SAME tokenized-tf definition — identical output iff the additive
    * index maintenance loses (and invents) nothing. */
  def bm25UpsertSql(terms: Seq[String], k1: Double = 1.2, b: Double = 0.75,
                    limit: Int = 30): String =
    bm25TokenizedSql("documents", terms, k1, b, limit)

  /** Oracle for [[bm25Delete]]: from-scratch BM25 over the POST-DELETE
    * corpus — identical output iff subtractive maintenance is exact. */
  def bm25DeleteSql(terms: Seq[String], k1: Double = 1.2, b: Double = 0.75,
                    limit: Int = 30): String =
    bm25TokenizedSql("(SELECT * FROM documents WHERE doc_id % 10 <> 0)",
      terms, k1, b, limit)

  /** Oracle for the two-cycle WRITE-BACK rung (Stores.bm25Cycle2Store):
    * one from-scratch BM25 index of the corpus after BOTH maintenance
    * cycles — base (%10 != 0) ⊎ arrivals₁ (%20 == 0) ∖ departures₁
    * (%20 == 5) ⊎ arrivals₂ (%20 == 10) ∖ departures₂ (%20 == 15) =
    * every doc with doc_id %20 ∉ {5, 15}. Hash-equality proves cycle 1's
    * artifacts written back to the catalog and REREAD by cycle 2 carry
    * exact counts across the persistence boundary. */
  def bm25Cycle2Sql(terms: Seq[String], k1: Double = 1.2, b: Double = 0.75,
                    limit: Int = 30): String =
    bm25TokenizedSql("(SELECT * FROM documents WHERE doc_id % 20 NOT IN (5, 15))",
      terms, k1, b, limit)

  private def bm25TokenizedSql(docsRel: String, terms: Seq[String], k1: Double,
                               b: Double, limit: Int): String = {
    val tfJoins = terms.indices.map(i =>
      s"LEFT JOIN post p$i ON p$i.doc_id = dl.doc_id AND p$i.term = '${terms(i)}'")
      .mkString("\n       |  ")
    val tfCols = terms.indices.map(i =>
      s"COALESCE(p$i.n_occ, 0) AS tf_$i").mkString(", ")
    val dfCols = terms.indices.map(i =>
      s"CAST(COALESCE((SELECT df FROM dfs WHERE term = '${terms(i)}'), 0) AS BIGINT) AS df_$i")
      .mkString(", ")
    val avgdl = "(CAST(sum_len AS DOUBLE) / CAST(n_docs AS DOUBLE))"
    val score = terms.indices.map { i =>
      val idf = s"((CAST(n_docs - df_$i AS DOUBLE) + 0.5) / (CAST(df_$i AS DOUBLE) + 0.5))"
      s"$idf * (CAST(tf_$i AS DOUBLE) * ${k1 + 1.0}) / " +
        s"(CAST(tf_$i AS DOUBLE) + $k1 * (${1.0 - b} + $b * (CAST(len AS DOUBLE) / $avgdl)))"
    }.reduce((a, c) => s"($a + $c)")
    s"""WITH toks AS (
       |  SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS term
       |  FROM $docsRel),
       |post AS MATERIALIZED (
       |  SELECT term, doc_id, CAST(COUNT(*) AS BIGINT) AS n_occ
       |  FROM toks GROUP BY 1, 2),
       |dl AS (
       |  SELECT doc_id, CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS len
       |  FROM $docsRel),
       |dfs AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM post GROUP BY term),
       |st AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs, CAST(SUM(len) AS BIGINT) AS sum_len FROM dl),
       |f AS (
       |  SELECT dl.doc_id, dl.len, $tfCols
       |  FROM dl
       |  $tfJoins),
       |sc AS (
       |  SELECT doc_id, $score AS score FROM f CROSS JOIN st CROSS JOIN (SELECT $dfCols FROM st) d)
       |SELECT doc_id, score FROM sc
       |WHERE score > 0.0 ORDER BY score DESC, doc_id LIMIT $limit""".stripMargin
  }
}
