package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Memory-store analogs (services/memory/memory_store.py) over the
  * `documents` table: type ≙ lang, project ≙ source, recency ≙ doc_id.
  * Search = filter + keyword score × recency decay; summary = per-project
  * rollup; supersede = latest-per-lineage resolution — all single-shuffle
  * declarative plans.
  */
object Memory {

  private def occ(term: String) =
    ((length(col("text")) - length(regexp_replace(col("text"), java.util.regex.Pattern.quote(term), ""))) / term.length).cast("long")

  private def occSql(term: String) =
    s"CAST((length(text) - length(replace(text, '$term', '')))/${term.length} AS BIGINT)"

  /** search_memories (:236): type filter + keyword relevance × recency decay. */
  def search(documents: DataFrame, terms: Seq[String], memType: String = "en",
             limit: Int = 20): DataFrame = {
    val kw = terms.map(occ).reduce(_ + _)
    val maxId = documents.agg(max(col("doc_id")).as("max_id"))
    documents
      .filter(col("lang") === memType)
      .crossJoin(broadcast(maxId))
      .withColumn("kw", kw)
      .filter(col("kw") > 0)
      .withColumn("score",
        col("kw").cast("double") /
          (lit(1.0) + (col("max_id") - col("doc_id")).cast("double") / lit(500.0)))
      .select(col("doc_id"), col("score"))
      .orderBy(desc("score"), col("doc_id"))
      .limit(limit)
  }

  def searchSql(terms: Seq[String], memType: String = "en", limit: Int = 20): String = {
    val kw = terms.map(occSql).mkString(" + ")
    s"""WITH m AS (SELECT MAX(doc_id) AS max_id FROM documents)
       |SELECT doc_id,
       |  CAST($kw AS DOUBLE) / (CAST(1.0 AS DOUBLE) + CAST(max_id - doc_id AS DOUBLE) / CAST(500.0 AS DOUBLE)) AS score
       |FROM documents, m
       |WHERE lang = '$memType' AND ($kw) > 0
       |ORDER BY score DESC, doc_id LIMIT $limit""".stripMargin
  }

  /** _link_related_refs (:207): RELATES_TO edges between memories sharing
    * a ref. Refs here are the document's leading bigram (real refs are
    * ticket ids/URLs — sparse by nature, which is what bounds the
    * per-ref bucket and keeps the self-join linear-ish; an unbounded hot
    * ref would need the same salting story as any hot key). Inverted-index
    * self-join: memories sharing no ref never materialize a pair. */
  def relate(documents: DataFrame): DataFrame = {
    val ws = split(col("text"), " ")
    val refs = documents.select(col("doc_id"),
      concat(element_at(ws, 1), lit("-"), element_at(ws, 2)).as("ref"))
    refs.as("a").join(refs.as("b"),
        col("a.ref") === col("b.ref") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("mem_a"), col("b.doc_id").as("mem_b"),
        col("a.ref").as("ref"), lit("RELATES_TO").as("rel"))
  }

  val relateSql: String =
    """WITH r AS (SELECT doc_id,
      |  string_split(text, ' ')[1] || '-' || string_split(text, ' ')[2] AS ref
      |  FROM documents)
      |SELECT a.doc_id AS mem_a, b.doc_id AS mem_b, a.ref AS ref,
      |  'RELATES_TO' AS rel
      |FROM r a JOIN r b ON a.ref = b.ref AND a.doc_id < b.doc_id""".stripMargin

  /** get_project_summary (:561): per-project/type counts + latest entry. */
  def summary(documents: DataFrame): DataFrame =
    documents.groupBy(col("source"), col("lang"))
      .agg(count(lit(1)).as("n_memories"),
        max(col("doc_id")).as("latest_id"),
        sum(col("n_chars")).as("total_chars"))

  val summarySql: String =
    """SELECT source, lang, COUNT(*) AS n_memories, MAX(doc_id) AS latest_id,
      |CAST(SUM(n_chars) AS BIGINT) AS total_chars
      |FROM documents GROUP BY source, lang""".stripMargin

  /** Rule-based memory extraction (memory_extractor.py:735 — "TODO:" → plan,
    * "FIXME:"/"BUG:" → experience; marker keyword → memory kind), adapted to
    * the corpus vocabulary: classify each document by its strongest marker
    * term and emit (doc_id, kind, evidence-count). Single scan, codegen'd. */
  def extract(documents: DataFrame): DataFrame =
    documents
      .withColumn("kind",
        when(occ("slow") >= 2, "experience")
          .when(occ("batch") >= 2, "plan")
          .when(occ("stream") >= 2, "pattern")
          .when(occ("query") >= 2, "decision")
          .otherwise("fact"))
      .withColumn("evidence",
        occ("slow") + occ("batch") + occ("stream") + occ("query"))
      .select(col("doc_id"), col("kind"), col("evidence"))

  val extractSql: String =
    s"""SELECT doc_id,
       |CASE WHEN ${occSql("slow")} >= 2 THEN 'experience'
       |     WHEN ${occSql("batch")} >= 2 THEN 'plan'
       |     WHEN ${occSql("stream")} >= 2 THEN 'pattern'
       |     WHEN ${occSql("query")} >= 2 THEN 'decision'
       |     ELSE 'fact' END AS kind,
       |${occSql("slow")} + ${occSql("batch")} + ${occSql("stream")} + ${occSql("query")} AS evidence
       |FROM documents""".stripMargin

  /** Git-commit memory extraction (memory_extractor.py:175
    * `extract_from_git_commit`): the reference LLM-classifies commits into
    * feature→decision, fix→experience, refactor→convention, breaking→
    * high-importance decision; here the same taxonomy is a rule chain over
    * conventional-commit prefixes — one narrow pass over a commit log of
    * any size. The synthetic commit view derives messages from `documents`
    * deterministically so the oracle replays it. */
  def extractCommits(documents: DataFrame): DataFrame = {
    val w1 = element_at(split(col("text"), " "), 1)
    val msg = when(col("doc_id") % 5 === 0, concat(lit("feat: add "), w1))
      .when(col("doc_id") % 5 === 1, concat(lit("fix: repair "), w1))
      .when(col("doc_id") % 5 === 2, concat(lit("refactor: clean "), w1))
      .when(col("doc_id") % 5 === 3, concat(lit("feat!: breaking "), w1))
      .otherwise(concat(lit("docs: note "), w1))
    documents
      .select(col("doc_id"), md5(col("text")).as("sha"), msg.as("message"))
      .withColumn("kind",
        when(col("message").startsWith("feat!"), "decision")
          .when(col("message").startsWith("feat"), "decision")
          .when(col("message").startsWith("fix"), "experience")
          .when(col("message").startsWith("refactor"), "convention")
          .otherwise("fact"))
      .withColumn("importance",
        when(col("message").startsWith("feat!"), "high").otherwise("normal"))
      .select(col("doc_id"), col("sha"), col("kind"), col("importance"))
  }

  val extractCommitsSql: String =
    """WITH c AS (
      |  SELECT doc_id, md5(text) AS sha,
      |    CASE WHEN doc_id % 5 = 0 THEN 'feat: add ' || string_split(text, ' ')[1]
      |         WHEN doc_id % 5 = 1 THEN 'fix: repair ' || string_split(text, ' ')[1]
      |         WHEN doc_id % 5 = 2 THEN 'refactor: clean ' || string_split(text, ' ')[1]
      |         WHEN doc_id % 5 = 3 THEN 'feat!: breaking ' || string_split(text, ' ')[1]
      |         ELSE 'docs: note ' || string_split(text, ' ')[1] END AS message
      |  FROM documents)
      |SELECT doc_id, sha,
      |  CASE WHEN message LIKE 'feat!%' THEN 'decision'
      |       WHEN message LIKE 'feat%' THEN 'decision'
      |       WHEN message LIKE 'fix%' THEN 'experience'
      |       WHEN message LIKE 'refactor%' THEN 'convention'
      |       ELSE 'fact' END AS kind,
      |  CASE WHEN message LIKE 'feat!%' THEN 'high' ELSE 'normal' END AS importance
      |FROM c""".stripMargin

  /** supersede_memory (:490) resolution: each lineage (doc_id mod 100) forms
    * a supersede chain; resolve to the latest valid version per lineage. */
  def supersedeResolve(documents: DataFrame): DataFrame = {
    val w = Window.partitionBy("lineage").orderBy(desc("doc_id"))
    documents
      .withColumn("lineage", pmod(col("doc_id"), lit(100L)))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .groupBy(col("lineage"))
      .agg(max(col("doc_id")).as("latest_doc_id"))
      .join(
        documents.withColumn("lineage", pmod(col("doc_id"), lit(100L)))
          .groupBy("lineage").agg(count(lit(1)).as("n_versions")),
        Seq("lineage"))
  }

  val supersedeResolveSql: String =
    """SELECT doc_id % 100 AS lineage, MAX(doc_id) AS latest_doc_id, COUNT(*) AS n_versions
      |FROM documents GROUP BY 1""".stripMargin

  /** _combine_related_comments (memory_extractor.py:774): after extraction,
    * keep only the top MAX_ITEMS_PER_TYPE (=3) memories PER TYPE by
    * importance, deduplicating the flood of similar comments. Re-expressed
    * per project (source ≙ project): a (source, kind)-partitioned window —
    * never global, groups are small by construction — ranking by evidence
    * (≙ importance) with doc_id as the deterministic tie-break (the
    * reference's stable Python sort keeps insertion order; doc_id IS
    * insertion order here). */
  def combine(documents: DataFrame, perType: Int = 3): DataFrame = {
    val mems = documents
      .withColumn("kind",
        when(occ("slow") >= 2, "experience")
          .when(occ("batch") >= 2, "plan")
          .when(occ("stream") >= 2, "pattern")
          .when(occ("query") >= 2, "decision")
          .otherwise("fact"))
      .withColumn("evidence",
        occ("slow") + occ("batch") + occ("stream") + occ("query"))
      .select(col("doc_id"), col("source"), col("kind"), col("evidence"))
    val w = Window.partitionBy(col("source"), col("kind"))
      .orderBy(desc("evidence"), col("doc_id"))
    mems.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= perType)
      .select(col("source"), col("kind"), col("doc_id"), col("evidence"), col("rank"))
  }

  def combineSql(perType: Int = 3): String =
    s"""WITH mems AS (
       |  SELECT doc_id, source,
       |    CASE WHEN ${occSql("slow")} >= 2 THEN 'experience'
       |         WHEN ${occSql("batch")} >= 2 THEN 'plan'
       |         WHEN ${occSql("stream")} >= 2 THEN 'pattern'
       |         WHEN ${occSql("query")} >= 2 THEN 'decision'
       |         ELSE 'fact' END AS kind,
       |    ${occSql("slow")} + ${occSql("batch")} + ${occSql("stream")} + ${occSql("query")} AS evidence
       |  FROM documents),
       |rk AS (
       |  SELECT source, kind, doc_id, evidence,
       |    ROW_NUMBER() OVER (PARTITION BY source, kind
       |                       ORDER BY evidence DESC, doc_id) AS rank
       |  FROM mems)
       |SELECT source, kind, doc_id, evidence, rank FROM rk WHERE rank <= $perType""".stripMargin
}
