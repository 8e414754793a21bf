package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Multi-format document loading — the reference's ingestion loaders
  * (services/pipeline/loaders.py: markdown/code/plain-text with per-type
  * routing) re-expressed as distributed readers: whole files in parallel via
  * binaryFile (no driver-side walking), language/type classified from the
  * path, ready to feed Chunking/Embedding.
  */
object Loaders {

  private val extLang: Seq[(String, String)] = Seq(
    ".md" -> "markdown", ".py" -> "python", ".scala" -> "scala",
    ".java" -> "java", ".sql" -> "sql", ".json" -> "json", ".txt" -> "text")

  /** Classify a path column into the reference's document types. */
  def docType(path: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    extLang.foldRight(lit("unknown")) { case ((ext, lang), acc) =>
      when(lower(path).endsWith(ext), lang).otherwise(acc)
    }

  /** Read a directory tree of text-ish documents as (path, doc_type, text,
    * n_bytes) — `binaryFile` scans in parallel across executors; decoding is
    * a narrow transform. */
  def readDocuments(spark: SparkSession, dir: String, glob: String = "*"): DataFrame =
    spark.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .option("recursiveFileLookup", "true")
      .load(dir)
      .select(
        col("path"),
        docType(col("path")).as("doc_type"),
        decode(col("content"), "UTF-8").as("text"),
        col("length").as("n_bytes"))

  /** Markdown header split, reference-exact (transformers.py:91
    * `_split_by_headers` + the `_transform_markdown` section loop): a
    * `^#{1,6}\s` line STARTS a section; the title is the header minus the
    * hashes; the header line itself is NOT part of the content; content
    * before the first header carries a null title (surfaced as
    * "Section i+1"); a header with no following lines produces nothing;
    * all-blank sections consume an index but emit no row.
    *
    * Formulated as: explode lines → running header count = section id
    * (one per-doc window — the per-key sort Spark's WindowExec does
    * anyway) → group to (title, ordered content join). Scales per-doc. */
  def splitMarkdownSections(docs: DataFrame): DataFrame = {
    val lines = docs.select(col("path"), posexplode(split(col("text"), "\n")))
      .withColumnRenamed("col", "line")
    val isH = col("line").rlike("""^#{1,6}\s""")
    val wsec = Window.partitionBy("path").orderBy("pos")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val marked = lines.withColumn("is_h", isH)
      .withColumn("sec", sum(col("is_h").cast("long")).over(wsec))
    val grouped = marked.groupBy(col("path"), col("sec"))
      .agg(
        max(when(col("is_h"),
          trim(regexp_replace(col("line"), """^#{1,6}\s+""", "")))).as("title"),
        array_join(transform(
          array_sort(collect_list(when(!col("is_h"), struct(col("pos"), col("line"))))),
          x => x.getField("line")), "\n").as("content"),
        count(when(!col("is_h"), lit(1))).as("n_lines"))
    val widx = Window.partitionBy("path").orderBy("sec")
    grouped.filter(col("n_lines") > 0)
      .withColumn("section_index", (row_number().over(widx) - 1).cast("long"))
      .filter(trim(col("content")) =!= "")
      .select(col("path"), col("section_index"),
        coalesce(col("title"),
          concat(lit("Section "), (col("section_index") + 1).cast("string"))).as("title"),
        col("content"), length(col("content")).cast("long").as("n_chars"))
  }

  /** Deterministic markdown corpus derived from `documents` — exercises
    * preamble-without-header, blank lines inside a section, a header
    * immediately followed by another header, and a trailing header with no
    * content. The DuckDB oracle rebuilds it identically. */
  def syntheticMarkdownView(documents: DataFrame): DataFrame = {
    val ws = split(col("text"), " ")
    def wd(i: Int) = element_at(ws, i)
    val id = col("doc_id").cast("string")
    val nl = lit("\n")
    documents.select(
      concat(col("source"), lit("/m"), id, lit(".md")).as("path"),
      concat(
        lit("intro for "), col("source"), nl,
        lit("# Overview "), wd(1), nl,
        lit("body alpha"), nl,
        lit("## Details "), wd(2), nl,
        lit("body beta "), wd(4), nl, nl,
        lit("## Usage "), wd(3), nl,
        lit("body gamma"), nl,
        lit("### Trailing "), wd(1)).as("text"))
  }

  /** DuckDB oracle: identical corpus + header-split semantics. */
  val splitMarkdownSql: String =
    raw"""WITH w AS (
       |  SELECT doc_id, source, string_split(text, ' ') AS ws FROM documents),
       |md AS (
       |  SELECT source || '/m' || doc_id || '.md' AS path,
       |    'intro for ' || source || chr(10) ||
       |    '# Overview ' || ws[1] || chr(10) ||
       |    'body alpha' || chr(10) ||
       |    '## Details ' || ws[2] || chr(10) ||
       |    'body beta ' || ws[4] || chr(10) || chr(10) ||
       |    '## Usage ' || ws[3] || chr(10) ||
       |    'body gamma' || chr(10) ||
       |    '### Trailing ' || ws[1] AS text
       |  FROM w),
       |l AS (
       |  SELECT path,
       |    unnest(generate_series(1, len(string_split(text, chr(10))))) AS pos,
       |    unnest(string_split(text, chr(10))) AS line
       |  FROM md),
       |h AS (
       |  SELECT path, pos, line, regexp_matches(line, '^#{1,6}\s') AS is_h FROM l),
       |s AS (
       |  SELECT *, SUM(CASE WHEN is_h THEN 1 ELSE 0 END)
       |    OVER (PARTITION BY path ORDER BY pos) AS sec FROM h),
       |g AS (
       |  SELECT path, sec,
       |    max(CASE WHEN is_h THEN trim(regexp_replace(line, '^#{1,6}\s+', '')) END) AS title,
       |    string_agg(CASE WHEN NOT is_h THEN line END, chr(10) ORDER BY pos) AS content,
       |    count(CASE WHEN NOT is_h THEN 1 END) AS n_lines
       |  FROM s GROUP BY path, sec),
       |e AS (
       |  SELECT path, title, content,
       |    row_number() OVER (PARTITION BY path ORDER BY sec) - 1 AS section_index
       |  FROM g WHERE n_lines > 0)
       |SELECT path, CAST(section_index AS BIGINT) AS section_index,
       |  COALESCE(title, 'Section ' || (section_index + 1)) AS title,
       |  content, CAST(length(content) AS BIGINT) AS n_chars
       |FROM e WHERE trim(content) <> ''""".stripMargin

  /** Markdown heading OUTLINE with parent links — the document structure
    * tree (transformers.py's header metadata, one level deeper): heading
    * level from the leading-# run, parent = the most recent
    * strictly-smaller-level heading, recovered with per-level "last seen
    * index" window maxima over strictly-preceding rows (no per-row
    * conditional window needed). NULL-free greatest: both engines compute
    * greatest over COALESCE(…, 0) then NULLIF back — DuckDB's GREATEST
    * and Spark's differ on NULL handling, integers don't. */
  def markdownOutline(markdown: DataFrame): DataFrame = {
    val lines = markdown.select(col("path"),
      posexplode(split(col("text"), "\n")).as(Seq("pos", "line")))
    val heads = lines.filter(col("line").rlike("^#{1,6} "))
      .withColumn("level", length(regexp_extract(col("line"), "^(#+)", 1)).cast("long"))
      .withColumn("title", trim(regexp_replace(col("line"), "^#+\\s*", "")))
    val w = Window.partitionBy("path").orderBy("pos")
    val prev = w.rowsBetween(Window.unboundedPreceding, -1)
    heads
      .withColumn("idx", row_number().over(w).cast("long"))
      .withColumn("l1", max(when(col("level") === 1L, col("idx"))).over(prev))
      .withColumn("l2", max(when(col("level") === 2L, col("idx"))).over(prev))
      .withColumn("parent_idx",
        when(col("level") === 1L, lit(null).cast("long"))
          .when(col("level") === 2L, col("l1"))
          .otherwise(nullif(greatest(coalesce(col("l1"), lit(0L)),
            coalesce(col("l2"), lit(0L))), lit(0L))))
      .select(col("path"), col("idx"), col("level"), col("title"), col("parent_idx"))
  }

  val markdownOutlineSql: String =
    raw"""WITH w AS (
      |  SELECT doc_id, source, string_split(text, ' ') AS ws FROM documents),
      |md AS (
      |  SELECT source || '/m' || doc_id || '.md' AS path,
      |    'intro for ' || source || chr(10) ||
      |    '# Overview ' || ws[1] || chr(10) ||
      |    'body alpha' || chr(10) ||
      |    '## Details ' || ws[2] || chr(10) ||
      |    'body beta ' || ws[4] || chr(10) || chr(10) ||
      |    '## Usage ' || ws[3] || chr(10) ||
      |    'body gamma' || chr(10) ||
      |    '### Trailing ' || ws[1] AS text
      |  FROM w),
      |ln AS (
      |  SELECT path,
      |    unnest(string_split(text, chr(10))) AS line,
      |    unnest(range(1, len(string_split(text, chr(10))) + 1)) AS pos
      |  FROM md),
      |h AS (
      |  SELECT path, pos,
      |    CAST(length(regexp_extract(line, '^(#+)', 1)) AS BIGINT) AS level,
      |    trim(regexp_replace(line, '^#+\s*', '')) AS title
      |  FROM ln WHERE regexp_matches(line, '^#{1,6} ')),
      |x AS (
      |  SELECT path, pos, level, title,
      |    CAST(ROW_NUMBER() OVER w AS BIGINT) AS idx
      |  FROM h WINDOW w AS (PARTITION BY path ORDER BY pos)),
      |y AS (
      |  SELECT path, idx, level, title,
      |    MAX(CASE WHEN level = 1 THEN idx END) OVER wp AS l1,
      |    MAX(CASE WHEN level = 2 THEN idx END) OVER wp AS l2
      |  FROM x WINDOW wp AS (PARTITION BY path ORDER BY idx
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))
      |SELECT path, idx, level, title,
      |  CASE WHEN level = 1 THEN NULL
      |       WHEN level = 2 THEN l1
      |       ELSE NULLIF(GREATEST(COALESCE(l1, 0), COALESCE(l2, 0)), 0) END AS parent_idx
      |FROM y""".stripMargin
}
