package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Repository scan gating — the reference's ingest front door
  * (code_ingestor.py `scan_files`: include globs, exclude globs, per-file
  * info with language-from-extension). Re-expressed as ONE narrow codegen'd
  * classification pass over a (path, size) listing: at 100 TB the listing
  * is a metadata table (file manifest), and gating it never touches file
  * contents — the verdict column then drives which objects the loaders
  * actually read. Glob semantics are re-expressed as anchored LIKE/prefix
  * rules (portable to the oracle; fnmatch globs and SQL LIKE agree on the
  * patterns used here).
  *
  * The test corpus carries no real paths, so a deterministic path view is
  * derived from `documents` (7 shapes keyed by doc_id % 7, covering source
  * dirs, vendored deps, binary assets, tests, and docs); the DuckDB oracle
  * rebuilds the identical view, so the gating rules are hash-verified.
  */
object RepoScan {

  /** Deterministic (doc_id, path, size) listing derived from documents. */
  def syntheticPathView(documents: DataFrame): DataFrame = {
    val w1 = element_at(split(col("text"), " "), 1)
    val w2 = element_at(split(col("text"), " "), 2)
    val path = when(col("doc_id") % 7 === 0, concat(lit("src/"), w1, lit(".py")))
      .when(col("doc_id") % 7 === 1, concat(lit("src/"), w1, lit(".js")))
      .when(col("doc_id") % 7 === 2, concat(lit("lib/"), w2, lit(".java")))
      .when(col("doc_id") % 7 === 3,
        concat(lit("node_modules/"), w1, lit("/"), w2, lit(".js")))
      .when(col("doc_id") % 7 === 4, concat(lit("assets/"), w1, lit(".png")))
      .when(col("doc_id") % 7 === 5, concat(lit("tests/test_"), w1, lit(".py")))
      .otherwise(concat(lit("docs/"), w1, lit(".md")))
    documents.select(col("doc_id"), path.as("path"), col("n_chars").as("size"))
  }

  val syntheticPathViewSql: String =
    """SELECT doc_id,
      |CASE WHEN doc_id % 7 = 0 THEN 'src/' || string_split(text, ' ')[1] || '.py'
      |     WHEN doc_id % 7 = 1 THEN 'src/' || string_split(text, ' ')[1] || '.js'
      |     WHEN doc_id % 7 = 2 THEN 'lib/' || string_split(text, ' ')[2] || '.java'
      |     WHEN doc_id % 7 = 3 THEN 'node_modules/' || string_split(text, ' ')[1] || '/' || string_split(text, ' ')[2] || '.js'
      |     WHEN doc_id % 7 = 4 THEN 'assets/' || string_split(text, ' ')[1] || '.png'
      |     WHEN doc_id % 7 = 5 THEN 'tests/test_' || string_split(text, ' ')[1] || '.py'
      |     ELSE 'docs/' || string_split(text, ' ')[1] || '.md' END AS path,
      |n_chars AS size
      |FROM documents""".stripMargin

  /** scan_files gating: exclude dirs first (as os.walk pruning does), then
    * the include-glob allowlist, then a size cap; survivors get language
    * from extension. */
  def repoScan(listing: DataFrame, maxSize: Long = 400L): DataFrame = {
    def ext(e: String): Column = col("path").endsWith("." + e)
    val language = when(ext("py"), "python").when(ext("js"), "javascript")
      .when(ext("java"), "java").when(ext("md"), "markdown")
      .otherwise("unknown")
    listing.select(
      col("doc_id"), col("path"),
      when(col("path").startsWith("node_modules/") ||
             col("path").startsWith(".git/"), "excluded_dir")
        .when(!(ext("py") || ext("js") || ext("java") || ext("md")), "not_included")
        .when(col("size") > maxSize, "too_large")
        .otherwise("ingest").as("verdict"),
      language.as("language"))
  }

  def repoScanSql(maxSize: Long = 400L): String =
    s"""WITH listing AS ($syntheticPathViewSql)
       |SELECT doc_id, path,
       |CASE WHEN path LIKE 'node_modules/%' OR path LIKE '.git/%' THEN 'excluded_dir'
       |     WHEN NOT (path LIKE '%.py' OR path LIKE '%.js' OR path LIKE '%.java' OR path LIKE '%.md')
       |       THEN 'not_included'
       |     WHEN size > $maxSize THEN 'too_large'
       |     ELSE 'ingest' END AS verdict,
       |CASE WHEN path LIKE '%.py' THEN 'python' WHEN path LIKE '%.js' THEN 'javascript'
       |     WHEN path LIKE '%.java' THEN 'java' WHEN path LIKE '%.md' THEN 'markdown'
       |     ELSE 'unknown' END AS language
       |FROM listing""".stripMargin
}
