package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Code-dependency extraction — the reference's largest ingestion surface
  * (services/pipeline/transformers.py:165 `CodeTransformer`): per-language
  * import / definition / inheritance extraction producing the
  * `(src, dst, rel)` edge table that feeds the code knowledge graph
  * (transformers.py:341 `_extract_python_imports`, :480
  * `_extract_js_imports`, :560 Java, :855 Go).
  *
  * The reference walks a Python AST and regex-scans the other languages;
  * here every language path is a regex rule set evaluated in ONE narrow
  * codegen'd pass: explode lines → evaluate all (language-gated) patterns
  * per line → explode candidate edges → drop non-matches. No shuffle at
  * all — at 100 TB this scales linearly with input, and the output feeds
  * the existing GraphOps joins.
  */
object CodeEdges {

  // --- patterns shared verbatim with the DuckDB oracle (Java regex ∩ RE2:
  //     no backrefs, no lookaround) ---
  private val PyImport   = """^import\s+([\w.]+)"""
  private val PyFrom     = """^from\s+([.\w]+)\s+import"""
  private val PyDef      = """^def\s+(\w+)"""
  private val PyClass    = """^class\s+(\w+)"""
  private val PyInherit  = """^class\s+(\w+)\(([\w.]+)\)"""
  private val JsEs6      = """import\s+(?:\w+|\{[^}]*\}|\*\s+as\s+\w+)?\s*(?:from\s+)?['"]([^'"]+)['"]"""
  private val JsRequire  = """(?:const|var|let)\s+\w+\s*=\s*require\s*\(\s*['"]([^'"]+)['"]\s*\)"""
  private val JsFunc     = """function\s+(\w+)"""
  private val JsClass    = """class\s+(\w+)"""
  private val JsExtends  = """class\s+(\w+)\s+extends\s+([\w.$]+)"""
  private val JavaStatic = """^\s*import\s+static\s+([\w.]+)\s*;"""
  private val JavaImport = """^\s*import\s+([\w.]+(?:\.\*)?)\s*;"""
  private val JavaClass  = """class\s+(\w+)"""
  private val JavaExtends= """class\s+(\w+)\s+extends\s+([\w.]+)"""
  private val GoImport   = """^import\s+"([^"]+)""""
  private val GoFunc     = """^func\s+(\w+)"""
  private val GoBlock    = """import\s*\(([^)]*)\)"""
  private val Quoted     = """"([^"]+)""""
  private val PhpUse     = """use\s+(?:function\s+|const\s+)?([a-zA-Z_][\w\\]*)(?:\s+as\s+\w+)?\s*;"""
  private val PhpRequire = """(?:require|require_once|include|include_once)\s*\(?['"]([^'"]+)['"]\)?"""
  private val PhpFunc    = """function\s+(\w+)\s*\("""
  private val PhpClass   = """class\s+(\w+)"""
  private val PhpExtends = """class\s+(\w+)\s+extends\s+(\w+)"""

  /** Extract dependency edges from a `(path, language, content)` corpus.
    * IMPORTS: file → module; DEFINES: file → symbol; INHERITS: class →
    * base class (reference emits from_entity=class for INHERITS). */
  def edges(files: DataFrame): DataFrame =
    lineEdges(files).unionAll(goBlockEdges(files))

  private def lineEdges(files: DataFrame): DataFrame = {
    val lines = files.select(col("path"), col("language"),
      explode(split(col("content"), "\n")).as("line"))
    def g(p: String, i: Int) = regexp_extract(col("line"), p, i)
    // file-anchored rule: src = path, dst = captured group 1
    def fileRule(lang: String, p: String, rel: String, detail: String) =
      when(col("language") === lang,
        struct(col("path").as("src"), g(p, 1).as("dst"),
          lit(rel).as("rel"), lit(detail).as("detail")))
    // symbol-anchored rule: src = group 1 (class), dst = group 2 (base)
    def symRule(lang: String, p: String, rel: String, detail: String) =
      when(col("language") === lang,
        struct(g(p, 1).as("src"), g(p, 2).as("dst"),
          lit(rel).as("rel"), lit(detail).as("detail")))
    val cands = array(
      fileRule("python", PyImport, "IMPORTS", "import"),
      fileRule("python", PyFrom, "IMPORTS", "from_import"),
      fileRule("python", PyDef, "DEFINES", "function"),
      fileRule("python", PyClass, "DEFINES", "class"),
      symRule("python", PyInherit, "INHERITS", "class"),
      fileRule("javascript", JsEs6, "IMPORTS", "es6_import"),
      fileRule("javascript", JsRequire, "IMPORTS", "commonjs_require"),
      fileRule("javascript", JsFunc, "DEFINES", "function"),
      fileRule("javascript", JsClass, "DEFINES", "class"),
      symRule("javascript", JsExtends, "INHERITS", "class"),
      fileRule("java", JavaStatic, "IMPORTS", "static_import"),
      fileRule("java", JavaImport, "IMPORTS", "import"),
      fileRule("java", JavaClass, "DEFINES", "class"),
      symRule("java", JavaExtends, "INHERITS", "class"),
      fileRule("go", GoImport, "IMPORTS", "import"),
      fileRule("go", GoFunc, "DEFINES", "function"),
      fileRule("php", PhpUse, "IMPORTS", "use"),
      fileRule("php", PhpRequire, "IMPORTS", "require"),
      fileRule("php", PhpFunc, "DEFINES", "function"),
      fileRule("php", PhpClass, "DEFINES", "class"),
      symRule("php", PhpExtends, "INHERITS", "class"))
    lines.select(explode(cands).as("e"))
      .filter(col("e").isNotNull && col("e.src") =!= "" && col("e.dst") =!= "")
      .select(col("e.src").as("src"), col("e.dst").as("dst"),
        col("e.rel").as("rel"), col("e.detail").as("detail"))
  }

  /** Python function-call relations (transformers.py:300
    * `_extract_function_relations`: every plain-name Call inside a
    * FunctionDef → (function, callee, CALLS)). The AST walk is
    * approximated line-based: a `def` line (any indent — methods count,
    * as in ast.walk) opens a scope carried forward by a window; any
    * top-level statement closes it; `name(` occurrences on in-scope
    * lines are callees, minus the python keywords a regex would
    * false-match (`if (x)` is not a Call node). Dedents to class-level
    * assignments are the one known misattribution — documented, rare. */
  def callEdges(files: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val lines = files.filter(col("language") === "python")
      .select(col("path"), posexplode(split(col("content"), "\n")))
      .withColumnRenamed("col", "line")
    val w = Window.partitionBy("path").orderBy("pos")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val scoped = lines
      .withColumn("marker",
        when(col("line").rlike("""^\s*def\s+\w+"""),
          regexp_extract(col("line"), """^\s*def\s+(\w+)""", 1))
          .when(col("line").rlike("""^\S"""), lit("")))
      .withColumn("scope", last(col("marker"), ignoreNulls = true).over(w))
    scoped
      .filter(col("scope").isNotNull && col("scope") =!= "" && col("marker").isNull)
      .select(col("scope").as("src"),
        explode(regexp_extract_all(col("line"), lit("""(\w+)\s*\("""), lit(1))).as("dst"))
      .filter(!col("dst").isin(PyKeywords: _*))
      .select(col("src"), col("dst"), lit("CALLS").as("rel"), lit("call").as("detail"))
  }

  private val PyKeywords = Seq("if", "elif", "while", "for", "return", "yield",
    "with", "assert", "except", "raise", "lambda", "def", "class", "not",
    "and", "or", "in", "is")

  def callEdgesSql: String = {
    val kws = PyKeywords.map(k => s"'$k'").mkString(", ")
    raw"""WITH $filesCte,
       |plines AS (
       |  SELECT path,
       |    unnest(generate_series(1, len(string_split(content, chr(10))))) AS pos,
       |    unnest(string_split(content, chr(10))) AS line
       |  FROM files WHERE language = 'python'),
       |marked AS (
       |  SELECT path, pos, line,
       |    CASE WHEN regexp_matches(line, '^\s*def\s+\w+')
       |           THEN regexp_extract(line, '^\s*def\s+(\w+)', 1)
       |         WHEN regexp_matches(line, '^\S') THEN '' END AS marker
       |  FROM plines),
       |scoped AS (
       |  SELECT *, last_value(marker IGNORE NULLS) OVER
       |    (PARTITION BY path ORDER BY pos ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS scope
       |  FROM marked),
       |calls AS (
       |  SELECT scope AS src, unnest(regexp_extract_all(line, '(\w+)\s*\(', 1)) AS dst
       |  FROM scoped WHERE scope IS NOT NULL AND scope <> '' AND marker IS NULL)
       |SELECT src, dst, 'CALLS' AS rel, 'call' AS detail FROM calls
       |WHERE dst NOT IN ($kws)""".stripMargin
  }

  /** Go parenthesized import blocks span lines (transformers.py:855), so
    * they are extracted from the whole content: block body → quoted paths. */
  private def goBlockEdges(files: DataFrame): DataFrame =
    files.filter(col("language") === "go")
      .select(col("path"),
        explode(regexp_extract_all(col("content"), lit(GoBlock), lit(1))).as("block"))
      .select(col("path").as("src"),
        explode(regexp_extract_all(col("block"), lit(Quoted), lit(1))).as("dst"))
      .select(col("src"), col("dst"),
        lit("IMPORTS").as("rel"), lit("block_import").as("detail"))

  /** Per-module import degree over the code graph — the downstream
    * consumer (which modules does the codebase lean on): global top-N via
    * TakeOrderedAndProject, never a full sort. */
  def moduleDegree(edgeDf: DataFrame, topN: Int = 20): DataFrame =
    edgeDf.filter(col("rel") === "IMPORTS")
      .groupBy(col("dst").as("module"))
      .agg(count(lit(1)).as("n_imports"), countDistinct(col("src")).as("n_files"))
      .orderBy(desc("n_imports"), col("module"))
      .limit(topN)

  /** Deterministic code corpus derived from `documents` (the test tables
    * carry no real code): four languages keyed by doc_id % 4, module /
    * symbol names taken from the document's leading words. The DuckDB
    * oracle rebuilds the identical corpus, so the extraction rules are
    * hash-verified end to end. */
  def syntheticCodeView(documents: DataFrame): DataFrame = {
    val ws = split(col("text"), " ")
    def wd(i: Int) = element_at(ws, i)
    def cap(c: Column) = concat(upper(substring(c, 1, 1)), substring(c, 2, 1000))
    val id = col("doc_id").cast("string")
    val m = pmod(col("doc_id"), lit(5))
    val nl = lit("\n")
    val py = concat(
      lit("import "), wd(1), lit("."), wd(2), nl,
      lit("from "), wd(3), lit(" import "), wd(4), nl,
      lit("def fn_"), id, lit("():"), nl,
      lit("    h_"), wd(3), lit("(load(x))"), nl,
      lit("    return "), wd(4), lit("(x)"), nl,
      lit("class C"), id, lit("("), cap(wd(1)), lit("):"), nl, lit("    pass"))
    val js = concat(
      lit("import { "), wd(1), lit(" } from './"), wd(2), lit("'"), nl,
      lit("const "), wd(3), lit(" = require('"), wd(4), lit("')"), nl,
      lit("function f"), id, lit("() {}"), nl,
      lit("class K"), id, lit(" extends "), cap(wd(1)), lit(" {}"))
    val jv = concat(
      lit("package "), wd(1), lit(";"), nl,
      lit("import "), wd(2), lit("."), wd(3), lit(".*;"), nl,
      lit("import static "), wd(4), lit(".Util;"), nl,
      lit("public class C"), id, lit(" extends "), cap(wd(1)), lit(" {}"))
    val go = concat(
      lit("package "), wd(1), nl, nl,
      lit("import \"fmt\""), nl, nl,
      lit("import ("), nl,
      lit("    \""), wd(2), lit("\""), nl,
      lit("    \""), wd(3), lit("/"), wd(4), lit("\""), nl,
      lit(")"), nl, nl,
      lit("func Fn"), id, lit("() {}"))
    val php = concat(
      lit("<?php"), nl,
      lit("use "), wd(2), lit("\\"), wd(3), lit(";"), nl,
      lit("require_once '"), wd(4), lit(".php';"), nl,
      lit("function fn"), id, lit("() {}"), nl,
      lit("class C"), id, lit(" extends "), cap(wd(1)), lit(" {}"))
    documents.select(
      concat(col("source"), lit("/f"), id,
        when(m === 0, ".py").when(m === 1, ".js")
          .when(m === 2, ".java").when(m === 3, ".go").otherwise(".php")).as("path"),
      when(m === 0, "python").when(m === 1, "javascript")
        .when(m === 2, "java").when(m === 3, "go").otherwise("php").as("language"),
      when(m === 0, py).when(m === 1, js).when(m === 2, jv).when(m === 3, go)
        .otherwise(php).as("content"))
  }

  /** Shared CTE: the synthetic corpus + exploded lines, in DuckDB SQL —
    * kept in lock-step with syntheticCodeView(). */
  private val filesCte: String =
    """wsplit AS (
      |  SELECT doc_id, source, doc_id % 5 AS m, string_split(text, ' ') AS ws
      |  FROM documents),
      |files AS (
      |  SELECT
      |    source || '/f' || doc_id ||
      |      (CASE m WHEN 0 THEN '.py' WHEN 1 THEN '.js' WHEN 2 THEN '.java' WHEN 3 THEN '.go' ELSE '.php' END) AS path,
      |    CASE m WHEN 0 THEN 'python' WHEN 1 THEN 'javascript' WHEN 2 THEN 'java' WHEN 3 THEN 'go' ELSE 'php' END AS language,
      |    CASE m
      |      WHEN 0 THEN 'import ' || ws[1] || '.' || ws[2] || chr(10) ||
      |        'from ' || ws[3] || ' import ' || ws[4] || chr(10) ||
      |        'def fn_' || doc_id || '():' || chr(10) ||
      |        '    h_' || ws[3] || '(load(x))' || chr(10) ||
      |        '    return ' || ws[4] || '(x)' || chr(10) ||
      |        'class C' || doc_id || '(' || upper(substr(ws[1],1,1)) || substr(ws[1],2,1000) || '):' || chr(10) || '    pass'
      |      WHEN 1 THEN 'import { ' || ws[1] || ' } from ''./' || ws[2] || '''' || chr(10) ||
      |        'const ' || ws[3] || ' = require(''' || ws[4] || ''')' || chr(10) ||
      |        'function f' || doc_id || '() {}' || chr(10) ||
      |        'class K' || doc_id || ' extends ' || upper(substr(ws[1],1,1)) || substr(ws[1],2,1000) || ' {}'
      |      WHEN 2 THEN 'package ' || ws[1] || ';' || chr(10) ||
      |        'import ' || ws[2] || '.' || ws[3] || '.*;' || chr(10) ||
      |        'import static ' || ws[4] || '.Util;' || chr(10) ||
      |        'public class C' || doc_id || ' extends ' || upper(substr(ws[1],1,1)) || substr(ws[1],2,1000) || ' {}'
      |      WHEN 3 THEN 'package ' || ws[1] || chr(10) || chr(10) ||
      |        'import "fmt"' || chr(10) || chr(10) ||
      |        'import (' || chr(10) ||
      |        '    "' || ws[2] || '"' || chr(10) ||
      |        '    "' || ws[3] || '/' || ws[4] || '"' || chr(10) ||
      |        ')' || chr(10) || chr(10) ||
      |        'func Fn' || doc_id || '() {}'
      |      ELSE '<?php' || chr(10) ||
      |        'use ' || ws[2] || '\' || ws[3] || ';' || chr(10) ||
      |        'require_once ''' || ws[4] || '.php'';' || chr(10) ||
      |        'function fn' || doc_id || '() {}' || chr(10) ||
      |        'class C' || doc_id || ' extends ' || upper(substr(ws[1],1,1)) || substr(ws[1],2,1000) || ' {}'
      |    END AS content
      |  FROM wsplit),
      |lines AS (
      |  SELECT path, language, unnest(string_split(content, chr(10))) AS line FROM files)""".stripMargin

  private def rule(lang: String, p: String, rel: String, detail: String): String = {
    val pq = p.replace("'", "''")
    s"""SELECT path AS src, regexp_extract(line, '$pq', 1) AS dst,
       |'$rel' AS rel, '$detail' AS detail FROM lines WHERE language = '$lang'""".stripMargin
  }

  private def symRuleSql(lang: String, p: String, rel: String, detail: String): String = {
    val pq = p.replace("'", "''")
    s"""SELECT regexp_extract(line, '$pq', 1) AS src, regexp_extract(line, '$pq', 2) AS dst,
       |'$rel' AS rel, '$detail' AS detail FROM lines WHERE language = '$lang'""".stripMargin
  }

  private val edgesCte: String = {
    val rules = Seq(
      rule("python", PyImport, "IMPORTS", "import"),
      rule("python", PyFrom, "IMPORTS", "from_import"),
      rule("python", PyDef, "DEFINES", "function"),
      rule("python", PyClass, "DEFINES", "class"),
      symRuleSql("python", PyInherit, "INHERITS", "class"),
      rule("javascript", JsEs6, "IMPORTS", "es6_import"),
      rule("javascript", JsRequire, "IMPORTS", "commonjs_require"),
      rule("javascript", JsFunc, "DEFINES", "function"),
      rule("javascript", JsClass, "DEFINES", "class"),
      symRuleSql("javascript", JsExtends, "INHERITS", "class"),
      rule("java", JavaStatic, "IMPORTS", "static_import"),
      rule("java", JavaImport, "IMPORTS", "import"),
      rule("java", JavaClass, "DEFINES", "class"),
      symRuleSql("java", JavaExtends, "INHERITS", "class"),
      rule("go", GoImport, "IMPORTS", "import"),
      rule("go", GoFunc, "DEFINES", "function"),
      rule("php", PhpUse, "IMPORTS", "use"),
      rule("php", PhpRequire, "IMPORTS", "require"),
      rule("php", PhpFunc, "DEFINES", "function"),
      rule("php", PhpClass, "DEFINES", "class"),
      symRuleSql("php", PhpExtends, "INHERITS", "class"))
    val goBlock =
      s"""SELECT path AS src, unnest(regexp_extract_all(q, '${Quoted.replace("'", "''")}', 1)) AS dst,
         |'IMPORTS' AS rel, 'block_import' AS detail FROM (
         |  SELECT path, unnest(regexp_extract_all(content, '${GoBlock.replace("'", "''")}', 1)) AS q
         |  FROM files WHERE language = 'go')""".stripMargin
    s"""cand AS (
       |${(rules :+ goBlock).mkString("\nUNION ALL\n")}),
       |e AS (SELECT * FROM cand WHERE src <> '' AND dst <> '')""".stripMargin
  }

  val edgesSql: String =
    s"""WITH $filesCte,
       |$edgesCte
       |SELECT src, dst, rel, detail FROM e""".stripMargin

  def moduleDegreeSql(topN: Int = 20): String =
    s"""WITH $filesCte,
       |$edgesCte
       |SELECT dst AS module, COUNT(*) AS n_imports, COUNT(DISTINCT src) AS n_files
       |FROM e WHERE rel = 'IMPORTS'
       |GROUP BY dst ORDER BY n_imports DESC, module LIMIT $topN""".stripMargin

  private val ImportLinePat = """(^import |^from |require|^use |import static)"""
  private val DefLinePat = """(^def |function |^func |class )"""

  /** Per-file source metrics (the cloc/lizard basics the reference's file
    * nodes carry as properties): line counts, blank/import/definition
    * lines, max indentation depth, average line length. One explode +
    * one path-keyed groupBy with full map-side partial aggregation —
    * linear at any repo size. */
  def codeStats(files: DataFrame): DataFrame = {
    val lines = files.select(col("path"), col("language"),
      explode(split(col("content"), "\n")).as("line"))
    lines.groupBy(col("path"), col("language"))
      .agg(
        count(lit(1)).as("n_lines"),
        sum(when(trim(col("line")) === "", 1L).otherwise(0L)).as("n_blank"),
        sum(when(col("line").rlike(ImportLinePat), 1L).otherwise(0L)).as("n_import_lines"),
        sum(when(col("line").rlike(DefLinePat), 1L).otherwise(0L)).as("n_def_lines"),
        max((length(col("line")) - length(ltrim(col("line")))).cast("long")).as("max_indent"),
        sum(length(col("line")).cast("long")).as("n_chars_total"))
      .withColumn("avg_line_len",
        col("n_chars_total").cast("double") / col("n_lines").cast("double"))
  }

  val codeStatsSql: String =
    s"""WITH $filesCte,
       |ln AS (
       |  SELECT path, language, unnest(string_split(content, chr(10))) AS line
       |  FROM files)
       |SELECT path, language, COUNT(*) AS n_lines,
       |  CAST(SUM(CASE WHEN trim(line) = '' THEN 1 ELSE 0 END) AS BIGINT) AS n_blank,
       |  CAST(SUM(CASE WHEN regexp_matches(line, '$ImportLinePat') THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_import_lines,
       |  CAST(SUM(CASE WHEN regexp_matches(line, '$DefLinePat') THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_def_lines,
       |  CAST(MAX(length(line) - length(ltrim(line))) AS BIGINT) AS max_indent,
       |  CAST(SUM(length(line)) AS BIGINT) AS n_chars_total,
       |  CAST(SUM(length(line)) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avg_line_len
       |FROM ln GROUP BY path, language""".stripMargin

  /** Impact analysis on the CODE graph (the reference's actual domain —
    * graph_service.py:546 over imports instead of purchases): from the
    * most-imported module, depth 1 = every file importing it (score 1.0),
    * depth 2 = the modules those files ALSO import — the coupling set a
    * change to the target exposes (score 0.7). Target selection is a
    * 1-row bounded argmax (broadcast); both hops are semi-join + distinct,
    * linear in |edges| at any repo scale. */
  def codeImpact(files: DataFrame): DataFrame = {
    val imp = edges(files).filter(col("rel") === "IMPORTS")
      .select(col("src"), col("dst"))
    val target = imp.groupBy(col("dst")).agg(count(lit(1)).as("n"))
      .orderBy(desc("n"), col("dst")).limit(1)
      .select(col("dst").as("target"))
    val d1 = imp.join(broadcast(target), col("dst") === col("target"))
      .select(col("src")).distinct()
    val d2 = imp.join(d1.select(col("src").as("f")), col("src") === col("f"))
      .join(broadcast(target), col("dst") =!= col("target"))
      .select(col("dst")).distinct()
    d1.select(lit("file").as("node_type"), col("src").as("name"),
        lit(1L).as("depth"), lit(1.0).as("score"))
      .unionAll(d2.select(lit("module").as("node_type"), col("dst").as("name"),
        lit(2L).as("depth"), lit(0.7).as("score")))
  }

  val codeImpactSql: String =
    s"""WITH $filesCte,
       |$edgesCte,
       |imp AS (SELECT src, dst FROM e WHERE rel = 'IMPORTS'),
       |tgt AS (
       |  SELECT dst AS target FROM (SELECT dst, COUNT(*) AS n FROM imp GROUP BY dst)
       |  ORDER BY n DESC, dst LIMIT 1),
       |d1 AS (SELECT DISTINCT src FROM imp JOIN tgt ON imp.dst = tgt.target),
       |d2 AS (
       |  SELECT DISTINCT imp.dst FROM imp
       |  JOIN d1 ON imp.src = d1.src
       |  JOIN tgt ON imp.dst <> tgt.target)
       |SELECT 'file' AS node_type, src AS name, CAST(1 AS BIGINT) AS depth,
       |       CAST(1.0 AS DOUBLE) AS score FROM d1
       |UNION ALL
       |SELECT 'module', dst, CAST(2 AS BIGINT), CAST(0.7 AS DOUBLE) FROM d2""".stripMargin
}
