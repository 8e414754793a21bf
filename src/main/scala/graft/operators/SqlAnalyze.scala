package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** SQL QUERY analysis — the extraction surface of the reference's
  * services/sql/sql_parser.py `SQLAnalysisService.parse_sql` (sqlglot-
  * based: statement type, referenced tables, join count, called
  * functions, WHERE predicates). The reference's remaining members
  * (_optimize_sql, convert_between_dialects, _generate_explanation) are
  * sqlglot library passthroughs / string formatting around the same
  * parse, not additional computation — the extraction is the surface.
  *
  * Spark-first shape: the whole analysis is regexp_extract_all +
  * aggregation over a corpus of query strings — one narrow codegen'd
  * pass, zero shuffle, linear scale-out (the reference parses one
  * statement per call on one core). Regexes avoid lookbehind so the
  * DuckDB (RE2) oracle replays them verbatim; list outputs are
  * sorted-distinct comma joins, so the hash gate is order-stable.
  */
object SqlAnalyze {

  /** Deterministic synthetic query corpus from doc_id (the
    * SchemaParse.syntheticDdlView recipe): six statement templates —
    * filter select, join+aggregate, insert, three-way join, single-CTE
    * join (the CTE body is paren-free by construction — the WITH-type
    * rule's documented scope), IN-subquery — cycling by doc_id,
    * identifiers and literals derived by modulus. Stated identically in
    * [[syntheticQuerySql]] for the oracle. */
  def syntheticQueryView(documents: DataFrame): DataFrame = {
    val a = (col("doc_id") % 7).cast("string")
    val b = ((col("doc_id") + 3) % 7).cast("string")
    val c = ((col("doc_id") + 5) % 7).cast("string")
    val n = (col("doc_id") % 100).cast("string")
    val q = when(col("doc_id") % 6 === 0,
        concat(lit("SELECT id, name FROM t_"), a, lit(" WHERE id > "), n))
      .when(col("doc_id") % 6 === 1,
        concat(lit("SELECT a.id, sum(b.v) FROM t_"), a, lit(" a JOIN t_"), b,
          lit(" b ON a.id = b.id WHERE b.v > "), n,
          lit(" AND a.id < 500 GROUP BY a.id")))
      .when(col("doc_id") % 6 === 2,
        concat(lit("INSERT INTO t_"), a, lit(" (id, v) VALUES ("), n, lit(", 1)")))
      .when(col("doc_id") % 6 === 3,
        concat(lit("SELECT count(*), max(v) FROM t_"), a, lit(" JOIN t_"), b,
          lit(" ON t_"), a, lit(".id = t_"), b, lit(".id JOIN t_"), c,
          lit(" ON t_"), b, lit(".id = t_"), c, lit(".id")))
      .when(col("doc_id") % 6 === 4,
        concat(lit("WITH c_"), a, lit(" AS (SELECT id FROM t_"), a,
          lit(" WHERE v > "), n, lit(") SELECT id, min(v) FROM c_"), a,
          lit(" JOIN t_"), b, lit(" ON c_"), a, lit(".id = t_"), b,
          lit(".id GROUP BY id")))
      .otherwise(
        concat(lit("SELECT id, name FROM t_"), a,
          lit(" WHERE id IN (SELECT id FROM t_"), b, lit(" WHERE v < "), n,
          lit(")")))
    documents.select(col("doc_id").as("query_id"), q.as("sql"))
  }

  // continuation lines must never BEGIN with '||': this string is embedded
  // in analyzeSql, whose own stripMargin would eat one pipe of a
  // line-leading '||' (margin-char collision)
  val syntheticQuerySql: String =
    """SELECT doc_id AS query_id,
      |  CASE
      |    WHEN doc_id % 6 = 0 THEN
      |      'SELECT id, name FROM t_' || (doc_id % 7) || ' WHERE id > ' || (doc_id % 100)
      |    WHEN doc_id % 6 = 1 THEN
      |      'SELECT a.id, sum(b.v) FROM t_' || (doc_id % 7) || ' a JOIN t_' || ((doc_id + 3) % 7) ||
      |      ' b ON a.id = b.id WHERE b.v > ' || (doc_id % 100) || ' AND a.id < 500 GROUP BY a.id'
      |    WHEN doc_id % 6 = 2 THEN
      |      'INSERT INTO t_' || (doc_id % 7) || ' (id, v) VALUES (' || (doc_id % 100) || ', 1)'
      |    WHEN doc_id % 6 = 3 THEN
      |      'SELECT count(*), max(v) FROM t_' || (doc_id % 7) || ' JOIN t_' || ((doc_id + 3) % 7) ||
      |      ' ON t_' || (doc_id % 7) || '.id = t_' || ((doc_id + 3) % 7) || '.id JOIN t_' ||
      |      ((doc_id + 5) % 7) || ' ON t_' || ((doc_id + 3) % 7) || '.id = t_' ||
      |      ((doc_id + 5) % 7) || '.id'
      |    WHEN doc_id % 6 = 4 THEN
      |      'WITH c_' || (doc_id % 7) || ' AS (SELECT id FROM t_' || (doc_id % 7) ||
      |      ' WHERE v > ' || (doc_id % 100) || ') SELECT id, min(v) FROM c_' || (doc_id % 7) ||
      |      ' JOIN t_' || ((doc_id + 3) % 7) || ' ON c_' || (doc_id % 7) || '.id = t_' ||
      |      ((doc_id + 3) % 7) || '.id GROUP BY id'
      |    ELSE
      |      'SELECT id, name FROM t_' || (doc_id % 7) || ' WHERE id IN (SELECT id FROM t_' ||
      |      ((doc_id + 3) % 7) || ' WHERE v < ' || (doc_id % 100) || ')'
      |  END AS sql
      |FROM documents""".stripMargin

  private val TablePat = """(?i)(?:FROM|JOIN|INTO)\s+(\w+)"""
  private val FuncPat = """(\w+)\s*\("""
  private val JoinPat = """(?i)\bJOIN\b"""
  private val CondPat = """(?i)\b(?:WHERE|AND)\b"""
  // CTE names: the identifier in `WITH name AS (` or `, name AS (` —
  // requires the AS-paren, so INSERT's `(id, v) VALUES (n, 1)` commas
  // cannot false-positive
  private val CtePat = """(?i)(?:\bWITH|,)\s*(\w+)\s+AS\s*\("""
  // statement type of a WITH query = the statement keyword after a CTE
  // close-paren (sqlglot reports the MAIN statement's class, not 'with').
  // Anchored on the statement keywords (ADVICE r10): a paren inside a CTE
  // body — `f(x)`, a subquery — closes into FROM/ON/operators, never into
  // a bare statement keyword, so the lazy scan skips it; only `) SELECT`
  // etc. terminates. Still not a full paren-balance parse (a CTE body
  // containing a literal `) SELECT` sequence would misclassify) — the
  // spec pins that as out of scope.
  private val WithTypePat = """(?is)^\s*WITH\b.*?\)\s*(SELECT|INSERT|UPDATE|DELETE)\b"""

  /** Per query: statement type (first keyword; for WITH queries the main
    * statement's keyword — the sql_type analog of
    * `parsed.__class__.__name__.lower()`, which sqlglot reports as the
    * main statement for CTE queries), sorted-distinct CTE names,
    * sorted-distinct referenced tables EXCLUDING CTE names (sqlglot's
    * table list does not contain CTEs — the r09 nit), join count,
    * sorted-distinct function names, predicate count (WHERE + ANDs — the
    * reference's flattened condition list). An identifier before '(' is
    * only a FUNCTION if it is neither a referenced table (INSERT's
    * column-list paren follows the table name), nor a CTE name, nor one
    * of the keywords VALUES/AS/IN that precede '(' in the templates —
    * RE2 has no lookbehind, so the exclusion is a set difference rather
    * than a regex context, identically on both engines. */
  def analyze(queries: DataFrame): DataFrame = {
    val rawTables = array_distinct(regexp_extract_all(col("sql"), lit(TablePat), lit(1)))
    val ctes = array_distinct(regexp_extract_all(col("sql"), lit(CtePat), lit(1)))
    val funcCand = array_distinct(
      transform(regexp_extract_all(col("sql"), lit(FuncPat), lit(1)), x => lower(x)))
    val firstKw = lower(regexp_extract(col("sql"), """^\s*(\w+)""", 1))
    val kw = array(lit("values"), lit("as"), lit("in"))
    queries.select(
      col("query_id"),
      when(firstKw === "with",
        lower(regexp_extract(col("sql"), WithTypePat, 1)))
        .otherwise(firstKw).as("sql_type"),
      array_join(array_sort(ctes), ",").as("ctes"),
      array_join(array_sort(array_except(rawTables, ctes)), ",").as("tables"),
      size(regexp_extract_all(col("sql"), lit(JoinPat), lit(0))).cast("long").as("n_joins"),
      array_join(array_sort(
        array_except(funcCand, array_union(array_union(rawTables, ctes), kw))), ",")
        .as("functions"),
      size(regexp_extract_all(col("sql"), lit(CondPat), lit(0))).cast("long").as("n_conds"))
  }

  // NOTE: the s-interpolator processes escapes even in triple quotes, so
  // '\\s' below lands as '\s' in the emitted SQL — what RE2 needs
  val analyzeSql: String =
    s"""WITH q AS ($syntheticQuerySql),
       |k AS (
       |  SELECT query_id, sql,
       |    list_distinct(regexp_extract_all(sql, '(?i)(?:FROM|JOIN|INTO)\\s+(\\w+)', 1)) AS tabs,
       |    list_distinct(regexp_extract_all(sql, '(?i)(?:\\bWITH|,)\\s*(\\w+)\\s+AS\\s*\\(', 1)) AS ctes,
       |    list_distinct(list_transform(
       |      regexp_extract_all(sql, '(\\w+)\\s*\\(', 1), x -> lower(x))) AS fcand,
       |    lower(regexp_extract(sql, '^\\s*(\\w+)', 1)) AS kw1
       |  FROM q)
       |SELECT query_id,
       |  CASE WHEN kw1 = 'with'
       |       THEN lower(regexp_extract(sql, '(?is)^\\s*WITH\\b.*?\\)\\s*(SELECT|INSERT|UPDATE|DELETE)\\b', 1))
       |       ELSE kw1 END AS sql_type,
       |  coalesce(array_to_string(list_sort(ctes), ','), '') AS ctes,
       |  coalesce(array_to_string(list_sort(list_filter(tabs,
       |    x -> NOT list_contains(ctes, x))), ','), '') AS tables,
       |  CAST(len(regexp_extract_all(sql, '(?i)\\bJOIN\\b', 0)) AS BIGINT) AS n_joins,
       |  coalesce(array_to_string(list_sort(list_filter(fcand,
       |    x -> NOT list_contains(tabs, x) AND NOT list_contains(ctes, x)
       |         AND x NOT IN ('values', 'as', 'in'))), ','), '') AS functions,
       |  CAST(len(regexp_extract_all(sql, '(?i)\\b(?:WHERE|AND)\\b', 0)) AS BIGINT) AS n_conds
       |FROM k""".stripMargin
}
