package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** SQL DDL schema extraction — the parse half of the reference's
  * services/sql/universal_sql_schema_parser.py (the domain-rule half is
  * SchemaClassify): strip comments, split statements, match CREATE TABLE
  * (`:275` table_name_pattern), extract the column section (`:283`
  * column_section_pattern, greedy to the LAST paren), split column
  * definitions, and parse name / type / nullability / default / PK per
  * column (`:341` `_parse_single_column`), then classify each table into
  * the generic business domains (`:174` `_create_generic_domains`).
  *
  * Everything is narrow codegen'd string work over the DDL rows — zero
  * shuffle, linearly scalable. One deliberate simplification vs the
  * reference's character-walking column splitter: precision commas
  * (`DECIMAL(10,2)`) are normalized to `|` before the comma split and
  * restored after — equivalent on one paren level, which is all the
  * reference handles too.
  */
object SchemaParse {

  private val TablePat  = """(?i)create\s+table\s+(?:(\w+)\.)?(\w+)"""
  private val SectionPat = """(?s)\((.*)\)"""
  private val TypePat   = """^\w+\s+([\w]+(?:\([\w|]+\))?)"""
  private val DefaultPat = """(?i)default\s+([^,\s]+)"""
  private val SkipPat   = """^(CONSTRAINT|PRIMARY|FOREIGN|UNIQUE|CHECK)\b"""

  /** Parse a `(ddl_id, ddl)` corpus into one row per column:
    * (ddl_id, schema_name, table_name, ordinal, column_name, data_type,
    *  nullable, is_pk, default_value, domain). */
  def parse(ddls: DataFrame): DataFrame = {
    val cleaned = ddls.select(col("ddl_id"),
      regexp_replace(
        regexp_replace(
          regexp_replace(col("ddl"), "--[^\n]*", ""),
          """(?s)/\*.*?\*/""", ""),
        """\((\s*\d+)\s*,\s*(\d+\s*)\)""", "($1|$2)").as("clean"))
    val stmts = cleaned
      .select(col("ddl_id"), explode(split(col("clean"), ";")).as("stmt"))
      .filter(col("stmt").rlike("""(?is)^\s*create\s+table"""))
    val tabs = stmts.select(
      col("ddl_id"),
      regexp_extract(col("stmt"), TablePat, 1).as("schema_name"),
      regexp_extract(col("stmt"), TablePat, 2).as("table_name"),
      regexp_extract(col("stmt"), SectionPat, 1).as("colsec"))
      .filter(col("table_name") =!= "")
    val lines = tabs.select(
      col("ddl_id"), col("schema_name"), col("table_name"),
      posexplode(split(col("colsec"), ",")))
      // collapse internal newlines/tabs first: trim() strips only spaces,
      // and every column line in a formatted DDL starts with a newline
      .withColumn("line", trim(regexp_replace(col("col"), """\s+""", " ")))
      .filter(col("line") =!= "" && !upper(col("line")).rlike(SkipPat))
    val up = upper(col("line"))
    val tUp = upper(col("table_name"))
    lines.select(
      col("ddl_id"), col("schema_name"), col("table_name"),
      (col("pos") + 1).cast("long").as("ordinal"),
      regexp_extract(col("line"), """^(\w+)""", 1).as("column_name"),
      regexp_replace(regexp_extract(col("line"), TypePat, 1), """\|""", ",").as("data_type"),
      not(up.contains("NOT NULL")).as("nullable"),
      up.contains("PRIMARY KEY").as("is_pk"),
      trim(regexp_extract(col("line"), DefaultPat, 1), "'\"").as("default_value"),
      when(tUp.rlike("USER|CUSTOMER|CLIENT|PERSON|CONTACT"), "user_management")
        .when(tUp.rlike("CONFIG|SETTING|TYPE|STATUS|PARAM"), "system_configuration")
        .when(tUp.rlike("LOG|AUDIT|HISTORY|TRACE"), "audit_logging")
        .when(tUp.rlike("REPORT|STAT|ANALYTICS|SUMMARY"), "reporting")
        .otherwise("data_management").as("domain"))
      .filter(col("column_name") =!= "" && col("data_type") =!= "")
  }

  /** Deterministic DDL corpus derived from `documents` (two CREATE TABLEs
    * per doc, exercising schema qualification, precision types, NOT NULL,
    * defaults, inline + table-level PKs, and both comment styles); the
    * DuckDB oracle rebuilds it identically. */
  def syntheticDdlView(documents: DataFrame): DataFrame = {
    val ws = split(col("text"), " ")
    def wd(i: Int) = element_at(ws, i)
    val id = col("doc_id").cast("string")
    val nl = lit("\n")
    documents.select(col("doc_id").as("ddl_id"), concat(
      lit("-- schema derived from "), col("source"), nl,
      lit("CREATE TABLE app."), wd(1), lit("_t"), id, lit(" ("), nl,
      lit("  id NUMBER(10) PRIMARY KEY,"), nl,
      lit("  "), wd(2), lit("_name VARCHAR2(100) NOT NULL,"), nl,
      lit("  "), wd(3), lit("_amt DECIMAL(10,2) DEFAULT 0,"), nl,
      lit("  "), wd(4), lit("_at DATE,"), nl,
      lit("  CONSTRAINT pk_t"), id, lit(" PRIMARY KEY (id)"), nl,
      lit(");"), nl,
      lit("CREATE TABLE "), wd(2), lit("_log_t"), id, lit(" ("), nl,
      lit("  ts TIMESTAMP /* event time */,"), nl,
      lit("  msg TEXT DEFAULT 'na' NOT NULL"), nl,
      lit(")")).as("ddl"))
  }

  /** DuckDB oracle: identical corpus construction + parse. */
  val parseSql: String = {
    def esc(p: String) = p.replace("'", "''")
    raw"""WITH w AS (
       |  SELECT doc_id AS ddl_id, source, string_split(text, ' ') AS ws FROM documents),
       |raw AS (
       |  SELECT ddl_id,
       |    '-- schema derived from ' || source || chr(10) ||
       |    'CREATE TABLE app.' || ws[1] || '_t' || ddl_id || ' (' || chr(10) ||
       |    '  id NUMBER(10) PRIMARY KEY,' || chr(10) ||
       |    '  ' || ws[2] || '_name VARCHAR2(100) NOT NULL,' || chr(10) ||
       |    '  ' || ws[3] || '_amt DECIMAL(10,2) DEFAULT 0,' || chr(10) ||
       |    '  ' || ws[4] || '_at DATE,' || chr(10) ||
       |    '  CONSTRAINT pk_t' || ddl_id || ' PRIMARY KEY (id)' || chr(10) ||
       |    ');' || chr(10) ||
       |    'CREATE TABLE ' || ws[2] || '_log_t' || ddl_id || ' (' || chr(10) ||
       |    '  ts TIMESTAMP /* event time */,' || chr(10) ||
       |    '  msg TEXT DEFAULT ''na'' NOT NULL' || chr(10) ||
       |    ')' AS ddl
       |  FROM w),
       |cleaned AS (
       |  SELECT ddl_id, regexp_replace(regexp_replace(regexp_replace(ddl,
       |    '--[^\n]*', '', 'g'), '(?s)/\*.*?\*/', '', 'g'),
       |    '\((\s*\d+)\s*,\s*(\d+\s*)\)', '(\1|\2)', 'g') AS clean
       |  FROM raw),
       |stmts AS (
       |  SELECT ddl_id, unnest(string_split(clean, ';')) AS stmt FROM cleaned),
       |ctabs AS (
       |  SELECT ddl_id,
       |    regexp_extract(stmt, '${esc(TablePat)}', 1) AS schema_name,
       |    regexp_extract(stmt, '${esc(TablePat)}', 2) AS table_name,
       |    regexp_extract(stmt, '${esc(SectionPat)}', 1) AS colsec
       |  FROM stmts WHERE regexp_matches(stmt, '(?is)^\s*create\s+table')),
       |lines AS (
       |  SELECT ddl_id, schema_name, table_name,
       |    unnest(generate_series(1, len(string_split(colsec, ',')))) AS ordinal,
       |    trim(regexp_replace(unnest(string_split(colsec, ',')), '\s+', ' ', 'g')) AS line
       |  FROM ctabs WHERE table_name <> '')
       |SELECT ddl_id, schema_name, table_name, CAST(ordinal AS BIGINT) AS ordinal,
       |  regexp_extract(line, '^(\w+)', 1) AS column_name,
       |  replace(regexp_extract(line, '${esc(TypePat)}', 1), '|', ',') AS data_type,
       |  NOT contains(upper(line), 'NOT NULL') AS nullable,
       |  contains(upper(line), 'PRIMARY KEY') AS is_pk,
       |  trim(regexp_extract(line, '${esc(DefaultPat)}', 1), '''"') AS default_value,
       |  CASE WHEN regexp_matches(upper(table_name), 'USER|CUSTOMER|CLIENT|PERSON|CONTACT') THEN 'user_management'
       |       WHEN regexp_matches(upper(table_name), 'CONFIG|SETTING|TYPE|STATUS|PARAM') THEN 'system_configuration'
       |       WHEN regexp_matches(upper(table_name), 'LOG|AUDIT|HISTORY|TRACE') THEN 'audit_logging'
       |       WHEN regexp_matches(upper(table_name), 'REPORT|STAT|ANALYTICS|SUMMARY') THEN 'reporting'
       |       ELSE 'data_management' END AS domain
       |FROM lines
       |WHERE line <> '' AND NOT regexp_matches(upper(line), '${esc(SkipPat)}')
       |  AND regexp_extract(line, '^(\w+)', 1) <> ''
       |  AND regexp_extract(line, '${esc(TypePat)}', 1) <> ''""".stripMargin
  }
}
