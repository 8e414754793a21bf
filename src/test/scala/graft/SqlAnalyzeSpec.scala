package graft

import graft.operators.SqlAnalyze

/** Pins the CTE-name/table distinction and the WITH-type rule the r09
  * verdict asked for: CTE names are extracted separately and never appear
  * in the table list (sqlglot's referenced-tables contract), a WITH
  * query's sql_type is the MAIN statement's keyword, and the
  * keyword-before-paren exclusions (AS/IN/VALUES) keep non-functions out
  * of the function list. Scope note: the WITH-type rule reads the keyword
  * after the FIRST close-paren, valid while CTE bodies are paren-free —
  * which the synthetic corpus guarantees by construction. */
class SqlAnalyzeSpec extends SparkSpec {
  import spark.implicits._

  private def analyzeOne(sql: String) =
    SqlAnalyze.analyze(Seq((1L, sql)).toDF("query_id", "sql")).collect().head

  test("CTE names are split from tables and WITH resolves to the main statement type") {
    val r = analyzeOne(
      "WITH c_3 AS (SELECT id FROM t_3 WHERE v > 42) " +
        "SELECT id, min(v) FROM c_3 JOIN t_6 ON c_3.id = t_6.id GROUP BY id")
    assert(r.getString(1) == "select", s"sql_type: ${r.getString(1)}") // not 'with'
    assert(r.getString(2) == "c_3", s"ctes: ${r.getString(2)}")
    assert(r.getString(3) == "t_3,t_6", s"tables: ${r.getString(3)}") // no c_3
    assert(r.getLong(4) == 1L)                                        // one JOIN
    assert(r.getString(5) == "min", s"functions: ${r.getString(5)}")  // no 'as'
    assert(r.getLong(6) == 1L)                                        // one WHERE
  }

  test("IN-subquery counts both tables and both predicates, 'in' is not a function") {
    val r = analyzeOne(
      "SELECT id, name FROM t_2 WHERE id IN (SELECT id FROM t_5 WHERE v < 7)")
    assert(r.getString(1) == "select")
    assert(r.getString(2) == "")
    assert(r.getString(3) == "t_2,t_5")
    assert(r.getLong(4) == 0L)
    assert(r.getString(5) == "", s"functions: ${r.getString(5)}")
    assert(r.getLong(6) == 2L)
  }

  test("INSERT template is unchanged by the CTE machinery") {
    val r = analyzeOne("INSERT INTO t_1 (id, v) VALUES (42, 1)")
    assert(r.getString(1) == "insert")
    assert(r.getString(2) == "")
    assert(r.getString(3) == "t_1")
    assert(r.getString(5) == "")
  }

  test("synthetic corpus covers all six templates") {
    val docs = Seq.tabulate(12)(i => (i.toLong, "x")).toDF("doc_id", "text")
    val types = SqlAnalyze.analyze(SqlAnalyze.syntheticQueryView(docs))
      .collect().map(r => (r.getLong(0) % 6, r.getString(1), r.getString(2)))
    assert(types.count(_._2 == "insert") == 2)
    assert(types.count(_._2 == "select") == 10) // incl. the WITH queries
    assert(types.filter(_._1 == 4L).forall(_._3.nonEmpty)) // CTE template has ctes
    assert(types.filter(_._1 != 4L).forall(_._3.isEmpty))
  }
}
