package graft

import org.scalatest.funsuite.AnyFunSuite

/** Static invariants of the driver contract — cheap insurance against the
  * failure modes that silently zero a round's correctness: an oracle entry
  * whose query key doesn't exist, or a query name the harness can't use.
  */
class EntryContractSpec extends AnyFunSuite {

  test("every oracle entry has a registered query") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracleSql keys without a query: $orphans")
  }

  test("query names are harness-safe (snake_case, unique, nonempty)") {
    val names = SparkEntry.queries.keys.toSeq
    assert(names.nonEmpty)
    val bad = names.filterNot(_.matches("[a-z][a-z0-9_]*"))
    assert(bad.isEmpty, s"non-snake_case query names: $bad")
  }

  test("oracle SQL never references tables outside the test schema") {
    val tables = Set("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings")
    // crude but effective: every FROM/JOIN bare identifier must be a known
    // table or a CTE defined in the same statement
    val fromRef = """(?i)(?:from|join)\s+([a-z_][a-z0-9_]*)""".r
    val cteDef =
      """(?i)([a-z_][a-z0-9_]*)\s*(?:\([a-z0-9_,\s]*\))?\s+as\s+(?:materialized\s*)?\(""".r
    SparkEntry.oracleSql.foreach { case (name, sql0) =>
      // blank out single-quoted string literals first: a builder that
      // CONSTRUCTS SQL text (sql_analyze's synthetic corpus) legitimately
      // contains 'FROM t_...' inside literals, which are data, not refs
      val sql = sql0.replaceAll("'[^']*'", "''")
      val ctes = cteDef.findAllMatchIn(sql).map(_.group(1).toLowerCase).toSet
      val refs = fromRef.findAllMatchIn(sql).map(_.group(1).toLowerCase).toSet
      val unknown = refs -- tables -- ctes
      assert(unknown.isEmpty, s"$name references unknown tables: $unknown")
    }
  }
}
