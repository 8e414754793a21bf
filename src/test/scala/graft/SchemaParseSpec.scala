package graft

import graft.operators.SchemaParse

class SchemaParseSpec extends SparkSpec {
  import spark.implicits._

  private val ddl =
    """-- user schema
      |CREATE TABLE hr.user_account (
      |  id NUMBER(10) PRIMARY KEY,
      |  email VARCHAR2(255) NOT NULL,
      |  balance DECIMAL(12,2) DEFAULT 0,
      |  note TEXT DEFAULT 'none', /* free-form */
      |  CONSTRAINT uq_email UNIQUE (email)
      |);
      |CREATE TABLE audit_log (
      |  ts TIMESTAMP,
      |  detail TEXT NOT NULL
      |)""".stripMargin

  private lazy val rows = SchemaParse.parse(Seq((1L, ddl)).toDF("ddl_id", "ddl"))
    .as[(Long, String, String, Long, String, String, Boolean, Boolean, String, String)]
    .collect()
    .map(r => r._5 -> r).toMap

  test("extracts schema-qualified and bare table names with domains") {
    assert(rows("id")._2 == "hr" && rows("id")._3 == "user_account")
    assert(rows("id")._10 == "user_management")
    assert(rows("ts")._2 == "" && rows("ts")._3 == "audit_log")
    assert(rows("ts")._10 == "audit_logging")
  }

  test("precision commas survive the column split") {
    assert(rows("balance")._6 == "DECIMAL(12,2)")
    assert(rows("id")._6 == "NUMBER(10)")
  }

  test("nullability, PK, and defaults parse per column") {
    assert(!rows("email")._7 && !rows("email")._8)   // NOT NULL, not PK
    assert(rows("id")._7 && rows("id")._8)           // PK; no explicit NOT NULL
    assert(rows("balance")._7)                       // nullable
    assert(rows("balance")._9 == "0")
    assert(rows("note")._9 == "none")                // quotes stripped
  }

  test("constraint lines and comments are dropped") {
    assert(!rows.contains("CONSTRAINT"))
    assert(rows.size == 6)
  }
}
