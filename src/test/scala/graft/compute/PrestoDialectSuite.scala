package graft.compute

import org.scalatest.funsuite.AnyFunSuite

class PrestoDialectSuite extends AnyFunSuite {
  import PrestoDialect.translate

  test("unit-bearing date_add/date_diff become timestampadd/timestampdiff") {
    assert(translate("date_add('hour', 2, ts)") == "timestampadd(hour, 2, ts)")
    assert(translate("DATE_DIFF('day', a, b)") == "timestampdiff(day, a, b)")
  }

  test("function renames apply case-insensitively") {
    assert(translate("SELECT APPROX_DISTINCT(x), arbitrary(y)") ==
      "SELECT approx_count_distinct(x), any_value(y)")
    assert(translate("json_extract_scalar(p, '$.k')") ==
      "get_json_object(p, '$.k')")
    assert(translate("to_unixtime(ts) + strpos(s, t)") ==
      "unix_timestamp(ts) + instr(s, t)")
  }

  test("varchar types and double-quoted identifiers rewrite") {
    assert(translate("CAST(x AS varchar(255))") == "CAST(x AS string)")
    assert(translate("cast(x as VARCHAR)") == "cast(x as string)")
    assert(translate("""SELECT "col_a", "t2"."b" FROM "t2"""") ==
      "SELECT `col_a`, `t2`.`b` FROM `t2`")
  }

  test("string literals are never rewritten") {
    assert(translate("""SELECT 'a "quoted" varchar' AS s""") ==
      """SELECT 'a "quoted" varchar' AS s""")
    assert(translate("SELECT 'strpos(x)' AS s") == "SELECT 'strpos(x)' AS s")
    // '' escape keeps the literal open across the doubled quote
    assert(translate("SELECT 'it''s varchar' AS s") ==
      "SELECT 'it''s varchar' AS s")
  }

  test("date_add/date_diff text inside string literals is never rewritten") {
    // the unit rewrite must honor the same literal contract as every
    // other rule: matching function-name text inside a '…' literal is
    // data, not a call
    assert(translate("SELECT 'date_add(''day'', 1, x)' AS s") ==
      "SELECT 'date_add(''day'', 1, x)' AS s")
    assert(translate("SELECT 'use date_diff(' AS hint, date_add('hour', 2, ts)") ==
      "SELECT 'use date_diff(' AS hint, timestampadd(hour, 2, ts)")
    // nested unit-bearing calls both rewrite
    assert(translate("date_diff('day', date_add('hour', 2, x), y)") ==
      "timestampdiff(day, timestampadd(hour, 2, x), y)")
    // a unit that is not a plain word (or no comma after) is left alone
    assert(translate("date_add('not a unit', 1, x)") ==
      "date_add('not a unit', 1, x)")
  }

  test("plain ANSI (the reference's own Presto examples) passes through") {
    val sql = """SELECT * FROM offline_training_data
                 UNION ALL SELECT *, '1' as region FROM offline_data"""
    assert(translate(sql) == sql)
    assert(translate("SELECT * FROM eureka_default_presto LIMIT 10") ==
      "SELECT * FROM eureka_default_presto LIMIT 10")
  }

  test("PrestoSqlSlot wraps a translated SqlSlot") {
    assert(PrestoSqlSlot("SELECT strpos(a, b) FROM t").sql ==
      "SELECT instr(a, b) FROM t")
  }

  test("non-identifier-shaped quoted identifiers still become backticks") {
    // Presto NEVER treats "…" as a string — every double-quoted token is
    // an identifier, whatever its content; left as-is Spark would parse
    // them as string LITERALS and silently return constants
    assert(translate("""SELECT "user id", "2col" FROM t""") ==
      "SELECT `user id`, `2col` FROM t")
    // a column literally NAMED varchar is an identifier, not a type
    assert(translate("""SELECT "varchar" FROM t""") == "SELECT `varchar` FROM t")
    assert(translate("""SELECT "a`b" FROM t""") == "SELECT `a``b` FROM t")
  }

  test("statement splitter: escapes and comments hide semicolons") {
    import graft.compute.SqlSlot.statements
    assert(statements("""SELECT 'don\'t; stop' AS s""") ==
      List("""SELECT 'don\'t; stop' AS s"""))
    assert(statements("SELECT 1 -- trailing; comment\n; SELECT 2") ==
      List("SELECT 1 -- trailing; comment", "SELECT 2"))
    assert(statements("SELECT /* a; b */ 1; SELECT 2") ==
      List("SELECT /* a; b */ 1", "SELECT 2"))
    assert(statements("SELECT 1; SELECT 2;") == List("SELECT 1", "SELECT 2"))
  }
}
