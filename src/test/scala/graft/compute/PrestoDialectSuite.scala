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
}
