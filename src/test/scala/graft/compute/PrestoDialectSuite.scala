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

  test("UNNEST: the cross-join form translates, the rest refuse") {
    assert(translate(
      "SELECT x FROM t CROSS JOIN UNNEST(arr) AS u (x)") ==
      "SELECT x FROM t LATERAL VIEW explode(arr) u AS x")
    assert(translate(
      "SELECT x FROM t cross join unnest(split_arr(a, b)) AS u(x)") ==
      "SELECT x FROM t LATERAL VIEW explode(split_arr(a, b)) u AS x")
    val e = intercept[IllegalArgumentException](translate(
      "SELECT * FROM t CROSS JOIN UNNEST(a) WITH ORDINALITY AS u (x, i)"))
    assert(e.getMessage.contains("UNNEST"))
    // UNNEST text inside a literal is data — even the FULL cross-join
    // form (the rewrite only fires on matches starting outside literals)
    assert(translate("SELECT 'use UNNEST(a)' AS hint") ==
      "SELECT 'use UNNEST(a)' AS hint")
    assert(translate(
      "SELECT 'CROSS JOIN UNNEST(a) AS t (x)' AS doc FROM tips") ==
      "SELECT 'CROSS JOIN UNNEST(a) AS t (x)' AS doc FROM tips")
    // an expr CONTAINING a literal still translates
    assert(translate(
      "SELECT c FROM t CROSS JOIN UNNEST(split(x, ',')) AS u (c)") ==
      """SELECT c FROM t LATERAL VIEW explode(split(x, '\\Q,\\E')) u AS c""")
  }

  test("TRY refuses loudly; try_ functions pass") {
    val e = intercept[IllegalArgumentException](
      translate("SELECT TRY(1/x) FROM t"))
    assert(e.getMessage.contains("TRY"))
    assert(translate("SELECT try_divide(1, x) FROM t") ==
      "SELECT try_divide(1, x) FROM t")
    assert(translate("SELECT 'TRY(1)' AS s") == "SELECT 'TRY(1)' AS s")
  }

  test("split: literal delimiter is regex-quoted, non-literal refuses") {
    // doubled backslashes: Spark's SQL parser consumes one level of
    // escaping inside the literal, leaving regex \Q.\E
    assert(translate("SELECT split(x, '.') FROM t") ==
      """SELECT split(x, '\\Q.\\E') FROM t""")
    assert(translate("SELECT split(f(a, b), '|') FROM t") ==
      """SELECT split(f(a, b), '\\Q|\\E') FROM t""")
    val e = intercept[IllegalArgumentException](
      translate("SELECT split(x, d) FROM t"))
    assert(e.getMessage.contains("split"))
    // a delimiter containing \E itself cannot ride naive \Q…\E wrapping;
    // Pattern.quote splits around it — after Spark's literal unescaping
    // the regex is \Qa\\E\QE b\E (one SQL-escaping level shown doubled)
    assert(translate("""SELECT split(x, 'a\Eb') FROM t""") ==
      "SELECT split(x, '" +
        java.util.regex.Pattern.quote("a\\Eb").replace("\\", "\\\\") +
        "') FROM t")
    // an escaped quote in the delimiter round-trips
    assert(translate("SELECT split(x, '''') FROM t") ==
      "SELECT split(x, '" +
        java.util.regex.Pattern.quote("'").replace("\\", "\\\\")
          .replace("'", "''") + "') FROM t")
  }

  test("date_format %-codes convert to Java patterns; unknown refuse") {
    assert(translate("SELECT date_format(ts, '%Y-%m-%d') FROM t") ==
      "SELECT date_format(ts, 'yyyy-MM-dd') FROM t")
    // literal pattern letters get Java-quoted so Spark can't interpret
    // them (each Java quote doubles inside the SQL literal)
    assert(translate("SELECT date_format(ts, '%H:%i:%sZ') FROM t") ==
      "SELECT date_format(ts, 'HH:mm:ss''Z''') FROM t")
    val e = intercept[IllegalArgumentException](
      translate("SELECT date_format(ts, '%Q') FROM t"))
    assert(e.getMessage.contains("%Q"))
  }

  test("ANSI-divergent and array renames") {
    assert(translate("SELECT element_at(a, 5), contains(a, 3) FROM t") ==
      "SELECT try_element_at(a, 5), array_contains(a, 3) FROM t")
    assert(translate("SELECT to_hex(b), from_hex(s) FROM t") ==
      "SELECT hex(b), unhex(s) FROM t")
    // shared-syntax surface passes through unchanged
    val shared = "SELECT date_trunc('hour', ts), cardinality(a), " +
      "transform(a, x -> x + 1), filter(a, x -> x > 0) FROM t"
    assert(translate(shared) == shared)
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
