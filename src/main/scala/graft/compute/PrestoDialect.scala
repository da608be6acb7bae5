package graft.compute

/** Best-effort PrestoSQL → Spark SQL rewrite for migrating the
  * reference's Athena/Presto slots (aws_athena.py passes user PrestoSQL
  * through verbatim; its own examples are plain ANSI that Spark runs
  * unchanged — this shim covers the common Athena idioms beyond that).
  * Rewrites happen OUTSIDE single-quoted string literals ('' escaping
  * honored), so literal text like 'a "quoted" varchar' survives:
  *
  *  - `date_add('unit', n, x)` → `timestampadd(unit, n, x)`
  *  - `date_diff('unit', a, b)` → `timestampdiff(unit, a, b)`
  *  - `approx_distinct` → `approx_count_distinct`
  *  - `arbitrary` → `any_value`
  *  - `json_extract_scalar` → `get_json_object`
  *  - `to_unixtime` → `unix_timestamp`
  *  - `from_iso8601_timestamp` → `to_timestamp`
  *  - `strpos` → `instr` (same 1-based/0-absent contract)
  *  - `varchar(n)`/`varchar` type names → `string`
  *  - `"ident"` double-quoted identifiers → backticks
  *
  * Anything it does not recognize passes through untouched — the result
  * is always handed to Spark SQL, whose analyzer reports what remains.
  * Use [[PrestoSqlSlot]] to drop a Presto slot into a node unchanged.
  */
object PrestoSqlSlot {
  /** Drop-in for a reference PrestoSQL compute target: translate the
    * dialect, then behave exactly like [[SqlSlot]] ({dim} interpolation,
    * temp views, multi-statement). */
  def apply(prestoSql: String): SqlSlot =
    SqlSlot(PrestoDialect.translate(prestoSql))
}

object PrestoDialect {

  private val fnRenames: Seq[(String, String)] = Seq(
    "approx_distinct" -> "approx_count_distinct",
    "arbitrary" -> "any_value",
    "json_extract_scalar" -> "get_json_object",
    "to_unixtime" -> "unix_timestamp",
    "from_iso8601_timestamp" -> "to_timestamp",
    "strpos" -> "instr",
  )

  /** Split into alternating (outside, literal) chunks; literals keep
    * their quotes and are never rewritten. */
  private def segments(sql: String): List[(String, Boolean)] = {
    val out = scala.collection.mutable.ListBuffer.empty[(String, Boolean)]
    val cur = new StringBuilder
    var inStr = false
    var i = 0
    while (i < sql.length) {
      val c = sql.charAt(i)
      if (!inStr && c == '\'') {
        if (cur.nonEmpty) { out += ((cur.toString, false)); cur.clear() }
        inStr = true; cur += c
      } else if (inStr && c == '\'') {
        if (i + 1 < sql.length && sql.charAt(i + 1) == '\'') {
          cur += c; cur += c; i += 1 // '' escape stays inside
        } else {
          cur += c; out += ((cur.toString, true)); cur.clear(); inStr = false
        }
      } else cur += c
      i += 1
    }
    if (cur.nonEmpty) out += ((cur.toString, inStr))
    out.toList
  }

  private def rewriteFns(s0: String): String = {
    var s = s0
    for ((from, to) <- fnRenames)
      s = s.replaceAll(s"(?i)\\b$from\\s*\\(", s"$to(")
    s = s.replaceAll("(?i)\\bvarchar\\s*\\(\\s*\\d+\\s*\\)", "string")
    s = s.replaceAll("(?i)\\bvarchar\\b", "string")
    s
  }

  private def rewriteOutside(chunk: String): String = {
    // EVERY double-quoted token is a Presto IDENTIFIER (Presto never
    // treats "…" as a string) — convert verbatim to a backticked Spark
    // identifier, whatever the content ("user id", "varchar", leading
    // digits…), and keep identifier text OUT of the function/type
    // rewrites. Left as-is, non-identifier-shaped tokens would parse as
    // Spark STRING LITERALS and silently yield constants.
    val quoted = "\"([^\"]*)\"".r
    val sb = new StringBuilder
    var last = 0
    for (m <- quoted.findAllMatchIn(chunk)) {
      sb ++= rewriteFns(chunk.substring(last, m.start))
      sb ++= "`" + m.group(1).replace("`", "``") + "`"
      last = m.end
    }
    sb ++= rewriteFns(chunk.substring(last))
    sb.toString
  }

  // an outside chunk ending in a unit-bearing call, right before the
  // unit's literal segment; DOTALL so multi-line SQL matches
  private val UnitCallTail =
    "(?is)^(.*?)\\b(date_add|date_diff)(\\s*\\(\\s*)$".r
  private val UnitLiteral = "^'(\\w+)'$".r
  private val CommaHead = "(?s)^\\s*,.*$".r

  def translate(sql: String): String = {
    // The unit-bearing rewrite needs function name AND unit together,
    // but must never fire inside a string literal — so segment FIRST
    // and match the call at an outside-chunk end adjacent to the unit's
    // own literal segment ('unit' is a literal, so a real call always
    // splits exactly this way).
    val segs = segments(sql).toIndexedSeq
    val out = new StringBuilder
    var i = 0
    while (i < segs.length) {
      val (chunk, isLit) = segs(i)
      if (isLit) { out ++= chunk; i += 1 }
      else {
        val unitRewrite = chunk match {
          case UnitCallTail(prefix, fn, paren) if i + 2 < segs.length =>
            (segs(i + 1), segs(i + 2)) match {
              case ((UnitLiteral(unit), true), (CommaHead(), false)) =>
                val newFn =
                  if (fn.equalsIgnoreCase("date_add")) "timestampadd"
                  else "timestampdiff"
                Some((prefix + newFn + paren, unit))
              case _ => None
            }
          case _ => None
        }
        unitRewrite match {
          case Some((rewritten, unit)) =>
            out ++= rewriteOutside(rewritten)
            out ++= unit // bare unit keyword replaces the quoted literal
            i += 2       // consumed this chunk + the unit literal
          case None =>
            out ++= rewriteOutside(chunk)
            i += 1
        }
      }
    }
    out.toString
  }
}
