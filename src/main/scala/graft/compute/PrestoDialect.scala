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
  *  - `element_at` → `try_element_at` (Presto NULLs past the bounds;
  *    Spark's own throws under ANSI)
  *  - `contains(arr, x)` → `array_contains` (Spark's `contains` is the
  *    STRING test — valid Presto must never silently string-match)
  *  - `to_hex`/`from_hex` → `hex`/`unhex`
  *  - `split(x, 'lit')` → `split(x, '\Qlit\E')` (Presto delimiter is a
  *    literal, Spark's a regex); non-literal delimiters REFUSE
  *  - `date_format(ts, '%Y-…')` → Java pattern (unknown %-codes REFUSE)
  *  - `CROSS JOIN UNNEST(expr) AS t (c)` → `LATERAL VIEW explode(expr)
  *    t AS c`; other UNNEST forms (WITH ORDINALITY, multi-column) and
  *    generic `TRY(...)` REFUSE with a clear error
  *  - `varchar(n)`/`varchar` type names → `string`
  *  - `"ident"` double-quoted identifiers → backticks
  *
  * `date_trunc`, higher-order lambdas (`transform/filter/reduce` with
  * `x -> …`), `cardinality`, `slice`, `array_join` share syntax and
  * semantics with Spark and pass through (suite-pinned). Anything else
  * unrecognized passes through untouched — the result is always handed
  * to Spark SQL, whose analyzer reports unknown functions loudly; only
  * constructs that would run-but-differ are refused above.
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
    // Presto element_at returns NULL past the bounds; Spark's throws
    // under ANSI — try_element_at preserves Presto semantics
    "element_at" -> "try_element_at",
    // Presto contains() is the ARRAY membership test (string search is
    // strpos); Spark's contains() is the STRING one — rename to the
    // array form so valid Presto never silently string-matches
    "contains" -> "array_contains",
    "to_hex" -> "hex",
    "from_hex" -> "unhex",
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

  private def unsupported(what: String, hint: String): Nothing =
    throw new IllegalArgumentException(
      s"PrestoDialect: $what is not translatable to Spark SQL — $hint " +
        "(refusing silent passthrough to a wrong result)")

  /** [start, end) spans of single-quoted literals (quotes included). */
  private def literalSpans(sql: String): Vector[(Int, Int)] = {
    val out = Vector.newBuilder[(Int, Int)]
    var i = 0; var s = -1
    while (i < sql.length) {
      val c = sql.charAt(i)
      if (s < 0 && c == '\'') s = i
      else if (s >= 0 && c == '\'') {
        if (i + 1 < sql.length && sql.charAt(i + 1) == '\'') i += 1
        else { out += ((s, i + 1)); s = -1 }
      }
      i += 1
    }
    if (s >= 0) out += ((s, sql.length))
    out.result()
  }

  private def outsideLits(spans: Vector[(Int, Int)], i: Int): Boolean =
    !spans.exists { case (a, b) => i >= a && i < b }

  /** For every call of `fn` outside literals, locate its SECOND argument
    * when that argument is exactly one string literal followed by the
    * closing paren; rewrite the literal's CONTENT through `fix` (which
    * sees the raw content, '' escapes intact, and returns new raw
    * content). A second argument that is anything else → loud
    * `unsupported` — these are the functions whose second-arg semantics
    * differ between the engines, so passthrough would be silently
    * wrong. */
  private def rewriteSecondArgLiteral(sql: String, fn: String,
                                      why: String,
                                      fix: String => String): String = {
    val spans = literalSpans(sql)
    val call = s"(?i)(?<![A-Za-z0-9_])$fn\\s*\\(".r
    val edits = scala.collection.mutable.ListBuffer.empty[(Int, Int, String)]
    for (m <- call.findAllMatchIn(sql) if outsideLits(spans, m.start)) {
      var i = m.end // just past '('
      var depth = 1
      var comma = -1
      while (i < sql.length && comma < 0 && depth > 0) {
        spans.find { case (a, _) => a == i } match {
          case Some((_, b)) => i = b // skip a whole literal
          case None =>
            sql.charAt(i) match {
              case '(' => depth += 1; i += 1
              case ')' => depth -= 1; i += 1 // depth 0 = one-arg call
              case ',' if depth == 1 => comma = i
              case _ => i += 1
            }
        }
      }
      if (comma >= 0) {
        var j = comma + 1
        while (j < sql.length && Character.isWhitespace(sql.charAt(j))) j += 1
        spans.find { case (a, _) => a == j } match {
          case Some((a, b)) =>
            var t = b
            while (t < sql.length && Character.isWhitespace(sql.charAt(t))) t += 1
            if (t < sql.length && sql.charAt(t) == ')')
              edits += ((a + 1, b - 1, fix(sql.substring(a + 1, b - 1))))
            else unsupported(s"$fn(...) with extra arguments", why)
          case None => unsupported(s"$fn(...) with a non-literal second argument", why)
        }
      }
    }
    edits.toList.sortBy(-_._1).foldLeft(sql) { case (acc, (a, b, rep)) =>
      acc.substring(0, a) + rep + acc.substring(b)
    }
  }

  /** Presto (MySQL-style) %-codes → Spark (Java) datetime pattern; the
    * input is raw SQL-literal content ('' = one quote). Non-% letters
    * must be QUOTED in the Java pattern (they are pattern letters to
    * Spark); an unknown %-code is a loud error, never a guess. */
  private def prestoDateFormatToJava(raw: String): String = {
    val codes = Map(
      'Y' -> "yyyy", 'y' -> "yy", 'm' -> "MM", 'c' -> "M", 'd' -> "dd",
      'e' -> "d", 'H' -> "HH", 'k' -> "H", 'h' -> "hh", 'l' -> "h",
      'i' -> "mm", 's' -> "ss", 'S' -> "ss", 'f' -> "SSSSSS",
      'j' -> "DDD", 'a' -> "EEE", 'W' -> "EEEE", 'b' -> "MMM",
      'M' -> "MMMM", 'p' -> "a", 'T' -> "HH:mm:ss", 'r' -> "hh:mm:ss a",
      '%' -> "%")
    val sb = new StringBuilder
    var i = 0
    while (i < raw.length) {
      val c = raw.charAt(i)
      if (c == '%' && i + 1 < raw.length) {
        val code = raw.charAt(i + 1)
        sb ++= codes.getOrElse(code, unsupported(
          s"date_format %-code '%$code'",
          "no Java-pattern equivalent is known"))
        i += 2
      } else if (c == '\'') { sb ++= "''''"; i += 2 } // '' stays a quote, Java-quoted
      else if (Character.isLetter(c)) {
        // a literal letter must be Java-quoted ('X'); each Java quote
        // re-escapes to '' inside the SQL literal this content re-enters
        sb ++= "''"; sb += c; sb ++= "''"; i += 1
      } else { sb += c; i += 1 }
    }
    sb.toString
  }

  private val CrossJoinUnnest =
    ("(?is)\\bCROSS\\s+JOIN\\s+UNNEST\\s*\\(" +
      "([^()]*(?:\\([^()]*\\)[^()]*)*)\\)\\s+AS\\s+(\\w+)\\s*\\(\\s*(\\w+)\\s*\\)").r

  def translate(sql: String): String = {
    // ---- idioms whose Presto/Spark semantics DIVERGE (silent-wrong
    // hazards) — translate the supported shapes, refuse the rest loudly.
    var cur = sql
    locally {
      val spans = literalSpans(cur)
      // generic TRY(expr) has no Spark equivalent (try_cast/try_divide/
      // try_element_at cover the specific cases)
      for (m <- "(?i)(?<![A-Za-z0-9_])try\\s*\\(".r.findAllMatchIn(cur)
           if outsideLits(spans, m.start))
        unsupported("TRY(...)",
          "use try_cast/try_divide/try_element_at or handle errors explicitly")
    }
    // CROSS JOIN UNNEST(expr) AS t (c) → LATERAL VIEW explode(expr) t
    // AS c — only for matches STARTING outside string literals (the
    // expr itself may contain literals and still translates; matching
    // text wholly inside a literal is data)
    locally {
      val spans = literalSpans(cur)
      val edits = CrossJoinUnnest.findAllMatchIn(cur)
        .filter(m => outsideLits(spans, m.start))
        .map(m => (m.start, m.end,
          s"LATERAL VIEW explode(${m.group(1)}) ${m.group(2)} AS ${m.group(3)}"))
        .toList
      cur = edits.sortBy(-_._1).foldLeft(cur) { case (acc, (a, b, rep)) =>
        acc.substring(0, a) + rep + acc.substring(b)
      }
    }
    locally {
      val spans = literalSpans(cur)
      for (m <- "(?i)\\bunnest\\b".r.findAllMatchIn(cur)
           if outsideLits(spans, m.start))
        unsupported("this UNNEST form (WITH ORDINALITY / multi-column / " +
          "comma-join)", "only CROSS JOIN UNNEST(expr) AS t (col) translates")
    }
    // Presto split() delimiter is a LITERAL; Spark's is a REGEX —
    // regex-quote it via Pattern.quote (which, unlike naive \Q…\E
    // wrapping, survives a delimiter containing \E itself);
    // non-literal delimiters refuse. The quoted regex then re-escapes
    // INTO SQL-literal text: backslashes double (Spark's parser
    // consumes one escaping level) and quotes double per SQL.
    cur = rewriteSecondArgLiteral(cur, "split",
      "Spark split() treats the delimiter as a regex",
      c => java.util.regex.Pattern.quote(c.replace("''", "'"))
        .replace("\\", "\\\\").replace("'", "''"))
    // Presto date_format uses MySQL %-codes; Spark uses Java patterns
    cur = rewriteSecondArgLiteral(cur, "date_format",
      "Spark date_format() takes a Java datetime pattern",
      prestoDateFormatToJava)

    // The unit-bearing rewrite needs function name AND unit together,
    // but must never fire inside a string literal — so segment FIRST
    // and match the call at an outside-chunk end adjacent to the unit's
    // own literal segment ('unit' is a literal, so a real call always
    // splits exactly this way).
    val segs = segments(cur).toIndexedSeq
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
