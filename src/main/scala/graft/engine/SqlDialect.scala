package graft.engine

/** DuckDB-dialect → Spark SQL translation shim (SURVEY.md §4.2).
  *
  * The reference's handler/command SQL is DuckDB SQL; the constructs it
  * actually uses (catalogued in SURVEY.md §2B from every shipped config
  * and test) are rewritten here at string level:
  *
  *  - `{'k': v, ...}` struct literal            → named_struct('k', v, ...)
  *  - `col ->> 'k'` (chainable)                 → duck_extract(col, 'k')
  *  - `expr::TYPE`                              → CAST(expr AS TYPE) (type-mapped)
  *  - `strftime(x, '%Y-...')`                   → date_format(x, 'yyyy-...')
  *  - `time_bucket(INTERVAL 'n u', x)`          → epoch-floor bucketing
  *  - `now()`                                   → current_timestamp()
  *  - `to_timestamp(numericExpr)`               → timestamp_seconds(...)
  *  - `x AT TIME ZONE 'utc'`                    → x (session TZ is UTC)
  *  - correlated `LEFT JOIN (SELECT ... LIMIT 1)` → dedup-then-join rewrite
  *  - trailing `;`                              → stripped
  *
  * Statement-level forms (`INSERT ... ON CONFLICT`, `DELETE FROM`,
  * `CREATE TABLE`, inline `read_csv*`/`read_json_auto`) are parsed into
  * specs consumed by the state-table / invoke layers.
  */
object SqlDialect {

  def translate(sql: String): String = {
    var s = sql.trim.stripSuffix(";")
    s = rewriteStructLiterals(s)
    s = rewriteDoubleQuotedIdents(s)
    s = rewriteTrailingCommas(s)
    s = rewriteJsonArrows(s)
    s = rewritePivotStatement(s)
    s = rewriteUnpivotStatement(s)
    s = rewriteAsofJoin(s)
    s = rewriteCorrelatedLimit1Join(s)
    s = rewriteStrftime(s)
    s = rewriteTimeBucket(s)
    s = rewriteDoubleColonCasts(s)
    s = rewriteListBrackets(s)
    s = rewriteDistinctOn(s)
    s = rewriteQualify(s)
    s = rewriteDistinctWindowCount(s)
    // DuckDB SELECT-list unnest(arr) ≡ Spark explode(arr) (one output
    // row per element). The rename is position-blind: a simple
    // FROM-clause `unnest(array)` also becomes `explode(array)`, which
    // Spark 3.4+ runs as a table-valued generator with the same rows;
    // DuckDB-only forms (recursive := true, correlated lateral unnest
    // with column aliases) are NOT supported — Spark rejects them at
    // parse/analysis rather than silently diverging.
    s = renameFunctionCall(s, "unnest", "explode")
    // DuckDB list_* higher-order/array functions → Spark equivalents
    // with identical argument shapes and semantics (the lambda/array
    // forms are position-free, so 1-based-list differences don't
    // arise). NOT renamed, by design: list indexing/slicing (1-based
    // vs 0-based), list_sum/list_unique (no direct Spark name —
    // compose aggregate()/size(array_distinct())), len (also a string
    // function in DuckDB). list_sort → array_sort null ordering was
    // VERIFIED equivalent against the oracle's DuckDB (1.0.0:
    // default_null_order=nulls_last, list_sort([3,NULL,1]) →
    // [1,3,NULL]) — the same nulls-last contract as Spark array_sort.
    Seq(
      "list_transform" -> "transform",
      "list_filter" -> "filter",
      "list_distinct" -> "array_distinct",
      "list_sort" -> "array_sort",
      "list_min" -> "array_min",
      "list_max" -> "array_max",
      "list_contains" -> "array_contains",
      "list_has_any" -> "arrays_overlap",
      "list_append" -> "array_append",
      "list_intersect" -> "array_intersect",
      "array_to_string" -> "array_join",
      // arg_max(x, y) ≡ max_by(x, y): both return x at the row
      // maximizing y, nulls-in-y skipped in both engines
      "arg_max" -> "max_by",
      "arg_min" -> "min_by"
    ).foreach { case (from, to) => s = renameFunctionCall(s, from, to) }
    // DuckDB star modifier `* EXCLUDE (a, b)` / `* EXCLUDE a` ≡ Spark
    // `* EXCEPT (a, b)` (same column-pruning semantics; the `*`
    // anchor keeps string literals safe).
    s = s.replaceAll("(?i)(\\*\\s*)EXCLUDE\\s*\\(", "$1EXCEPT (")
    s = s.replaceAll("(?i)(\\*\\s*)EXCLUDE\\s+(\"?[\\w]+\"?)", "$1EXCEPT ($2)")
    s = rewriteStarReplace(s)
    // DuckDB puts IGNORE/RESPECT NULLS INSIDE the window-function call
    // (`last_value(x IGNORE NULLS)`); Spark's grammar is postfix
    // (`last_value(x) IGNORE NULLS`). The modifier is only legal
    // immediately before the call's closing paren, so transposing the
    // paren across it is exactly the translation (argument lists with
    // nested parens are untouched — the modifier still sits last).
    s = s.replaceAll("(?i)\\s+(IGNORE|RESPECT)\\s+NULLS\\s*\\)", ") $1 NULLS")
    s = s.replaceAll("(?i)\\bnow\\s*\\(\\s*\\)", "current_timestamp()")
    s = s.replaceAll("(?i)\\bto_timestamp\\s*\\(", "timestamp_seconds(")
    s = s.replaceAll("(?i)\\s+at\\s+time\\s+zone\\s+'utc'", "")
    s
  }

  /** DuckDB bracket syntax → Spark:
    *   - list literal  `[a, b, c]`            → `array(a, b, c)`
    *   - comprehension `[e FOR x IN xs]`      → `transform(xs, x -> e)`
    *   - filtered      `[e FOR x IN xs IF c]` →
    *     `transform(filter(xs, x -> c), x -> e)`
    *
    * A bracket directly following an identifier / `)` / `]` is
    * INDEXING (`arr[i]` — Spark-native) and passes through untouched;
    * slice brackets only occur in that indexing position, so they are
    * never rewritten. Nested literals/comprehensions rewrite
    * recursively; quoted strings are opaque. Known limitation: an
    * `if(...)` FUNCTION call inside the iterable expression would be
    * mis-read as the comprehension filter keyword — write `CASE WHEN`
    * there (DuckDB comprehensions in the wild use bare IF only as the
    * filter clause). */
  private[engine] def rewriteListBrackets(s: String): String = {
    def isIdent(c: Char) = c.isLetterOrDigit || c == '_'
    var i = 0; var inS = false; var inD = false
    while (i < s.length) {
      val c = s(i)
      if (inS) { if (c == '\'') inS = false }
      else if (inD) { if (c == '"') inD = false }
      else c match {
        case '\'' => inS = true
        case '"' => inD = true
        case '[' =>
          var j = i - 1
          while (j >= 0 && s(j).isWhitespace) j -= 1
          // indexing = bracket follows an EXPRESSION tail; a bracket
          // after a keyword (SELECT [1,2], THEN [...], IN [..]) is a
          // literal even though a keyword is also identifier-shaped
          val keywords = Set("SELECT", "FROM", "WHERE", "WHEN", "THEN",
            "ELSE", "AND", "OR", "NOT", "IN", "ON", "BY", "HAVING",
            "RETURN", "DISTINCT", "ALL", "UNION", "EXCEPT", "INTERSECT",
            "VALUES", "AS", "IF", "FOR", "BETWEEN", "LIKE", "CASE")
          val indexing = j >= 0 && {
            if (s(j) == ')' || s(j) == ']') true
            else if (isIdent(s(j))) {
              var w0 = j
              while (w0 >= 0 && isIdent(s(w0))) w0 -= 1
              !keywords.contains(s.substring(w0 + 1, j + 1).toUpperCase)
            } else false
          }
          if (!indexing) {
            var depthB = 1; var dp = 0; var k = i + 1
            var qs = false; var qd = false
            var forPos = -1; var inPos = -1; var ifPos = -1
            while (k < s.length && depthB > 0) {
              val ck = s(k)
              if (qs) { if (ck == '\'') qs = false }
              else if (qd) { if (ck == '"') qd = false }
              else ck match {
                case '\'' => qs = true
                case '"' => qd = true
                case '[' => depthB += 1
                case ']' => depthB -= 1
                case '(' => dp += 1
                case ')' => dp -= 1
                case _ =>
                  if (depthB == 1 && dp == 0 && (k == 0 || !isIdent(s(k - 1)))) {
                    def kw(w: String) =
                      s.regionMatches(true, k, w, 0, w.length) &&
                        k + w.length < s.length && !isIdent(s(k + w.length))
                    if (forPos < 0 && kw("FOR")) forPos = k
                    else if (forPos >= 0 && inPos < 0 && kw("IN")) inPos = k
                    else if (inPos >= 0 && ifPos < 0 && kw("IF")) ifPos = k
                  }
              }
              k += 1
            }
            require(depthB == 0, s"unbalanced [ in: $s")
            val close = k - 1
            val replaced =
              if (forPos < 0)
                s"array(${rewriteListBrackets(s.substring(i + 1, close))})"
              else {
                val e = rewriteListBrackets(s.substring(i + 1, forPos).trim)
                val v0 = s.substring(forPos + 3, inPos).trim
                val v = if (v0.contains(",")) s"($v0)" else v0
                val (xs, cond) =
                  if (ifPos < 0) (s.substring(inPos + 2, close).trim, None)
                  else (s.substring(inPos + 2, ifPos).trim,
                    Some(s.substring(ifPos + 2, close).trim))
                val xsR = rewriteListBrackets(xs)
                cond match {
                  case None => s"transform($xsR, $v -> $e)"
                  case Some(c0) =>
                    s"transform(filter($xsR, $v -> ${rewriteListBrackets(c0)}), $v -> $e)"
                }
              }
            return s.substring(0, i) + replaced +
              rewriteListBrackets(s.substring(close + 1))
          }
        case _ =>
      }
      i += 1
    }
    s
  }

  /** DuckDB star modifier `* REPLACE (expr AS col, …)` → Spark
    * `* EXCEPT (col, …), expr AS col, …` — all columns pass through
    * with `col` recomputed as `expr`. DOCUMENTED DEVIATION: Spark has
    * no in-place star substitution, so replaced columns move to the
    * END of the projection (DuckDB keeps their original position);
    * the column SET and values are identical. Exprs are extracted with
    * a paren-balanced, quote-aware scan (they may contain calls and
    * commas); an item without a top-level ` AS ` fails loudly. */
  private def rewriteStarReplace(s: String): String = {
    val m = java.util.regex.Pattern
      .compile("(?i)(\\*\\s*)REPLACE\\s*\\(").matcher(s)
    // quote-aware: skip matches inside single-quoted string literals
    var found = false
    while (!found && m.find())
      found = s.substring(0, m.start).count(_ == '\'') % 2 == 0
    if (!found) return s
    // matching close paren, skipping quoted strings
    val open = m.end() - 1
    var depth = 0; var j = open; var inQ = false; var close = -1
    while (j < s.length && close < 0) {
      val c = s.charAt(j)
      if (inQ) { if (c == '\'') inQ = false }
      else if (c == '\'') inQ = true
      else if (c == '(') depth += 1
      else if (c == ')') { depth -= 1; if (depth == 0) close = j }
      j += 1
    }
    require(close > 0, s"unbalanced parentheses in * REPLACE: $s")
    val items = splitTopLevelCommas(s.substring(open + 1, close))
      .map(_.trim).filter(_.nonEmpty).map { item =>
      val asIdx = findTopLevelKeyword(item, "AS")
      require(asIdx >= 0, s"* REPLACE item needs `expr AS col`: $item")
      (item.substring(0, asIdx).trim,
        item.substring(asIdx + 2).trim)
    }
    val except = items.map(_._2).mkString(", ")
    val recomputed = items.map { case (e, c) => s"$e AS $c" }.mkString(", ")
    val star = s.substring(m.start(1), m.end(1)).trim // `*` or `t.*`… keep as written
    val rewritten = s.substring(0, m.start(1)) +
      s"$star EXCEPT ($except), $recomputed" + s.substring(close + 1)
    rewriteStarReplace(rewritten) // handle any further REPLACE modifiers
  }

  /** DuckDB/Postgres double-quoted identifiers (`em."offset"`) →
    * backticked Spark identifiers. Spark's default parser reads
    * double-quoted tokens as STRING LITERALS, silently breaking the
    * reference SQL. Only single-word quoted tokens outside
    * single-quoted strings are rewritten (a real string literal like
    * '{"k":1}' is untouched). */
  private def rewriteDoubleQuotedIdents(s: String): String = {
    val sb = new StringBuilder
    var i = 0; var inQuote = false
    while (i < s.length) {
      val c = s.charAt(i)
      if (inQuote) {
        sb.append(c); if (c == '\'') inQuote = false; i += 1
      } else if (c == '\'') {
        sb.append(c); inQuote = true; i += 1
      } else if (c == '"') {
        val end = s.indexOf('"', i + 1)
        val body = if (end > i) s.substring(i + 1, end) else ""
        if (end > i && body.matches("[A-Za-z_]\\w*")) {
          sb.append('`').append(body).append('`'); i = end + 1
        } else { sb.append(c); i += 1 }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** DuckDB tolerates a trailing comma in the SELECT list
    * (`kafka.motherduck.idempotent.yml` handler); Spark does not. */
  private def rewriteTrailingCommas(s: String): String = {
    val sb = new StringBuilder
    var i = 0; var inQuote = false
    while (i < s.length) {
      val c = s.charAt(i)
      if (inQuote) { sb.append(c); if (c == '\'') inQuote = false; i += 1 }
      else if (c == '\'') { sb.append(c); inQuote = true; i += 1 }
      else if (c == ',') {
        var j = i + 1
        while (j < s.length && s.charAt(j).isWhitespace) j += 1
        // the char after FROM must not continue an identifier —
        // `from_unixtime(...)` / `from_json(...)` are function calls,
        // not the FROM keyword ('_' counts as an identifier char)
        def identChar(c: Char) = c.isLetterOrDigit || c == '_'
        if (s.regionMatches(true, j, "FROM", 0, 4) &&
            (j + 4 >= s.length || !identChar(s.charAt(j + 4)))) i += 1
        else { sb.append(c); i += 1 }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  private val typeMap = Map(
    "timestamptz" -> "TIMESTAMP", "timestamp" -> "TIMESTAMP",
    "string" -> "STRING", "text" -> "STRING", "varchar" -> "STRING",
    "int" -> "INT", "integer" -> "INT", "bigint" -> "BIGINT",
    "double" -> "DOUBLE", "float8" -> "DOUBLE", "boolean" -> "BOOLEAN",
    "date" -> "DATE",
    // no INET type in Spark; comparisons must go through ip_to_long (Udfs)
    "inet" -> "STRING")

  /** `expr::type` → CAST(expr AS T). Operand forms seen in the
    * reference surface: identifier paths, `now()`-style calls, quoted
    * literals, parenthesized expressions. */
  private def rewriteDoubleColonCasts(s: String): String = {
    val pat = """('[^']*'|[A-Za-z_][\w\.]*\s*\(\s*\)|[A-Za-z_][\w\.]*|\([^()]*\))::([A-Za-z_]\w*)""".r
    var cur = s
    var changed = true
    while (changed) {
      val next = pat.replaceAllIn(cur, m => {
        val t = typeMap.getOrElse(m.group(2).toLowerCase, m.group(2).toUpperCase)
        java.util.regex.Matcher.quoteReplacement(s"CAST(${m.group(1)} AS $t)")
      })
      changed = next != cur
      cur = next
    }
    cur
  }

  /** `{'k': v, ...}` → named_struct('k', v, ...), nesting-aware. A `{`
    * inside a quoted string (e.g. a JSON literal `'{"k":1}'`) is NOT a
    * struct literal and must survive untouched. */
  private def rewriteStructLiterals(s: String): String = {
    val open = {
      var j = 0; var q = false; var found = -1
      while (j < s.length && found < 0) {
        val c = s.charAt(j)
        if (q) { if (c == '\'') q = false }
        else if (c == '\'') q = true
        else if (c == '{') found = j
        j += 1
      }
      found
    }
    if (open < 0) return s
    // find the matching close brace, skipping quoted strings
    var depth = 0; var i = open; var inQuote = false; var close = -1
    while (i < s.length && close < 0) {
      val c = s.charAt(i)
      if (inQuote) { if (c == '\'') inQuote = false }
      else c match {
        case '\'' => inQuote = true
        case '{' => depth += 1
        case '}' => depth -= 1; if (depth == 0) close = i
        case _ =>
      }
      i += 1
    }
    if (close < 0) return s
    val body = s.substring(open + 1, close)
    // split top-level commas
    val parts = scala.collection.mutable.ArrayBuffer[String]()
    var level = 0; var q = false; var start = 0
    for (j <- 0 until body.length) {
      val c = body.charAt(j)
      if (q) { if (c == '\'') q = false }
      else c match {
        case '\'' => q = true
        case '{' | '(' | '[' => level += 1
        case '}' | ')' | ']' => level -= 1
        case ',' if level == 0 =>
          parts += body.substring(start, j); start = j + 1
        case _ =>
      }
    }
    parts += body.substring(start)
    val kvs = parts.map { p =>
      val idx = {
        // first ':' outside quotes
        var k = -1; var qq = false; var j = 0
        while (j < p.length && k < 0) {
          val c = p.charAt(j)
          if (qq) { if (c == '\'') qq = false }
          else if (c == '\'') qq = true
          else if (c == ':') k = j
          j += 1
        }
        k
      }
      require(idx > 0, s"malformed struct literal entry: $p")
      // keys may be single-quoted, double-quoted (kafka.postgres.join.yml
      // uses {"user_id": …}), or bare; normalize to a single-quoted name
      val key = "'" + p.substring(0, idx).trim
        .stripPrefix("'").stripSuffix("'")
        .stripPrefix("\"").stripSuffix("\"") + "'"
      val value = rewriteStructLiterals(p.substring(idx + 1).trim) // nested
      s"$key, $value"
    }
    val replaced = s"named_struct(${kvs.mkString(", ")})"
    s.substring(0, open) + replaced + rewriteStructLiterals(s.substring(close + 1))
  }

  /** `base ->> 'k1' ->> 'k2'` → duck_extract(duck_extract(base,'k1'),'k2')
    * — a type-dispatched extraction (struct field OR get_json_object)
    * because the same reference SQL runs over decoded objects and raw
    * JSON strings alike (functions.DuckArrowExtract). */
  private def rewriteJsonArrows(s: String): String = {
    val pat = """([A-Za-z_][\w\.]*)((?:\s*->>\s*'[^']+')+)""".r
    pat.replaceAllIn(s, m => {
      val keys = """'([^']+)'""".r.findAllMatchIn(m.group(2)).map(_.group(1)).toSeq
      val expr = keys.foldLeft(m.group(1))((acc, k) => s"duck_extract($acc, '$k')")
      java.util.regex.Matcher.quoteReplacement(expr)
    })
  }

  private val strftimeMap = Map(
    "%Y" -> "yyyy", "%m" -> "MM", "%d" -> "dd",
    "%H" -> "HH", "%M" -> "mm", "%S" -> "ss", "%f" -> "SSSSSS",
    "%j" -> "DDD", "%y" -> "yy")

  /** Map a strftime format to a java.time pattern: %X tokens map via
    * the table; literal letters (e.g. the ISO 'T') are single-quoted. */
  def mapStrftimeFormat(f: String): String = {
    val sb = new StringBuilder
    val lit = new StringBuilder
    def flushLit(): Unit = {
      if (lit.nonEmpty) {
        sb.append(lit.toString.replaceAll("([A-Za-z]+)", "'$1'"))
        lit.clear()
      }
    }
    var i = 0
    while (i < f.length) {
      if (f.charAt(i) == '%' && i + 1 < f.length &&
          strftimeMap.contains(f.substring(i, i + 2))) {
        flushLit()
        sb.append(strftimeMap(f.substring(i, i + 2)))
        i += 2
      } else {
        lit.append(f.charAt(i))
        i += 1
      }
    }
    flushLit()
    sb.toString
  }

  /** strftime(expr, '%fmt') → date_format(expr, 'mapped') with
    * balanced-paren parsing so expr may contain calls. */
  private def rewriteStrftime(s: String): String = {
    val idx = s.toLowerCase.indexOf("strftime(")
    if (idx < 0) return s
    val argsStart = idx + "strftime(".length
    var depth = 1; var i = argsStart; var q = false
    val commas = scala.collection.mutable.ArrayBuffer[Int]()
    var end = -1
    while (i < s.length && end < 0) {
      val c = s.charAt(i)
      if (q) { if (c == '\'') q = false }
      else c match {
        case '\'' => q = true
        case '(' => depth += 1
        case ')' => depth -= 1; if (depth == 0) end = i
        case ',' if depth == 1 => commas += i
        case _ =>
      }
      i += 1
    }
    require(end > 0 && commas.nonEmpty, s"cannot parse strftime in: $s")
    val arg0 = s.substring(argsStart, commas.head).trim
    val fmtRaw = s.substring(commas.head + 1, end).trim
    require(fmtRaw.startsWith("'") && fmtRaw.endsWith("'"),
      s"strftime format must be a string literal: $fmtRaw")
    val fmt = mapStrftimeFormat(fmtRaw.substring(1, fmtRaw.length - 1))
    // embedded quotes (quoted literal letters like the ISO 'T') must be
    // doubled inside a SQL string literal
    val fmtSql = fmt.replace("'", "''")
    s.substring(0, idx) + s"date_format($arg0, '$fmtSql')" +
      rewriteStrftime(s.substring(end + 1))
  }

  private val unitSeconds = Map(
    "second" -> 1L, "seconds" -> 1L, "minute" -> 60L, "minutes" -> 60L,
    "hour" -> 3600L, "hours" -> 3600L, "day" -> 86400L, "days" -> 86400L)

  /** time_bucket(INTERVAL 'n unit', x) → tumbling bucket start via
    * epoch floor-division (equivalent to Spark's window(x,'n unit').start
    * but usable outside a streaming groupBy). The value argument is
    * extracted with a paren-balanced scan, not a regex — `x` can itself
    * be a function call (`to_timestamp(time_us / 1000000)`,
    * bluesky.kafka.windowed.yml:49), which a first-`)` match would
    * truncate mid-expression. */
  private def rewriteTimeBucket(s: String): String = {
    val lower = s.toLowerCase
    val idx = lower.indexOf("time_bucket")
    if (idx < 0) return s
    var i = idx + "time_bucket".length
    while (i < s.length && s.charAt(i).isWhitespace) i += 1
    if (i >= s.length || s.charAt(i) != '(')
      return s.substring(0, i) + rewriteTimeBucket(s.substring(i))
    // matching close paren, skipping quoted strings
    var depth = 0; var j = i; var inQ = false; var close = -1
    while (j < s.length && close < 0) {
      val c = s.charAt(j)
      if (inQ) { if (c == '\'') inQ = false }
      else if (c == '\'') inQ = true
      else if (c == '(') depth += 1
      else if (c == ')') { depth -= 1; if (depth == 0) close = j }
      j += 1
    }
    require(close > 0, s"unbalanced parentheses in time_bucket: $s")
    val inner = s.substring(i + 1, close)
    val quoted = """(?is)^\s*INTERVAL\s+'(\d+)\s+([A-Za-z]+)'\s*,\s*(.+)$""".r
    val bare = """(?is)^\s*INTERVAL\s+'(\d+)'\s*([A-Za-z]+)\s*,\s*(.+)$""".r
    val (n, unit, x) = inner match {
      case quoted(a, b, c) => (a, b, c)
      case bare(a, b, c) => (a, b, c)
      case _ => throw new IllegalArgumentException(
        s"cannot parse time_bucket arguments: $inner")
    }
    val secs = n.toLong * unitSeconds.getOrElse(unit.toLowerCase,
      throw new IllegalArgumentException(s"unsupported time_bucket unit: $unit"))
    s.substring(0, idx) +
      s"timestamp_seconds((unix_timestamp(${x.trim}) div $secs) * $secs)" +
      rewriteTimeBucket(s.substring(close + 1))
  }

  /** The reference's dedup-lookup idiom (`csv.mem.join.yml:24-34`):
    *   LEFT JOIN (SELECT * FROM dim WHERE dim.k = outer.k LIMIT 1) AS a
    *     ON a.k = outer.k
    * Spark rejects correlated subqueries with LIMIT; the equivalent
    * plan keeps exactly one dim row per key (first by input order) and
    * left-joins it (SURVEY.md §7.4 risk #3). */
  /** DuckDB top-level `PIVOT` statement → Spark `PIVOT` clause.
    * DuckDB: `PIVOT tbl ON c IN ('a','b') USING agg(x) GROUP BY g
    * [ORDER BY …]` — Spark has the same capability but as a
    * table-suffix clause whose non-pivot columns implicitly group, so
    * the rewrite projects (group cols, on col, agg arg) in a subquery
    * first. Output column names match DuckDB's (the bare literal
    * value) via `AS` aliases in the IN list.
    *
    * Supported subset, else untouched for a loud Spark parse failure
    * on the leading `PIVOT` token: explicit `IN` value list of
    * literals (DuckDB's auto-discovered ON-values form needs a
    * catalog scan at translate time — out of scope by design: an
    * unbounded value set is also the 100-TB anti-pattern, one output
    * column per distinct key), single `agg(column)`, explicit GROUP
    * BY of plain columns. */
  private def rewritePivotStatement(s: String): String = {
    val pat = ("""(?is)^\s*PIVOT\s+([\w\.]+)\s+ON\s+(\w+)\s+IN\s*\(([^)]*)\)""" +
      """\s+USING\s+(\w+)\s*\(\s*([\w\.]+)\s*\)\s+GROUP\s+BY\s+""" +
      """(\w+(?:\s*,\s*\w+)*)\s*(ORDER\s+BY\s+.*)?$""").r
    s match {
      case pat(table, onCol, vals, agg, arg, groupCols, orderBy) =>
        val names = vals.split(",").map(_.trim).filter(_.nonEmpty)
          .map(_.stripPrefix("'").stripSuffix("'"))
        val aliases = vals.split(",").map(_.trim).filter(_.nonEmpty)
          .zip(names).map { case (v, n) => s"$v AS `$n`" }.mkString(", ")
        val g = groupCols.split(",").map(_.trim).toSeq
        val proj = (g :+ onCol :+ arg).distinct.mkString(", ")
        val ob = Option(orderBy).map(" " + _).getOrElse("")
        val pivoted = s"(SELECT $proj FROM $table) " +
          s"PIVOT ($agg($arg) FOR $onCol IN ($aliases))"
        // DuckDB's PIVOT fills empty (group, value) combos with 0 for
        // count (verified 1.0.0); Spark's clause yields NULL. Other
        // aggs (sum/min/max/avg) are NULL in both engines — only
        // count needs the repair projection.
        if (agg.equalsIgnoreCase("count")) {
          val fill = names.map(n => s"coalesce(`$n`, 0) AS `$n`")
          s"SELECT ${(g ++ fill).mkString(", ")} FROM $pivoted$ob"
        } else s"SELECT * FROM $pivoted$ob"
      case _ => s
    }
  }

  /** DuckDB top-level `UNPIVOT` statement → Spark `UNPIVOT` clause.
    * DuckDB: `UNPIVOT tbl ON c1, c2 INTO NAME n VALUE v [ORDER BY …]`
    * → Spark: `SELECT * FROM tbl UNPIVOT (v FOR n IN (c1, c2)) …`.
    * Identical row semantics (NULL cells dropped in both engines) and
    * identical output column order (passthrough cols, name, value).
    * DuckDB's multi-VALUE and expression forms are left untouched for
    * a loud Spark parse failure on the leading `UNPIVOT` token. */
  private def rewriteUnpivotStatement(s: String): String = {
    val pat = ("""(?is)^\s*UNPIVOT\s+([\w\.]+)\s+ON\s+""" +
      """(\w+(?:\s*,\s*\w+)*)\s+INTO\s+NAME\s+(\w+)\s+VALUE\s+(\w+)""" +
      """\s*(ORDER\s+BY\s+.*)?$""").r
    s match {
      case pat(table, cols, nameCol, valCol, orderBy) =>
        val colList = cols.split(",").map(_.trim).mkString(", ")
        val ob = Option(orderBy).map(" " + _).getOrElse("")
        s"SELECT * FROM $table UNPIVOT ($valCol FOR $nameCol IN ($colList))$ob"
      case _ => s
    }
  }

  /** DuckDB `ASOF [LEFT] JOIN` (also `LEFT ASOF JOIN`) → the
    * NON-correlated interval rewrite. Spark has no ASOF syntax, and
    * its decorrelation of the tempting `LATERAL … LIMIT 1` form
    * substitutes the key equality out of the domain, leaving a
    * nested-loop join on a ts-only domain — |distinct left ts| ×
    * |right| comparisons, measured quadratic at sf0.1. Instead each
    * right row is given its ownership interval via ONE window over
    * the right side (`lead(ts) OVER (PARTITION BY keys ORDER BY ts)`
    * for backward, `lag` for forward), and the asof becomes a plain
    * equi-join on the keys plus interval-containment filters: exactly
    * one right row per (key, left ts) can match. One right-side
    * shuffle + one equi-join — the same cost class as
    * [[graft.operators.AsofJoin]], safe for big facts on both sides
    * (per-key SMJ work is n_l·n_r per key only pre-filter, never a
    * cross product across keys).
    *
    * Supported subset — anything else is left untouched so Spark
    * fails loudly on the `ASOF` token rather than silently diverging:
    * a table/view-name right side with optional alias, and an ON
    * conjunction of plain `x.col OP y.col` terms containing exactly
    * ONE inequality that involves the right alias (DuckDB's own
    * well-formedness rule for ASOF).
    *
    * Direction: `l.ts >= r.ts` (backward) picks the LATEST matching
    * right row — interval [ts, next); `l.ts <= r.ts` (forward) the
    * EARLIEST — interval (prev, ts]. Strict variants shift the
    * bounds. Right rows with NULL ts are dropped inside the subquery
    * (they can never match, and would corrupt the lead/lag chain).
    * Duplicate right (keys, ts) break pick-one in BOTH engines —
    * unique right timestamps per key remain the caller's contract.
    * The wrapped right side carries one synthetic `__asof_end`
    * column, visible to a `SELECT *` over the join — use explicit
    * projections (or `* EXCLUDE`) when that matters. */
  private def rewriteAsofJoin(s: String): String = {
    val pat = java.util.regex.Pattern.compile(
      """(?is)\b(?:(LEFT)\s+ASOF\s+JOIN|ASOF\s+(?:(LEFT)\s+)?JOIN)\s+([\w\.]+)(?:\s+(?:AS\s+)?([A-Za-z_]\w*))?\s+ON\b""")
    val m = pat.matcher(s)
    if (!m.find()) return s
    val condsStart = m.end()
    val tail = s.substring(condsStart)
    val stops = Seq("WHERE", "GROUP", "ORDER", "LIMIT", "QUALIFY", "HAVING",
      "UNION", "INTERSECT", "EXCEPT", "JOIN", "LEFT", "RIGHT", "FULL",
      "INNER", "CROSS", "ASOF")
    val endRel = stops.map(k => findTopLevelKeyword(tail, k))
      .filter(_ >= 0).sorted.headOption.getOrElse(tail.length)
    val conds = tail.substring(0, endRel).trim
    val table = m.group(3)
    val ra = Option(m.group(4)).getOrElse(table.split('.').last)
    val cmp = """(?s)^([\w\.]+)\s*(<=|>=|<|>|=)\s*([\w\.]+)$""".r
    val parsed = splitTopLevelAnd(conds).map(_.trim).map {
      case cmp(a, op, b) => Some((a, op, b))
      case _ => None
    }
    if (parsed.exists(_.isEmpty)) return s
    def isRa(x: String) = x.startsWith(ra + ".")
    val ineqs = parsed.flatten.filter(_._2 != "=")
    val raIneqs = ineqs.filter(t => isRa(t._1) ^ isRa(t._3))
    if (ineqs.size != 1 || raIneqs.size != 1) return s
    // every equality that touches the right alias must LINK left↔right:
    // a right-only equality (r.a = r.b) would otherwise become a bogus
    // extra PARTITION BY key, making each (a,b)-partition's latest row
    // pass its own containment bound → silent duplicate matches
    // (DuckDB returns one row for that shape). Untouched = loud.
    if (parsed.flatten.exists(t =>
        t._2 == "=" && isRa(t._1) && isRa(t._3))) return s
    val (a, op, b) = raIneqs.head
    // normalize to (left-side expr, comparator, right ts column):
    // backward = pick the LATEST right ts ≤(<) the left ts
    val (lExpr, rTs, backward, strict) =
      if (isRa(a)) (b, a, op == "<=" || op == "<", op == "<" || op == ">")
      else (a, b, op == ">=" || op == ">", op == "<" || op == ">")
    val rTsName = rTs.stripPrefix(ra + ".")
    val rKeys = parsed.flatten.filter(_._2 == "=")
      .flatMap(t => Seq(t._1, t._3).filter(isRa))
      .map(_.stripPrefix(ra + "."))
    val fn = if (backward) "lead" else "lag"
    val part =
      if (rKeys.isEmpty) "" else s"PARTITION BY ${rKeys.mkString(", ")} "
    // interval bound comparator: the left ts must fall short of (or at)
    // the neighbouring right ts, else a LATER right row owns it
    val endCmp = (backward, strict) match {
      case (true, false) => "<"   // [ts, next)
      case (true, true)  => "<="  // (ts, next]
      case (false, false) => ">"  // (prev, ts]
      case (false, true)  => ">=" // [prev, ts)
    }
    val leftKw = if (m.group(1) != null || m.group(2) != null) "LEFT " else ""
    val sub = s"(SELECT *, $fn($rTsName) OVER (${part}ORDER BY $rTsName) " +
      s"AS __asof_end FROM $table WHERE $rTsName IS NOT NULL) AS $ra"
    val repl = s"${leftKw}JOIN $sub ON $conds AND " +
      s"($ra.__asof_end IS NULL OR $lExpr $endCmp $ra.__asof_end)"
    // no trailing separator when the ON conditions end the statement —
    // a dangling space would make translate non-idempotent
    val rest = s.substring(condsStart + endRel)
    val sep = if (rest.isEmpty) "" else " "
    rewriteAsofJoin(s.substring(0, m.start()) + repl + sep + rest)
  }

  /** Split on top-level ANDs (outside parens and string literals). */
  private def splitTopLevelAnd(s: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer[String]()
    var i = 0; var start = 0; var depth = 0; var q = false
    while (i < s.length) {
      val c = s.charAt(i)
      if (q) { if (c == '\'') q = false; i += 1 }
      else if (c == '\'') { q = true; i += 1 }
      else if (c == '(') { depth += 1; i += 1 }
      else if (c == ')') { depth -= 1; i += 1 }
      else if (depth == 0 && i + 3 <= s.length &&
          s.regionMatches(true, i, "AND", 0, 3) &&
          (i == 0 || !Character.isLetterOrDigit(s.charAt(i - 1)) && s.charAt(i - 1) != '_') &&
          (i + 3 == s.length || !Character.isLetterOrDigit(s.charAt(i + 3)) && s.charAt(i + 3) != '_')) {
        out += s.substring(start, i); i += 3; start = i
      } else i += 1
    }
    out += s.substring(start)
    out.toSeq
  }

  private def rewriteCorrelatedLimit1Join(s: String): String = {
    val pat =
      """(?is)LEFT\s+JOIN\s*\(\s*SELECT\s+\*\s+FROM\s+(\w+)\s+WHERE\s+(\w+)\.(\w+)\s*=\s*([\w\.]+)\s*LIMIT\s+1\s*\)\s*AS\s+(\w+)""".r
    pat.replaceAllIn(s, m => {
      val (dim, keyCol, alias) = (m.group(1), m.group(3), m.group(5))
      java.util.regex.Matcher.quoteReplacement(
        s"""LEFT JOIN (SELECT * FROM (SELECT *, row_number() OVER (PARTITION BY $keyCol ORDER BY monotonically_increasing_id()) AS __rn FROM $dim) WHERE __rn = 1) AS $alias""")
    })
  }

  // ---- statement-level parsing ------------------------------------

  sealed trait SetClause { def col: String }
  final case class Additive(col: String) extends SetClause
  final case class Replace(col: String) extends SetClause
  /** `col = <expr>` with no EXCLUDED reference (e.g. `updated_at =
    * now()` in kafka.motherduck.idempotent.yml) — the expression is
    * evaluated on the merged row. */
  final case class Assign(col: String, exprSql: String) extends SetClause

  final case class UpsertSpec(
      table: String, selectSql: String, conflictKeys: Seq[String],
      sets: Seq[SetClause], insertColumns: Seq[String] = Seq())

  private def unquoteIdent(s: String): String =
    s.trim.stripPrefix("\"").stripSuffix("\"")

  /** `INSERT INTO [db.]t [BY NAME] [(cols)] SELECT ... ON CONFLICT
    * (k,...) DO UPDATE SET c = c + EXCLUDED.c, …`
    * (tumbling.window.yml:48-58, kafka.motherduck.idempotent.yml). */
  def parseUpsert(sql: String): Option[UpsertSpec] = {
    val pat =
      """(?is)^\s*INSERT\s+INTO\s+([\w\.]+)\s+(?:BY\s+NAME\s+)?(?:\(([^)]*)\)\s*)?(SELECT.+?)\s*ON\s+CONFLICT\s*\(([^)]*)\)\s*DO\s+UPDATE\s+SET\s+(.+?)\s*;?\s*$""".r
    sql match {
      case pat(table, insertCols, select, keys, sets) =>
        val setClauses = splitTopLevelCommas(sets).map(_.trim).filter(_.nonEmpty).map { c =>
          val add = """(?i)("?[\w]+"?)\s*=\s*("?[\w]+"?)\s*\+\s*EXCLUDED\.("?[\w]+"?)""".r
          val rep = """(?i)("?[\w]+"?)\s*=\s*EXCLUDED\.("?[\w]+"?)""".r
          val asg = """(?is)("?[\w]+"?)\s*=\s*(.+)""".r
          c match {
            case add(col, c2, c3)
                if unquoteIdent(col) == unquoteIdent(c2) &&
                  unquoteIdent(col) == unquoteIdent(c3) =>
              Additive(unquoteIdent(col))
            case rep(col, c2) if unquoteIdent(col) == unquoteIdent(c2) =>
              Replace(unquoteIdent(col))
            case asg(col, e) => Assign(unquoteIdent(col), e.trim)
            case other => throw new IllegalArgumentException(
              s"unsupported ON CONFLICT SET clause: $other")
          }
        }
        Some(UpsertSpec(table, select.trim,
          keys.split(",").toSeq.map(k => unquoteIdent(k)).filter(_.nonEmpty),
          setClauses,
          Option(insertCols).map(_.split(",").toSeq.map(unquoteIdent)
            .filter(_.nonEmpty)).getOrElse(Seq())))
      case _ => None
    }
  }

  /** DuckDB `QUALIFY <pred>` (filter on window-function results without
    * a subquery) → standard SQL Spark parses. Two forms:
    *  - pred references a SELECT-list alias (`QUALIFY rk = 1`): wrap
    *    the select in a subquery and filter outside, where the alias is
    *    a real column.
    *  - pred contains an inline window function (`QUALIFY row_number()
    *    OVER (...) = 1`): windows cannot go in WHERE, so the predicate
    *    is materialized as a lateral-alias column inside the select and
    *    filtered + dropped outside.
    * Applied recursively to parenthesized subqueries/CTE bodies; the
    * trailing top-level ORDER BY / LIMIT stay outside the wrap. */
  /** Applies `topLevel` to `s` after recursively applying this same
    * transformation inside every parenthesized group (CTE bodies,
    * subqueries), quote-aware. */
  private def recurseParens(s: String)(topLevel: String => String): String = {
    val sb = new StringBuilder
    var i = 0; var q = false
    while (i < s.length) {
      val c = s.charAt(i)
      if (q) { sb.append(c); if (c == '\'') q = false; i += 1 }
      else if (c == '\'') { sb.append(c); q = true; i += 1 }
      else if (c == '(') {
        var depth = 1; var j = i + 1; var qq = false
        while (j < s.length && depth > 0) {
          val cj = s.charAt(j)
          if (qq) { if (cj == '\'') qq = false }
          else if (cj == '\'') qq = true
          else if (cj == '(') depth += 1
          else if (cj == ')') depth -= 1
          j += 1
        }
        val inner = s.substring(i + 1, j - 1)
        sb.append('(').append(recurseParens(inner)(topLevel)).append(')')
        i = j
      } else { sb.append(c); i += 1 }
    }
    topLevel(sb.toString)
  }

  private def rewriteQualify(s: String): String =
    recurseParens(s)(qualifyTopLevel)

  /** Quote-aware index of the ')' balancing the '(' at `open`. */
  private def balancedClose(s: String, open: Int): Int = {
    var depth = 0; var i = open; var q = false
    while (i < s.length) {
      val c = s.charAt(i)
      if (q) { if (c == '\'') q = false }
      else if (c == '\'') q = true
      else if (c == '(') depth += 1
      else if (c == ')') { depth -= 1; if (depth == 0) return i }
      i += 1
    }
    -1
  }

  /** DuckDB `count(DISTINCT e) OVER w` — Spark rejects DISTINCT in
    * window aggregates outright — becomes `size(collect_set(e) OVER
    * w)`: collect_set IS the distinct state per frame, so the
    * semantics (including running ROWS frames) match exactly; NULLs
    * are excluded by both, matching count(DISTINCT)'s contract. Only
    * COUNT is transposed: sum/avg DISTINCT OVER have no
    * set-arithmetic equivalent with portable types, and Spark's
    * analysis error on those is the honest failure mode. Plain
    * (non-window) count(DISTINCT …) is left alone — Spark handles it.
    * Cost note: the rewrite carries the frame's distinct SET per row,
    * the same state DuckDB maintains internally for the construct. */
  /** Is position `pos` inside a single-quoted string literal? Parity
    * of quote chars before it — the same toggle balancedClose uses,
    * under which the '' escape (two toggles) nets out correctly. */
  private def insideQuote(s: String, pos: Int): Boolean = {
    var q = false; var i = 0
    while (i < pos) { if (s.charAt(i) == '\'') q = !q; i += 1 }
    q
  }

  private def rewriteDistinctWindowCount(s: String): String = {
    val re = "(?is)\\bcount\\s*\\(\\s*distinct\\s".r
    re.findAllMatchIn(s).toList.reverse.foldLeft(s) { (acc, m) =>
      val open = acc.indexOf('(', m.start)
      val close = balancedClose(acc, open)
      // skip matches sitting inside a string literal — the scan regex
      // itself is not quote-aware
      if (close < 0 || insideQuote(acc, m.start)) acc
      else {
        val expr = acc.substring(open + 1, close).trim
          .replaceFirst("(?is)^distinct\\s+", "")
        var j = close + 1
        while (j < acc.length && acc.charAt(j).isWhitespace) j += 1
        // the token must be exactly OVER (word boundary after it):
        // `count(DISTINCT x) overall` is a bare ALIAS named
        // "overall", not a window reference
        if (j + 4 > acc.length ||
            !acc.substring(j, j + 4).equalsIgnoreCase("over") ||
            (j + 4 < acc.length && {
              val c = acc.charAt(j + 4)
              c.isLetterOrDigit || c == '_'
            })) acc
        else {
          var k = j + 4
          while (k < acc.length && acc.charAt(k).isWhitespace) k += 1
          val winEnd =
            if (k < acc.length && acc.charAt(k) == '(') {
              val wc = balancedClose(acc, k)
              require(wc > 0, s"unbalanced OVER parens in: $acc")
              wc + 1
            } else {
              var e = k
              while (e < acc.length &&
                (acc.charAt(e).isLetterOrDigit || acc.charAt(e) == '_')) e += 1
              e
            }
          val win = acc.substring(k, winEnd)
          acc.substring(0, m.start) +
            s"size(collect_set($expr) OVER $win)" +
            acc.substring(winEnd)
        }
      }
    }
  }

  /** DuckDB/Postgres `SELECT DISTINCT ON (k, …) cols FROM … ORDER BY
    * k, o` (keep the first row per key group under the query ordering)
    * → row_number window + filter. The ORDER BY both selects the kept
    * row (window order) and orders the final result (kept outside);
    * without one the kept row is arbitrary on both engines — the
    * partition keys order the window for determinism.
    *
    * Anchored on the first TOP-LEVEL `SELECT` (not `^SELECT`), so a
    * `WITH … SELECT DISTINCT ON (…)` statement rewrites too — the CTE
    * bodies are parenthesized, handled by the recurseParens descent,
    * and the prologue is re-attached verbatim. */
  private def rewriteDistinctOn(s: String): String =
    recurseParens(s) { full =>
      val si = findTopLevelKeyword(full, "SELECT")
      if (si < 0) full
      else rewriteDistinctOnAt(full, si)
    }

  private def rewriteDistinctOnAt(full: String, si: Int): String = {
    val prologue = full.substring(0, si)
    val top = full.substring(si)
    val m = "(?is)^\\s*SELECT\\s+DISTINCT\\s+ON\\s*\\(".r
      .findFirstMatchIn(top).orNull
    if (m == null) full
    else {
        val open = m.end - 1
        var depth = 0; var i = open; var q = false; var close = -1
        while (i < top.length && close < 0) {
          val c = top.charAt(i)
          if (q) { if (c == '\'') q = false }
          else if (c == '\'') q = true
          else if (c == '(') depth += 1
          else if (c == ')') { depth -= 1; if (depth == 0) close = i }
          i += 1
        }
        require(close > 0, s"unbalanced DISTINCT ON parens in: $top")
        val keys = top.substring(open + 1, close).trim
        val rest = top.substring(close + 1)
        val oi = findTopLevelKeyword(rest, "ORDER")
        val li = findTopLevelKeyword(rest, "LIMIT")
        val bodyEnd = Seq(oi, li).filter(_ >= 0).sorted.headOption.getOrElse(rest.length)
        val selectList = rest.substring(0, bodyEnd)
        val orderSpec =
          if (oi >= 0) {
            val afterOrder = rest.substring(oi)
            val end = findTopLevelKeyword(afterOrder, "LIMIT")
            (if (end >= 0) afterOrder.substring(0, end) else afterOrder)
              .replaceFirst("(?is)^ORDER\\s+BY", "").trim
          } else keys
        val tail = if (oi >= 0 || li >= 0) " " + rest.substring(bodyEnd).trim else ""
        val fi = findTopLevelKeyword(selectList, "FROM")
        require(fi > 0, s"DISTINCT ON rewrite: no top-level FROM in: $selectList")
        val sel = selectList.substring(0, fi).trim
        val from = selectList.substring(fi).trim
        prologue + s"SELECT * EXCEPT (__graft_rn) FROM (SELECT $sel, " +
          s"row_number() OVER (PARTITION BY $keys ORDER BY $orderSpec) AS __graft_rn " +
          s"$from) WHERE __graft_rn = 1$tail"
    }
  }

  /** Rename every call-site `from(` → `to(` outside single-quoted
    * string literals (case-insensitive, word-boundary). */
  private def renameFunctionCall(s: String, from: String, to: String): String = {
    val sb = new StringBuilder
    var i = 0; var q = false
    val n = from.length
    while (i < s.length) {
      val c = s.charAt(i)
      if (q) { sb.append(c); if (c == '\'') q = false; i += 1 }
      else if (c == '\'') { sb.append(c); q = true; i += 1 }
      else if (s.regionMatches(true, i, from, 0, n) &&
          (i == 0 || !Character.isLetterOrDigit(s.charAt(i - 1)) && s.charAt(i - 1) != '_') && {
            var j = i + n
            while (j < s.length && Character.isWhitespace(s.charAt(j))) j += 1
            j < s.length && s.charAt(j) == '('
          }) {
        sb.append(to); i += n
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** First top-level (paren-depth-0, outside string literals) position
    * of word `kw` in `s` at or after `from`, or -1. */
  private def findTopLevelKeyword(s: String, kw: String, from: Int = 0): Int = {
    var i = 0; var q = false; var depth = 0
    val n = kw.length
    while (i < s.length) {
      val c = s.charAt(i)
      if (q) { if (c == '\'') q = false }
      else if (c == '\'') q = true
      else if (c == '(') depth += 1
      else if (c == ')') depth -= 1
      else if (i >= from && depth == 0 && i + n <= s.length &&
          s.regionMatches(true, i, kw, 0, n) &&
          (i == 0 || !Character.isLetterOrDigit(s.charAt(i - 1)) && s.charAt(i - 1) != '_') &&
          (i + n == s.length || !Character.isLetterOrDigit(s.charAt(i + n)) && s.charAt(i + n) != '_'))
        return i
      i += 1
    }
    -1
  }

  private def qualifyTopLevel(s: String): String = {
    val qi = findTopLevelKeyword(s, "QUALIFY")
    if (qi < 0) return s
    val head = s.substring(0, qi).trim
    val rest = s.substring(qi + "QUALIFY".length)
    val cut = Seq(findTopLevelKeyword(rest, "ORDER"), findTopLevelKeyword(rest, "LIMIT"))
      .filter(_ >= 0).sorted.headOption.getOrElse(rest.length)
    val pred = rest.substring(0, cut).trim
    val tail = if (cut < rest.length) " " + rest.substring(cut).trim else ""
    if ("(?is).*\\bover\\s*\\(.*".r.matches(pred)) {
      val fi = findTopLevelKeyword(head, "FROM")
      require(fi > 0, s"QUALIFY rewrite: no top-level FROM in: $head")
      val sel = head.substring(0, fi).trim
      val from = head.substring(fi)
      s"SELECT * EXCEPT (__graft_qualify) FROM ($sel, ($pred) AS __graft_qualify $from) WHERE __graft_qualify$tail"
    } else
      s"SELECT * FROM ($head) WHERE $pred$tail"
  }

  private def splitTopLevelCommas(s: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer[String]()
    var depth = 0; var q = false; var start = 0
    for (i <- 0 until s.length) {
      val c = s.charAt(i)
      if (q) { if (c == '\'') q = false }
      else c match {
        case '\'' => q = true
        case '(' | '[' => depth += 1
        case ')' | ']' => depth -= 1
        case ',' if depth == 0 => out += s.substring(start, i); start = i + 1
        case _ =>
      }
    }
    out += s.substring(start)
    out.toSeq
  }

  final case class DeleteSpec(table: String, whereSql: String)

  def parseDelete(sql: String): Option[DeleteSpec] = {
    val pat = """(?is)^\s*DELETE\s+FROM\s+(\w+)\s+WHERE\s+(.+?)\s*;?\s*$""".r
    sql match {
      case pat(table, where) => Some(DeleteSpec(table, translate(where)))
      case _ => None
    }
  }

  /** Inline table functions (`read_csv_auto('p', ...)`, `read_csv(...)`,
    * `read_json_auto(...)`) — SURVEY §2B "Scans". The invoke layer
    * registers a temp view per call and substitutes its name. */
  final case class TableFnRef(fullText: String, kind: String, path: String)

  def findTableFunctions(sql: String): Seq[TableFnRef] = {
    val pat = """(?i)(read_csv_auto|read_csv|read_json_auto)\s*\(\s*'([^']+)'[^)]*\)""".r
    pat.findAllMatchIn(sql).map { m =>
      TableFnRef(m.matched, m.group(1).toLowerCase, m.group(2))
    }.toSeq
  }
}
