package graft.tools

/** Mechanical DuckDB→Spark SQL dialect shim for the second-engine
  * oracle leg (dev tooling; never part of the engine).
  *
  * The oracles in `SparkEntry.oracleSql` are authored for DuckDB (the
  * driver's gate). [[OracleCrossCheck]] replays them through Spark SQL
  * as an independent second EXECUTED engine; through round 13 only the
  * dialect-portable ~23% parsed. The blockers the crosscheck
  * enumerated are mechanical (`HUGEINT`, bare `VARCHAR`, `//`,
  * `epoch_us`, `time_bucket`, list functions, 1-based `[i]` indexing,
  * `QUALIFY`, `generate_series` table functions, ordered aggregates) —
  * this shim rewrites exactly those, leaving the DuckDB leg untouched
  * and leaving anything it cannot faithfully rewrite alone so the
  * replay still reports it UNSUPPORTED instead of silently changing
  * semantics.
  *
  * Faithfulness notes (where the two dialects' semantics could
  * diverge, and why the rewrite holds on the oracle corpus):
  *  - `x[i]` → `try_element_at(x, i)`: both 1-based; DuckDB returns
  *    NULL out of range, so the `try_` variant (not ANSI
  *    `element_at`, which raises) is the faithful map.
  *  - `time_bucket(INTERVAL w, ts)`: DuckDB's default origin is
  *    2000-01-01, which is a whole multiple of every sub-month width
  *    the oracles use (minutes/hours/days all divide 946684800 s), so
  *    epoch-aligned flooring is identical; month widths map to
  *    `date_trunc`. Pre-1970 timestamps would floor differently
  *    (`div` truncates toward zero) — the fixtures are 2024+.
  *  - `list(x ORDER BY k)` / `string_agg(x, sep ORDER BY k)`: Spark
  *    aggregates cannot order, so sort an array of (key, value)
  *    structs and project the value — exact for orderable keys.
  *  - `list_inner_product`: DuckDB folds left-to-right; `aggregate`
  *    over `zip_with` folds left-to-right — bit-identical when the
  *    oracle pre-casts to DOUBLE (the repo's oracle discipline).
  *  - `generate_series`/`sequence`: both ends inclusive in both
  *    dialects, including timestamp+interval stepping.
  *  - Multiple `unnest`s in one select list ZIP in DuckDB; Spark
  *    allows one generator per select, so those rewrites fail
  *    analysis loudly (UNSUPPORTED) rather than cross-joining.
  */
object DuckDialect {

  /** `widenSums = true` additionally maps every `sum(x)` to
    * `sum(CAST(x AS DECIMAL(38,0)))` — DuckDB's own aggregate typing
    * (sum over BIGINT returns HUGEINT, so downstream products like
    * `sx * sx` never overflow). NOT applied by default: decimal
    * division/rendering semantics would disturb queries that are
    * fine in 64-bit — callers reach for it only when the plain shim
    * replay dies of ARITHMETIC_OVERFLOW (the [[OracleCrossCheck]]
    * overflow tier).
    */
  def toSpark(sql: String, widenSums: Boolean): String = {
    if (!widenSums) toSpark(sql)
    else {
      var s = toSpark(sql)
      s = rewriteCall(s, "sum", 1)(a => s"sum__wide(CAST(${a(0)} AS DECIMAL(38,0)))")
      s.replace("sum__wide(", "sum(")
    }
  }

  def toSpark(sql: String): String = {
    // Hex-cast reinterpretation: a query that SHIFTS the 64-bit hash
    // needs the signed bit pattern (bit tests are sign-agnostic); one
    // that does modular arithmetic needs the unsigned VALUE (decimal).
    val hexSigned = sql.contains(">>")
    var s = sql
    s = rewriteZippedUnnest(s)
    s = rewriteSubscriptZip(s)
    s = rewriteFromGenerateSeries(s)
    s = rewriteAsof(s)
    s = rewriteQualify(s)
    s = fixpoint(s) { t =>
      var u = t
      u = rewriteTimeBucket(u)
      u = rewriteCall(u, "list_slice", 3) { a =>
        s"slice(${a(0)}, ${a(1)}, (${a(2)}) - (${a(1)}) + 1)"
      }
      u = rewriteCall(u, "list_inner_product", 2)(a => innerProduct(a(0), a(1)))
      u = rewriteCall(u, "list_cosine_similarity", 2) { a =>
        s"(${innerProduct(a(0), a(1))} / sqrt(${innerProduct(a(0), a(0))} * ${innerProduct(a(1), a(1))}))"
      }
      u = rewriteCall(u, "list_position", 2) { a =>
        s"nullif(array_position(${a(0)}, ${a(1)}), 0)"
      }
      u = rewriteCall(u, "isfinite", 1) { a =>
        s"(NOT isnan(${a(0)}) AND abs(${a(0)}) <> CAST('Infinity' AS DOUBLE))"
      }
      u = rewriteCall(u, "regexp_extract_all", 2) { a =>
        // DuckDB defaults to group 0 (whole match); Spark to group 1
        s"regexp_extract_all__2(${a(0)}, ${a(1)}, 0)"
      }
      u = rewriteCall(u, "regexp_extract", 2) { a =>
        // same default-group divergence as regexp_extract_all — and on
        // a group-less pattern Spark's default idx=1 is a runtime
        // error, not just a different answer
        s"regexp_extract(${a(0)}, ${a(1)}, 0)"
      }
      Seq("date_diff", "datediff").foreach { dd =>
        u = rewriteCall(u, dd, 3) { a =>
          val unit = a(0).trim.stripPrefix("'").stripSuffix("'").toLowerCase
          if (unit == "day")
            // DuckDB date_diff counts day-BOUNDARY crossings = calendar diff
            s"datediff(CAST(${a(2)} AS DATE), CAST(${a(1)} AS DATE))"
          else s"$dd(${a.mkString(", ")})" // unhandled unit: leave
        }
      }
      u = rewriteCall(u, "regexp_replace", 4) { a =>
        // DuckDB's 4th arg is a flag; 'g' = global, which is Spark's
        // (only) behavior — Spark's 4th arg is a position instead
        if (a(3).trim == "'g'") s"regexp_replace(${a(0)}, ${a(1)}, ${a(2)})"
        else s"regexp_replace(${a.mkString(", ")})"
      }
      u = rewriteCall(u, "list_aggregate", 2) { a =>
        a(1).trim.stripPrefix("'").stripSuffix("'").toLowerCase match {
          case "sum" => s"aggregate(${a(0)}, CAST(0 AS BIGINT), (__acc, __x) -> __acc + __x)"
          case "min" => s"array_min(${a(0)})"
          case "max" => s"array_max(${a(0)})"
          case _ => s"list_aggregate(${a(0)}, ${a(1)})"
        }
      }
      u = rewriteIndexedLambda(u)
      u = rewriteCall(u, "list_prepend", 2)(a => s"concat(array(${a(0)}), ${a(1)})")
      u = rewriteCall(u, "list_reduce", 2) { a =>
        // DuckDB seeds the fold with the FIRST element. On a HUGEINT
        // list (mapped to DECIMAL(38,0)) Spark's reduce needs the
        // accumulator and merge-result types pinned — wrap both.
        val lam = """(?s)^\(\s*(\w+)\s*,\s*(\w+)\s*\)\s*->\s*(.+)$""".r
        a(1).trim match {
          case lam(x, y, body) if sql.contains("HUGEINT") =>
            s"reduce(slice(${a(0)}, 2, greatest(size(${a(0)}) - 1, 0)), " +
              s"CAST(try_element_at(${a(0)}, 1) AS DECIMAL(38,0)), " +
              s"($x, $y) -> CAST(($body) AS DECIMAL(38,0)))"
          case _ =>
            s"reduce(slice(${a(0)}, 2, greatest(size(${a(0)}) - 1, 0)), " +
              s"try_element_at(${a(0)}, 1), ${a(1)})"
        }
      }
      u = rewriteStructPack(u)
      u = rewriteScalarSeries(u)
      u = rewriteIgnoreNulls(u)
      u = rewriteBitShift(u)
      // projected correlated EXISTS trips a Spark analyzer bug under a
      // UNION ALL outer ("key not found: text#N") — and so does the
      // correlated scalar count (r14's first rewrite; same
      // decorrelation path). For the single-equality correlation
      // `EXISTS (SELECT 1 FROM t a WHERE a.c = b.c)` the faithful
      // Spark spelling is a null-safe IN: `coalesce(b.c IN (SELECT c
      // FROM t), false)` — IN yields NULL exactly where EXISTS yields
      // FALSE (outer NULL, or an inner NULL with no match), so the
      // coalesce restores EXISTS's two-valued result, and Spark
      // decorrelates the uncorrelated IN-list fine. Other EXISTS
      // shapes keep the scalar-count rewrite (good in WHERE position).
      u = rewriteCallRaw(u, "EXISTS") { inner =>
        val oneEq =
          """(?is)^\s*SELECT\s+(?:1|\*)\s+FROM\s+(\w+)\s+(\w+)\s+WHERE\s+(\w+)\.(\w+)\s*=\s*(\w+)\.(\w+)\s*$""".r
        val m = """(?is)^\s*SELECT\s+(?:1|\*)\s+(FROM\s.+)$""".r
        inner match {
          case oneEq(tbl, al, q1, c1, q2, c2) if (q1 == al) != (q2 == al) =>
            val (innerCol, outerRef) =
              if (q1 == al) (c1, s"$q2.$c2") else (c2, s"$q1.$c1")
            Some(s"coalesce($outerRef IN (SELECT $innerCol FROM $tbl), false)")
          case m(rest) if balanced(rest) => Some(s"((SELECT count(1) $rest) > 0)")
          case _ => None
        }
      }
      u = rewriteOrderedAgg(u)
      u = rewriteWindowList(u)
      u = rewriteCall(u, "list_sum", 1) { a =>
        s"aggregate(${a(0)}, CAST(0 AS BIGINT), (__acc, __x) -> __acc + __x)"
      }
      u = rewriteCall(u, "xor", 2)(a => s"(${a(0)} ^ ${a(1)})")
      u = rewriteCall(u, "encode", 1)(a => s"encode(${a(0)}, 'UTF-8')")
      u = rewriteCall(u, "grouping", 2)(a => s"grouping_id(${a(0)}, ${a(1)})")
      u = rewriteCall(u, "to_hex", 1)(a => s"lower(hex(${a(0)}))")
      // DuckDB dayofweek: 0=Sunday..6; Spark: 1=Sunday..7
      u = rewriteCall(u, "dayofweek", 1)(a => s"(dayofweek__spark(${a(0)}) - 1)")
      u = rewriteCall(u, "json_extract", 2)(a => s"get_json_object(${a(0)}, ${a(1)})")
      u = rewriteCall(u, "array_to_string", 2)(a => s"array_join(${a(0)}, ${a(1)})")
      u = rewriteCall(u, "generate_subscripts", 2) { a =>
        s"explode(sequence(1, size(${a(0)})))"
      }
      u = rewriteCall(u, "strftime", 2) { a =>
        val fmt = a(1).trim
        if (fmt.startsWith("'") && fmt.endsWith("'")) {
          val mapped = fmt.stripPrefix("'").stripSuffix("'")
            .replace("%Y", "yyyy").replace("%m", "MM").replace("%d", "dd")
            .replace("%H", "HH").replace("%M", "mm").replace("%S", "ss")
          s"date_format(${a(0)}, '$mapped')"
        } else s"strftime(${a(0)}, ${a(1)})"
      }
      u = rewriteHexCast(u, hexSigned)
      // FLOAT/FLOAT division: DuckDB computes AND RENDERS in single
      // precision; Spark promotes the quotient to DOUBLE, so a
      // VARCHAR cast prints double digits ("0.4235294117647059" vs
      // "0.42352942"). Round the quotient back to FLOAT before the
      // string cast. (Double-then-round differs from direct single
      // division only in double-rounding corner cases no byte/255
      // feature hits.)
      u = rewriteCallRaw(u, "CAST") { inner =>
        val m = """(?is)^(.+)\s+AS\s+VARCHAR\s*$""".r
        inner match {
          case m(exprPart) =>
            val slash = {
              var depth = 0
              var found = -1
              var i = 0
              while (i < exprPart.length && found < 0) {
                exprPart.charAt(i) match {
                  case '\'' | '"' => i = skipQuoted(exprPart, i) - 1
                  case '(' | '[' => depth += 1
                  case ')' | ']' => depth -= 1
                  case '/' if depth == 0 => found = i
                  case _ =>
                }
                i += 1
              }
              found
            }
            val floatCast = """(?is)^CAST\s*\(.+AS\s+FLOAT\s*\)$""".r
            if (slash > 0 &&
                floatCast.findFirstIn(exprPart.substring(0, slash).trim).isDefined &&
                floatCast.findFirstIn(exprPart.substring(slash + 1).trim).isDefined)
              Some(s"CAST(CAST($exprPart AS FLOAT) AS VARCHAR)")
            else None
          case _ => None
        }
      }
      u
    }
    s = s.replace("regexp_extract_all__2(", "regexp_extract_all(")
      .replace("dayofweek__spark(", "dayofweek(")
    s = rewriteBrackets(s)
    s = rewriteWords(s)
    // In a HUGEINT statement, `ident // literal` floor-divides a value
    // that lives in DECIMAL(38,0) 2^64-space (the HUGEINT mapping):
    // Spark's `div` (IntegralDivide) returns BIGINT, silently wrapping
    // the ≥2^63 half of that space to negative — the byte-extraction
    // `u // 2^k % 256` then gets the SIGNED residue. Exact decimal
    // form: (X - X%Y)/Y is an integer, so the division rounds to
    // nothing. Simple ident//literal only; parenthesized int `//`
    // (UBIGINT-space grids) keeps the `div` mapping below.
    if (sql.contains("HUGEINT"))
      s = mapUnquoted(s)(_.replaceAll(
        """(\w+)\s*//\s*(\d+)""",
        "CAST((($1) - (($1) % ($2))) / ($2) AS DECIMAL(38,0))"))
    s = rewriteIntDiv(s)
    s = mapUnquoted(s) { seg =>
      // bare ANTI/SEMI JOIN: Spark parses `a ANTI JOIN b` as table a
      // aliased ANTI inner-joined to b — silently INVERTING the filter
      seg.replaceAll("(?i)(?<!LEFT )\\bANTI\\s+JOIN\\b", "LEFT ANTI JOIN")
        .replaceAll("(?i)(?<!LEFT )\\bSEMI\\s+JOIN\\b", "LEFT SEMI JOIN")
        // the all-ones UBIGINT mask (already UBIGINT→BIGINT-mapped by
        // now): same 64-bit pattern as signed -1, and the literal
        // itself overflows BIGINT under ANSI
        .replace("CAST(18446744073709551615 AS BIGINT)", "CAST(-1 AS BIGINT)")
    }
    s = doubleBackslashes(s)
    s
  }

  /** Apply `f` to the non-quoted segments of `s` only. */
  private def mapUnquoted(s0: String)(f: String => String): String = {
    val out = new StringBuilder
    var i = 0
    var segStart = 0
    while (i < s0.length) {
      s0.charAt(i) match {
        case '\'' | '"' =>
          out.append(f(s0.substring(segStart, i)))
          val j = skipQuoted(s0, i)
          out.append(s0.substring(i, j))
          i = j; segStart = j
        case _ => i += 1
      }
    }
    out.append(f(s0.substring(segStart)))
    out.toString
  }

  /** DuckDB string literals are escape-free (a backslash is a
    * backslash); Spark's parser processes backslash escapes. Double
    * every backslash inside single-quoted literals so regexes like
    * '[^A-Za-z0-9\s]' survive the replay (unescaped, Spark reads that
    * literal as '[^A-Za-z0-9s]' — silently wrong tokenization).
    */
  private def doubleBackslashes(s0: String): String = {
    val out = new StringBuilder
    var i = 0
    while (i < s0.length) {
      val c = s0.charAt(i)
      if (c == '\'' || c == '"') {
        val j = skipQuoted(s0, i)
        val lit = s0.substring(i, j)
        out.append(if (c == '\'') lit.replace("\\", "\\\\") else lit)
        i = j
      } else { out.append(c); i += 1 }
    }
    out.toString
  }

  private def innerProduct(a: String, b: String): String =
    s"aggregate(zip_with($a, $b, (__x, __y) -> CAST(__x AS DOUBLE) * CAST(__y AS DOUBLE)), " +
      "CAST(0 AS DOUBLE), (__acc, __v) -> __acc + __v)"

  private def fixpoint(s0: String)(f: String => String): String = {
    var s = s0
    var i = 0
    while (i < 20) {
      val n = f(s)
      if (n == s) return s
      s = n; i += 1
    }
    s
  }

  // ---- scanning utilities (single-quote strings with '' escapes,
  // ---- double-quoted identifiers) --------------------------------

  private[tools] def isIdent(c: Char): Boolean = c.isLetterOrDigit || c == '_'

  /** Index just past a string/quoted-identifier literal starting at i. */
  private[tools] def skipQuoted(s: String, i: Int): Int = {
    val q = s.charAt(i)
    var j = i + 1
    while (j < s.length) {
      if (s.charAt(j) == q) {
        if (q == '\'' && j + 1 < s.length && s.charAt(j + 1) == '\'') j += 2
        else return j + 1
      } else j += 1
    }
    s.length
  }

  /** Index of the ')' matching the '(' at `open` (quote-aware), or -1. */
  private[tools] def matchParen(s: String, open: Int): Int = {
    var depth = 0
    var i = open
    while (i < s.length) {
      s.charAt(i) match {
        case '\'' | '"' => i = skipQuoted(s, i) - 1
        case '(' => depth += 1
        case ')' =>
          depth -= 1
          if (depth == 0) return i
        case _ =>
      }
      i += 1
    }
    -1
  }

  /** Index of the ']' matching the '[' at `open` (quote-aware), or -1. */
  private def matchBracket(s: String, open: Int): Int = {
    var depth = 0
    var i = open
    while (i < s.length) {
      s.charAt(i) match {
        case '\'' | '"' => i = skipQuoted(s, i) - 1
        case '[' => depth += 1
        case ']' =>
          depth -= 1
          if (depth == 0) return i
        case _ =>
      }
      i += 1
    }
    -1
  }

  /** Split `s` (an argument list WITHOUT outer parens) at top-level commas. */
  private def splitArgs(s: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    var depth = 0
    var start = 0
    var i = 0
    while (i < s.length) {
      s.charAt(i) match {
        case '\'' | '"' => i = skipQuoted(s, i) - 1
        case '(' | '[' | '{' => depth += 1
        case ')' | ']' | '}' => depth -= 1
        case ',' if depth == 0 =>
          out += s.substring(start, i)
          start = i + 1
        case _ =>
      }
      i += 1
    }
    out += s.substring(start)
    out.result().map(_.trim)
  }

  /** Index of the '}' matching the '{' at `open` (quote-aware), or -1. */
  private def matchBrace(s: String, open: Int): Int = {
    var depth = 0
    var i = open
    while (i < s.length) {
      s.charAt(i) match {
        case '\'' | '"' => i = skipQuoted(s, i) - 1
        case '{' => depth += 1
        case '}' =>
          depth -= 1
          if (depth == 0) return i
        case _ =>
      }
      i += 1
    }
    -1
  }

  /** [[findWord]] restricted to nesting depth 0 of `s`. */
  private def findWordTopLevel(s: String, word: String, from: Int): Int = {
    var i = from
    val w = word.toLowerCase
    var depth = 0
    while (i < s.length) {
      s.charAt(i) match {
        case '\'' | '"' => i = skipQuoted(s, i)
        case '(' | '[' | '{' => depth += 1; i += 1
        case ')' | ']' | '}' => depth -= 1; i += 1
        case c if isIdent(c) =>
          var j = i
          while (j < s.length && isIdent(s.charAt(j))) j += 1
          if (depth == 0 && s.substring(i, j).toLowerCase == w) return i
          i = j
        case _ => i += 1
      }
    }
    -1
  }

  /** Find the next occurrence of identifier `word` at or after `from`,
    * outside quotes, as a whole word; -1 if none.
    */
  private[tools] def findWord(s: String, word: String, from: Int,
      caseInsensitive: Boolean = false): Int = {
    var i = from
    val w = if (caseInsensitive) word.toLowerCase else word
    while (i < s.length) {
      s.charAt(i) match {
        case '\'' | '"' => i = skipQuoted(s, i)
        case c if isIdent(c) =>
          var j = i
          while (j < s.length && isIdent(s.charAt(j))) j += 1
          val tok = s.substring(i, j)
          val t = if (caseInsensitive) tok.toLowerCase else tok
          if (t == w) return i
          i = j
        case _ => i += 1
      }
    }
    -1
  }

  /** Rewrite every call `name(args...)` with exactly `arity` top-level
    * args via `f` (which receives the raw arg strings).
    */
  private def rewriteCall(s0: String, name: String, arity: Int)(
      f: Seq[String] => String): String = {
    var s = s0
    var from = 0
    var guard = 0
    while (guard < 500) {
      guard += 1
      val i = findWord(s, name, from)
      if (i < 0) return s
      val open = {
        var j = i + name.length
        while (j < s.length && s.charAt(j).isWhitespace) j += 1
        if (j < s.length && s.charAt(j) == '(') j else -1
      }
      if (open < 0) { from = i + name.length }
      else {
        val close = matchParen(s, open)
        if (close < 0) return s
        val args = splitArgs(s.substring(open + 1, close))
        if (args.length == arity) {
          val rep = f(args)
          s = s.substring(0, i) + rep + s.substring(close + 1)
          from = i + rep.length
        } else from = open + 1 // descend: nested same-name calls inside the args
      }
    }
    s
  }

  // ---- structural rewrites ---------------------------------------

  /** `FROM generate_series(a, b[, step]) [AS] n(c)` (also after JOIN)
    * → `FROM (SELECT explode(sequence(a, b[, step])) AS c) AS n`;
    * same for 2-arg `range(a, b)` with DuckDB's EXCLUSIVE end.
    */
  private def rewriteFromGenerateSeries(s0: String): String = {
    var s = s0
    Seq("generate_series", "range").foreach { fn =>
      var from = 0
      var guard = 0
      var going = true
      while (going && guard < 200) {
        guard += 1
        val i = findWord(s, fn, from)
        if (i < 0) going = false
        else {
          // must be preceded by FROM or JOIN (table-function position)
          val before = s.substring(0, i).reverse.dropWhile(_.isWhitespace)
          val prevWord = before.takeWhile(isIdent).reverse.toLowerCase
          val open = {
            var j = i + fn.length
            while (j < s.length && s.charAt(j).isWhitespace) j += 1
            if (j < s.length && s.charAt(j) == '(') j else -1
          }
          if ((prevWord != "from" && prevWord != "join") || open < 0) {
            from = i + fn.length
          } else {
            val close = matchParen(s, open)
            if (close < 0) { going = false }
            else {
              val argList = splitArgs(s.substring(open + 1, close))
              val seqArgs =
                if (fn == "range" && argList.length == 2)
                  s"${argList(0)}, (${argList(1)}) - 1" // end-exclusive
                else argList.mkString(", ")
              // alias: [AS] name(col)
              val m = """\s*(?i:AS\s+)?(\w+)\s*\(\s*(\w+)\s*\)""".r
              m.findPrefixMatchOf(s.substring(close + 1)) match {
                case Some(al) if fn == "generate_series" || argList.length == 2 =>
                  val rep = s"(SELECT explode(sequence($seqArgs)) AS ${al.group(2)}) AS ${al.group(1)}"
                  s = s.substring(0, i) + rep + s.substring(close + 1 + al.end)
                  from = i + rep.length
                case _ => from = close + 1
              }
            }
          }
        }
      }
    }
    s
  }

  /** DuckDB `ASOF [LEFT] JOIN` — Spark has no ASOF syntax. The
    * canonical form `FROM L la ASOF LEFT JOIN R ra ON <eq-keys> AND
    * la.ts >= ra.ts` (or <=, either operand order) rewrites to a
    * plain join + per-left-row best-match pick:
    *
    *   FROM (SELECT *, monotonically_increasing_id() AS __lrid
    *         FROM L) la [LEFT] JOIN R ra ON <same condition>
    *   QUALIFY row_number() OVER (PARTITION BY la.__lrid
    *           ORDER BY ra.ts DESC|ASC) = 1
    *
    * — the synthetic row id identifies each left ROW (no uniqueness
    * assumption on left columns), the window keeps the single match
    * with max ts <= (backward, DESC) / min ts >= (forward, ASC), and
    * a matchless left row survives as its lone all-null join row
    * (LEFT). The QUALIFY then lowers through [[rewriteQualify]].
    * Conservative boundaries (returns input unchanged): a `SELECT *`
    * head (the row id would leak into the output), anything but a
    * single plain relation on each side, extra clauses between the ON
    * condition and the block end (a WHERE would filter match
    * CANDIDATES here but filters match RESULTS in DuckDB), or no
    * single left-vs-right timestamp inequality in the condition.
    */
  private def rewriteAsof(s0: String): String = {
    var s = s0
    var guard = 0
    while (guard < 20) {
      guard += 1
      val aPos = findWord(s, "ASOF", 0, caseInsensitive = true)
      if (aPos < 0) return s
      rewriteOneAsof(s, aPos) match {
        case Some(next) => s = next
        case None => return s0 // unsupported shape: leave the raw SQL
      }
    }
    s
  }

  /** Words that may NOT appear at depth 0 between the ASOF ON
    * condition and the block end (they would change the QUALIFY
    * placement semantics or signal a multi-join FROM).
    */
  private val AsofBail = Set("where", "group", "order", "having", "limit",
    "union", "intersect", "except", "qualify", "join", "left", "right",
    "inner", "full", "cross", "asof", "window", "offset")

  /** (relation core without alias, alias) for a simple FROM item:
    * `(subquery) [AS] a`, `name [AS] a`, or bare `name`.
    */
  private def parseRel(rel: String): Option[(String, String)] = {
    val t = rel.trim
    if (t.isEmpty) None
    else if (t.startsWith("(")) {
      val close = matchParen(t, 0)
      if (close < 0) None
      else {
        val rest = t.substring(close + 1).trim
        val alias =
          if (rest.toLowerCase.startsWith("as ")) rest.substring(3).trim
          else rest
        if (alias.nonEmpty && alias.forall(isIdent))
          Some((t.substring(0, close + 1), alias))
        else None
      }
    } else t.split("\\s+").toSeq match {
      case Seq(n) if n.forall(isIdent) => Some((n, n))
      case Seq(n, a) if n.forall(isIdent) && a.forall(isIdent) &&
        a.toLowerCase != "as" => Some((n, a))
      case Seq(n, as, a) if n.forall(isIdent) && as.equalsIgnoreCase("as") &&
        a.forall(isIdent) => Some((n, a))
      case _ => None
    }
  }

  /** Next occurrence of `word` at depth 0 of s[from..until), outside
    * quotes; -1 if none.
    */
  private[tools] def findWordAtDepth0(
      s: String, word: String, from: Int, until: Int): Int = {
    var i = from
    val w = word.toLowerCase
    var depth = 0
    while (i < until) {
      s.charAt(i) match {
        case '\'' | '"' => i = skipQuoted(s, i)
        case '(' | '[' => depth += 1; i += 1
        case ')' | ']' => depth -= 1; i += 1
        case c if isIdent(c) =>
          var j = i
          while (j < s.length && isIdent(s.charAt(j))) j += 1
          if (depth == 0 && j <= until && s.substring(i, j).toLowerCase == w)
            return i
          i = j
        case _ => i += 1
      }
    }
    -1
  }

  private def rewriteOneAsof(s: String, aPos: Int): Option[String] = {
    // enclosing block: nearest unmatched '(' before ASOF .. its ')'
    val mask = quoteMask(s)
    var depth = 0
    var i = aPos - 1
    var blockStart = 0
    while (i >= 0 && blockStart == 0) {
      if (mask(i)) { while (i >= 0 && mask(i)) i -= 1 }
      else {
        s.charAt(i) match {
          case ')' => depth += 1
          case '(' => if (depth == 0) blockStart = i + 1 else depth -= 1
          case _ =>
        }
        i -= 1
      }
    }
    var j = aPos
    var d2 = 0
    var blockEnd = s.length
    var done = false
    while (j < s.length && !done) {
      s.charAt(j) match {
        case '\'' | '"' => j = skipQuoted(s, j) - 1
        case '(' => d2 += 1
        case ')' => if (d2 == 0) { blockEnd = j; done = true } else d2 -= 1
        case _ =>
      }
      j += 1
    }
    val block = s.substring(blockStart, blockEnd)
    val aRel = aPos - blockStart
    // a SELECT * head would leak the synthetic row id into the output
    val selPos = findWordAtDepth0(block, "SELECT", 0, aRel)
    if (selPos >= 0 && block.substring(selPos + 6).trim.startsWith("*"))
      return None
    // the owning FROM: last depth-0 FROM before ASOF
    var fromPos = -1
    var f = findWordAtDepth0(block, "FROM", 0, aRel)
    while (f >= 0) { fromPos = f; f = findWordAtDepth0(block, "FROM", f + 4, aRel) }
    if (fromPos < 0) return None
    val leftRel = block.substring(fromPos + 4, aRel)
    if (findWordAtDepth0(leftRel, "JOIN", 0, leftRel.length) >= 0) return None
    val (leftCore, leftAlias) = parseRel(leftRel).getOrElse(return None)
    // ASOF [LEFT] JOIN
    var k = aRel + 4
    while (k < block.length && block.charAt(k).isWhitespace) k += 1
    var kw = { var e = k; while (e < block.length && isIdent(block.charAt(e))) e += 1
      block.substring(k, e) }
    val isLeft = kw.equalsIgnoreCase("LEFT")
    if (isLeft) {
      k += kw.length
      while (k < block.length && block.charAt(k).isWhitespace) k += 1
      val e2 = { var e = k; while (e < block.length && isIdent(block.charAt(e))) e += 1; e }
      kw = block.substring(k, e2)
    }
    if (!kw.equalsIgnoreCase("JOIN")) return None
    val joinEnd = k + kw.length
    val onPos = findWordAtDepth0(block, "ON", joinEnd, block.length)
    if (onPos < 0) return None
    val rightRel = block.substring(joinEnd, onPos)
    val (_, rightAlias) = parseRel(rightRel).getOrElse(return None)
    val cond = block.substring(onPos + 2)
    // nothing but the condition may follow (QUALIFY placement safety)
    if (AsofBail.exists(w => findWordAtDepth0(cond, w, 0, cond.length) >= 0))
      return None
    // the timestamp inequality decides direction and the pick column
    val ineq = """(\w+)\.(\w+)\s*(>=|<=)\s*(\w+)\.(\w+)""".r
    val hit = ineq.findAllMatchIn(cond).find { m =>
      m.group(1) != m.group(4) &&
        Set(m.group(1), m.group(4)) == Set(leftAlias, rightAlias)
    }.getOrElse(return None)
    val (rightTs, dir) =
      if (hit.group(1) == leftAlias)
        (hit.group(5), if (hit.group(3) == ">=") "DESC" else "ASC")
      else
        (hit.group(2), if (hit.group(3) == ">=") "ASC" else "DESC")
    val newBlock = block.substring(0, fromPos) +
      s"FROM (SELECT *, monotonically_increasing_id() AS __lrid FROM " +
      s"$leftCore) $leftAlias ${if (isLeft) "LEFT JOIN" else "JOIN"} " +
      s"${rightRel.trim} ON ${cond.trim} QUALIFY row_number() OVER " +
      s"(PARTITION BY $leftAlias.__lrid ORDER BY $rightAlias.$rightTs $dir) = 1"
    Some(s.substring(0, blockStart) + newBlock + s.substring(blockEnd))
  }

  /** `SELECT <list> FROM <mid> QUALIFY <pred>` (pred runs to the
    * enclosing unmatched ')' or end of statement) →
    * `SELECT * EXCEPT (__q) FROM (SELECT <list>, (<pred>) AS __q FROM <mid>) WHERE __q`.
    */
  private def rewriteQualify(s0: String): String = {
    var s = s0
    var guard = 0
    while (guard < 50) {
      guard += 1
      val q = findWord(s, "QUALIFY", 0, caseInsensitive = true)
      if (q < 0) return s
      val mask = quoteMask(s)
      // backward: nearest unmatched '(' before QUALIFY (literals opaque)
      var depth = 0
      var i = q - 1
      var selStart = -1
      while (i >= 0 && selStart < 0) {
        if (mask(i)) {
          while (i >= 0 && mask(i)) i -= 1
        } else {
          s.charAt(i) match {
            case ')' => depth += 1
            case '(' =>
              if (depth == 0) selStart = i + 1 else depth -= 1
            case _ =>
          }
          i -= 1
        }
      }
      val start = if (selStart < 0) 0 else selStart
      // forward: pred ends at the unmatched ')' or end of string
      var j = q + "QUALIFY".length
      var d2 = 0
      var predEnd = s.length
      var done = false
      while (j < s.length && !done) {
        s.charAt(j) match {
          case '\'' | '"' => j = skipQuoted(s, j) - 1
          case '(' => d2 += 1
          case ')' =>
            if (d2 == 0) { predEnd = j; done = true } else d2 -= 1
          case _ =>
        }
        j += 1
      }
      val head = s.substring(start, q) // [WITH ...] SELECT <list> FROM <mid>
      val pred = s.substring(q + "QUALIFY".length, predEnd).trim
      // the owning SELECT is the LAST depth-0 one in head — a WITH
      // prefix (top-level QUALIFY after CTEs) stays OUTSIDE the
      // wrapper; CTE bodies sit inside parens so they never match
      val selPos = {
        var p = -1
        var f = findWordAtDepth0(head, "SELECT", 0, head.length)
        while (f >= 0) { p = f; f = findWordAtDepth0(head, "SELECT", f + 6, head.length) }
        p
      }
      if (selPos < 0) return s // not the shape we handle
      val prefix = head.substring(0, selPos)
      val body = head.substring(selPos)
      val fromIdx = findWordAtDepth0(body, "FROM", 0, body.length)
      if (fromIdx < 0) return s // not the shape we handle
      val selList = body.substring(0, fromIdx)
        .trim.replaceFirst("(?i)^SELECT\\s+", "")
      val mid = body.substring(fromIdx + 4)
      val rep = prefix +
        s"SELECT * EXCEPT (__q) FROM (SELECT $selList, ($pred) AS __q FROM $mid) WHERE __q "
      s = s.substring(0, start) + rep + s.substring(predEnd)
    }
    s
  }

  /** `time_bucket(INTERVAL 'n unit', ts)` → epoch-aligned floor (or
    * `date_trunc` for month widths).
    */
  private def rewriteTimeBucket(s0: String): String =
    rewriteCall(s0, "time_bucket", 2) { a =>
      val iv = """(?i)INTERVAL\s*'(\d+)\s*(\w+?)s?'""".r
      a(0).trim match {
        case iv(n, unit) =>
          val base = unit.toLowerCase match {
            case "second" => 1000000L
            case "minute" => 60000000L
            case "hour"   => 3600000000L
            case "day"    => 86400000000L
            case "month"  => -1L
            case _        => 0L
          }
          if (base == -1L && n.toLong == 1L) s"date_trunc('month', ${a(1)})"
          else if (base > 0L) {
            val m = n.toLong * base
            s"timestamp_micros((unix_micros(${a(1)}) div ${m}L) * ${m}L)"
          } else s"time_bucket(${a(0)}, ${a(1)})" // unhandled width: leave
        case _ => s"time_bucket(${a(0)}, ${a(1)})"
      }
    }

  /** Like [[rewriteCall]] but passes the RAW inner text to `f`;
    * `None` means leave this call (descend into its args).
    */
  private def rewriteCallRaw(s0: String, name: String)(
      f: String => Option[String]): String = {
    var s = s0
    var from = 0
    var guard = 0
    while (guard < 300) {
      guard += 1
      val i = findWord(s, name, from)
      if (i < 0) return s
      val open = {
        var j = i + name.length
        while (j < s.length && s.charAt(j).isWhitespace) j += 1
        if (j < s.length && s.charAt(j) == '(') j else -1
      }
      if (open < 0) { from = i + name.length }
      else {
        val close = matchParen(s, open)
        if (close < 0) return s
        f(s.substring(open + 1, close)) match {
          case Some(rep) =>
            s = s.substring(0, i) + rep + s.substring(close + 1)
            from = i + rep.length
          case None => from = open + 1
        }
      }
    }
    s
  }

  /** Ordered aggregates: `list(x ORDER BY k, ...)` and
    * `string_agg(x, sep ORDER BY k, ...)` → sort an array of structs.
    */
  private def rewriteOrderedAgg(s0: String): String = {
    def orderedArray(x: String, keys: String): String = {
      val ks = splitArgs(keys).zipWithIndex
        .map { case (k, i) => s"(${stripDir(k)}) AS __k$i" }
        .mkString(", ")
      s"transform(array_sort(array_agg(struct($ks, ($x) AS __v))), __s -> __s.__v)"
    }
    // (head-before-ORDER-BY, key list) if the inner text carries a
    // top-level ORDER BY
    def headKeys(inner: String): Option[(String, String)] = {
      val ob = findWordTopLevel(inner, "order", 0)
      if (ob < 0) None
      else {
        val after = inner.substring(ob)
        val keys = after.replaceFirst("(?is)^ORDER\\s+BY\\s*", "")
        if (keys == after) None
        else Some((inner.substring(0, ob).trim, keys))
      }
    }
    var s = rewriteCallRaw(s0, "list") { inner =>
      headKeys(inner).map { case (x, keys) => orderedArray(x, keys) }
    }
    s = rewriteCallRaw(s, "string_agg") { inner =>
      headKeys(inner).flatMap { case (head, keys) =>
        splitArgs(head) match {
          case Seq(x, sep) => Some(s"array_join(${orderedArray(x, keys)}, $sep)")
          case _ => None
        }
      }
    }
    s
  }

  /** `list(x) OVER ...` (DuckDB windowed list) → `collect_list(x)
    * OVER ...` — windowed collect_list preserves frame order.
    */
  private def rewriteWindowList(s0: String): String = {
    var s = s0
    var from = 0
    var guard = 0
    while (guard < 200) {
      guard += 1
      val i = findWord(s, "list", from)
      if (i < 0) return s
      val open = {
        var j = i + 4
        while (j < s.length && s.charAt(j).isWhitespace) j += 1
        if (j < s.length && s.charAt(j) == '(') j else -1
      }
      if (open < 0) { from = i + 4 }
      else {
        val close = matchParen(s, open)
        if (close < 0) return s
        var k = close + 1
        while (k < s.length && s.charAt(k).isWhitespace) k += 1
        val isOver = s.regionMatches(true, k, "OVER", 0, 4)
        if (isOver) {
          s = s.substring(0, i) + "collect_list" + s.substring(i + 4)
          from = i + "collect_list".length
        } else from = close + 1
      }
    }
    s
  }

  /** `CAST(('0x' || X) AS UBIGINT/HUGEINT)` (DuckDB hex-string cast)
    * → `CAST(conv(X, 16, 10) AS DECIMAL(20,0))` — conv is exact to 64
    * unsigned bits, which covers the md5-prefix fingerprints the
    * oracles build this way.
    */
  /** `A << B` / `A >> B` → shiftleft/shiftright (Spark's parser has no
    * shift operators). The operands are primary expressions (identifier
    * chains, calls, parenthesized groups).
    */
  private def rewriteBitShift(s0: String): String = {
    var s = s0
    var changed = true
    var guard = 0
    while (changed && guard < 100) {
      changed = false
      guard += 1
      val mask = quoteMask(s)
      var i = 0
      while (i < s.length - 1 && !changed) {
        if (mask(i)) { i += 1 }
        else {
          val c = s.charAt(i)
          val isShift = (c == '<' || c == '>') && s.charAt(i + 1) == c &&
            (i + 2 >= s.length || s.charAt(i + 2) != c) && // not >>>
            (i == 0 || s.charAt(i - 1) != c)
          if (!isShift) { i += 1 }
          else {
            // LHS primary ends at last non-space before i
            var p = i - 1
            while (p >= 0 && s.charAt(p).isWhitespace) p -= 1
            if (p < 0) { i += 1 }
            else {
              val lStart = exprStart(s, p, mask)
              // RHS primary starts after the operator
              var r = i + 2
              while (r < s.length && s.charAt(r).isWhitespace) r += 1
              val rEnd = primaryEnd(s, r)
              if (rEnd < 0 || lStart > p) { i += 1 }
              else {
                val fn = if (c == '<') "shiftleft" else "shiftright"
                val lhs = s.substring(lStart, p + 1)
                val rhs = s.substring(r, rEnd)
                s = s.substring(0, lStart) + s"$fn($lhs, $rhs)" + s.substring(rEnd)
                changed = true
              }
            }
          }
        }
      }
    }
    s
  }

  /** Forward scan: index just past the primary expression starting at
    * `start` (identifier chain with call/group suffixes, or a group,
    * or a numeric/string literal); -1 if none.
    */
  private def primaryEnd(s: String, start: Int): Int = {
    var i = start
    if (i >= s.length) return -1
    val c = s.charAt(i)
    if (c == '\'' || c == '"') return skipQuoted(s, i)
    if (c == '(') {
      val close = matchParen(s, i)
      return if (close < 0) -1 else close + 1
    }
    if (!isIdent(c)) return -1
    while (i < s.length && (isIdent(s.charAt(i)) || s.charAt(i) == '.')) i += 1
    // call suffix(es)
    var going = true
    while (going) {
      var j = i
      while (j < s.length && s.charAt(j).isWhitespace) j += 1
      if (j < s.length && s.charAt(j) == '(') {
        val close = matchParen(s, j)
        if (close < 0) going = false else i = close + 1
      } else going = false
    }
    i
  }

  private def rewriteHexCast(s0: String, signed: Boolean): String =
    // rewriteCallRaw, not rewriteCall: a CAST that does NOT match must
    // be left in place with the scan DESCENDING into its argument —
    // the oracles nest hex casts inside arithmetic casts
    // (CAST(CAST(('0x'||x) AS UBIGINT) % 7 - 3 AS DOUBLE))
    rewriteCallRaw(s0, "CAST") { raw =>
      val hex = """(?is)^\(\s*'0x'\s*\|\|\s*(.+)\)\s+AS\s+(UBIGINT|HUGEINT)$""".r
      // narrower targets (≤ 8 hex digits in the oracles): the value
      // fits signed 64 whatever the sign convention, so conv + BIGINT
      val hexInt = """(?is)^\(\s*'0x'\s*\|\|\s*(.+)\)\s+AS\s+(BIGINT|INT|INTEGER|UINTEGER|SMALLINT|USMALLINT)$""".r
      // Spark forbids generators nested in expressions — push the cast
      // inside: CAST(explode(X) AS T) → explode(transform(X, c -> CAST(c AS T)))
      val gen = """(?is)^(explode|unnest)\s*\((.+)\)\s+AS\s+(\w+(?:\(\s*\d+\s*(?:,\s*\d+\s*)?\))?)$""".r
      raw.trim match {
        case hex(inner, _) if balanced(inner) =>
          if (signed)
            // conv(x, 16, -10): same 64 bits, signed reinterpretation —
            // shiftable, and (h >> j) & 1 reads the same bit
            Some(s"CAST(conv(${inner.trim}, 16, -10) AS BIGINT)")
          else Some(s"CAST(conv(${inner.trim}, 16, 10) AS DECIMAL(20,0))")
        case hexInt(inner, _) if balanced(inner) =>
          Some(s"CAST(conv(${inner.trim}, 16, 10) AS BIGINT)")
        case gen(_, inner, typ) if balanced(inner) =>
          Some(s"explode(transform(${inner.trim}, __c -> CAST(__c AS $typ)))")
        case _ => None
      }
    }

  /** DuckDB `list_filter/list_transform(L, (x, i) -> body)` index
    * lambdas are 1-BASED; Spark's filter/transform give a 0-based
    * index. Substitute `(i + 1)` for the index parameter in the body
    * so positional predicates (e.g. first-occurrence keeps) agree.
    */
  private def rewriteIndexedLambda(s0: String): String = {
    var s = s0
    Seq("list_filter" -> "filter", "list_transform" -> "transform").foreach {
      case (duck, spk) =>
        s = rewriteCallRaw(s, duck) { inner =>
          val args = splitArgs(inner)
          if (args.length != 2) None
          else {
            val lam = """(?s)^\(\s*(\w+)\s*,\s*(\w+)\s*\)\s*->\s*(.+)$""".r
            args(1) match {
              case lam(x, idx, body) =>
                val adjusted = substituteWord(body, idx, s"($idx + 1)")
                Some(s"$spk(${args(0)}, ($x, $idx) -> $adjusted)")
              case _ => None
            }
          }
        }
    }
    s
  }

  /** Replace whole-word, unquoted occurrences of `word` in `s`. */
  private def substituteWord(s: String, word: String, rep: String): String = {
    val out = new StringBuilder
    var i = 0
    while (i < s.length) {
      s.charAt(i) match {
        case c @ ('\'' | '"') =>
          val j = skipQuoted(s, i)
          out.append(s.substring(i, j)); i = j
          val _ = c
        case c if isIdent(c) =>
          var j = i
          while (j < s.length && isIdent(s.charAt(j))) j += 1
          val tok = s.substring(i, j)
          out.append(if (tok == word) rep else tok)
          i = j
        case c => out.append(c); i += 1
      }
    }
    out.toString
  }

  /** DuckDB ZIPS multiple `unnest`s in one select list. The idiom the
    * oracles use — a value unnest zipped with its own index series —
    * is exactly `posexplode`:
    * `unnest(A) AS x, unnest(generate_series(1, len(A))) AS i`
    *   → `posexplode(A) AS (__zp, x), (__zp + 1) AS i` (1-based), and
    * `unnest(A) AS x, unnest(range(len(A))) AS i`
    *   → `posexplode(A) AS (i, x)` (0-based). Other zip shapes are
    * left alone (Spark then reports them unsupported rather than
    * silently cross-joining the generators).
    */
  private def rewriteZippedUnnest(s0: String): String = {
    var s = s0
    var guard = 0
    var from = 0
    val one = """(?is)unnest\((.+?)\)\s+AS\s+(\w+)\s*,\s*unnest\(\s*(generate_series\(\s*1\s*,\s*len\(\s*(.+?)\s*\)\s*\)|range\(\s*len\(\s*(.+?)\s*\)\s*\))\s*\)\s+AS\s+(\w+)""".r
    while (guard < 50) {
      guard += 1
      one.findFirstMatchIn(s.substring(from)) match {
        case Some(m0) =>
          val start = from + m0.start
          val end = from + m0.end
          val a = m0.group(1).trim
          val series = m0.group(3)
          val aInSeries = Option(m0.group(4)).getOrElse(m0.group(5)).trim
          val x = m0.group(2)
          val i = m0.group(6)
          def norm(t: String) = t.replaceAll("\\s+", "")
          // the lazy dotall group can span CTE boundaries and land on
          // a false candidate — require the self-indexing idiom AND a
          // balanced first argument, else keep scanning from the next
          // position instead of giving up
          if (norm(a) == norm(aInSeries) && balanced(a)) {
            val rep =
              if (series.startsWith("generate_series"))
                s"posexplode($a) AS (__zp, $x), (__zp + 1) AS $i"
              else s"posexplode($a) AS ($i, $x)"
            s = s.substring(0, start) + rep + s.substring(end)
            from = start + rep.length
          } else from = start + 7
        case None => return s
      }
    }
    s
  }

  /** The OTHER zipped-generator idiom (q_embed_drift): DuckDB nests
    * BOTH generators inside expressions in one select list —
    * `CAST(generate_subscripts(X, 1) - 1 AS BIGINT)` zipped with
    * `CAST(round(unnest(X) * c) AS BIGINT)`. Spark forbids generators
    * nested in expressions, so hoist the zip into ONE
    * `LATERAL VIEW posexplode(X)` on the owning FROM and substitute
    * scalar references: `generate_subscripts(X, 1)` → `(__gsp + 1)`
    * (posexplode is 0-based, subscripts 1-based) and `unnest(X)` →
    * `__gsv`. Applies only when both calls share a norm-identical
    * argument inside the same SELECT block; other nestings stay put
    * and fail analysis loudly.
    */
  private def rewriteSubscriptZip(s0: String): String = {
    var s = s0
    var scanFrom = 0
    var guard = 0
    while (guard < 20) {
      guard += 1
      val g = findWord(s, "generate_subscripts", scanFrom, caseInsensitive = true)
      if (g < 0) return s
      var advanced = false
      var p = g + "generate_subscripts".length
      while (p < s.length && s.charAt(p).isWhitespace) p += 1
      if (p < s.length && s.charAt(p) == '(') {
        val gClose = matchParen(s, p)
        val args = if (gClose > 0) splitArgs(s.substring(p + 1, gClose))
                   else Seq.empty
        if (gClose > 0 && args.size == 2 && args(1).trim == "1" &&
            balanced(args(0))) {
          val x = args(0).trim
          def norm(t: String) = t.replaceAll("\\s+", "")
          // owning SELECT block: walk OUTWARD through enclosing parens
          // (the nearest unmatched '(' is usually an expression paren
          // like CAST's) until the block has a depth-0 SELECT before g
          // and a depth-0 FROM after the call — the select body whose
          // FROM takes the LATERAL VIEW
          val mask = quoteMask(s)
          def unmatchedOpenBefore(pos: Int): Int = {
            var depth = 0
            var i = pos - 1
            while (i >= 0) {
              if (mask(i)) { while (i >= 0 && mask(i)) i -= 1 }
              else {
                s.charAt(i) match {
                  case ')' => depth += 1
                  case '(' => if (depth == 0) return i + 1 else depth -= 1
                  case _ =>
                }
                i -= 1
              }
            }
            0
          }
          var blockStart = g
          var blockEnd = -1
          var owning = false
          while (!owning && blockStart > 0) {
            blockStart = unmatchedOpenBefore(blockStart - 1)
            blockEnd = {
              val e = if (blockStart == 0) -1 else matchParen(s, blockStart - 1)
              if (e < 0) s.length else e
            }
            owning = {
              val sel = findWordAtDepth0(s, "select", blockStart, g)
              val frm = findWordAtDepth0(s, "from", blockStart, blockEnd)
              sel >= 0 && frm > gClose
            }
          }
          if (!owning) blockEnd = -1
          // the matching unnest(X) inside the same block
          var un = -1
          var unClose = -1
          var uFrom = blockStart
          while (un < 0 && uFrom < blockEnd) {
            val c = findWord(s, "unnest", uFrom, caseInsensitive = true)
            if (c < 0 || c >= blockEnd) uFrom = blockEnd
            else {
              var q = c + "unnest".length
              while (q < s.length && s.charAt(q).isWhitespace) q += 1
              val cl = if (q < s.length && s.charAt(q) == '(') matchParen(s, q) else -1
              if (cl > 0 && norm(s.substring(q + 1, cl)) == norm(x)) {
                un = c; unClose = cl
              } else uFrom = c + "unnest".length
            }
          }
          val fromPos = findWordAtDepth0(s, "from", blockStart, blockEnd)
          if (un >= 0 && fromPos >= 0) {
            // insertion point: before the first depth-0 clause keyword
            // after FROM, else the block end
            val clauses = Seq("where", "group", "having", "window",
              "qualify", "order", "limit", "union", "intersect", "except")
            val insertAt = clauses
              .map(w => findWordAtDepth0(s, w, fromPos + 4, blockEnd))
              .filter(_ >= 0)
              .foldLeft(blockEnd)(math.min)
            // splice right-to-left so earlier spans stay valid
            val lateral = s" LATERAL VIEW posexplode($x) __gs AS __gsp, __gsv "
            val edits = Seq(
              (insertAt, insertAt, lateral),
              (un, unClose + 1, "__gsv"),
              (g, gClose + 1, "(__gsp + 1)")
            ).sortBy(-_._1)
            s = edits.foldLeft(s) { case (acc, (a, b, rep)) =>
              acc.substring(0, a) + rep + acc.substring(b)
            }
            advanced = true
          }
        }
      }
      if (!advanced) scanFrom = g + "generate_subscripts".length
    }
    s
  }

  /** Balanced parens/brackets and quotes — a sanity gate for regex-
    * captured argument spans. */
  private def balanced(t: String): Boolean = {
    var depth = 0
    var i = 0
    while (i < t.length) {
      t.charAt(i) match {
        case '\'' | '"' =>
          val j = skipQuoted(t, i)
          if (j <= i) return false
          i = j - 1
        case '(' | '[' | '{' => depth += 1
        case ')' | ']' | '}' =>
          depth -= 1
          if (depth < 0) return false
        case _ =>
      }
      i += 1
    }
    depth == 0
  }

  /** `struct_pack(k := v, ...)` → `named_struct('k', v, ...)`. */
  private def rewriteStructPack(s0: String): String = {
    var s = s0
    var from = 0
    var guard = 0
    while (guard < 100) {
      guard += 1
      val i = findWord(s, "struct_pack", from)
      if (i < 0) return s
      val open = {
        var j = i + "struct_pack".length
        while (j < s.length && s.charAt(j).isWhitespace) j += 1
        if (j < s.length && s.charAt(j) == '(') j else -1
      }
      if (open < 0) { from = i + "struct_pack".length }
      else {
        val close = matchParen(s, open)
        if (close < 0) return s
        val kvs = splitArgs(s.substring(open + 1, close)).map { part =>
          val at = part.indexOf(":=")
          if (at < 0) null
          else s"'${part.substring(0, at).trim}', ${part.substring(at + 2).trim}"
        }
        if (kvs.exists(_ == null)) { from = close + 1 }
        else {
          val rep = s"named_struct(${kvs.mkString(", ")})"
          s = s.substring(0, i) + rep + s.substring(close + 1)
          from = i + rep.length
        }
      }
    }
    s
  }

  /** Scalar `generate_series(a, b[, s])` / `range(a, b)` → `sequence`
    * with an empty-when-exhausted guard: DuckDB returns [] when the
    * end precedes the start, while Spark's `sequence` would count
    * DOWN — the guard preserves the empty contract.
    */
  private def rewriteScalarSeries(s0: String): String = {
    def guarded(a: String, b: String, step: Option[String], inclusive: Boolean): String = {
      val hi = if (inclusive) b else s"($b) - 1"
      val cmp = if (inclusive) ">=" else ">"
      val seq = step match {
        case Some(st) => s"sequence($a, $hi, $st)"
        case None => s"sequence($a, $hi)"
      }
      s"(CASE WHEN ($b) $cmp ($a) THEN $seq ELSE slice(sequence($a, $a), 1, 0) END)"
    }
    var s = rewriteCall(s0, "generate_series", 2)(a => guarded(a(0), a(1), None, inclusive = true))
    s = rewriteCall(s, "generate_series", 3)(a => guarded(a(0), a(1), Some(a(2)), inclusive = true))
    s = rewriteCall(s, "range", 2)(a => guarded(a(0), a(1), None, inclusive = false))
    s = rewriteCall(s, "range", 1)(a => guarded("0", a(0), None, inclusive = false))
    s
  }

  /** `f(x IGNORE NULLS)` (DuckDB puts the modifier inside the call)
    * → `f(x) IGNORE NULLS` (Spark puts it after).
    */
  private def rewriteIgnoreNulls(s0: String): String = {
    var s = s0
    var from = 0
    var guard = 0
    while (guard < 50) {
      guard += 1
      val i = findWord(s, "IGNORE", from, caseInsensitive = true)
      if (i < 0) return s
      val rest = s.substring(i)
      """(?is)^IGNORE\s+NULLS\s*\)""".r.findPrefixMatchOf(rest) match {
        case Some(mm) =>
          val head = s.substring(0, i).reverse.dropWhile(_.isWhitespace).reverse
          s = head + ") IGNORE NULLS " + s.substring(i + mm.end)
          from = head.length + ") IGNORE NULLS ".length
        case None => from = i + "IGNORE".length
      }
    }
    s
  }

  private def stripDir(k: String): String =
    k.trim.replaceFirst("(?i)\\s+(ASC|DESC)$", "") // DESC keys unsupported ascending-only oracles use ASC

  /** Brackets: `x[i]` → `try_element_at(x, i)` (1-based in both),
    * `x[a:b]` → `slice(x, a, b-a+1)`, `TYPE[]` → `ARRAY<TYPE>`,
    * list literals `[a, b]` → `array(a, b)`. DuckDB comprehensions
    * (`[e for v in xs]`) are left untouched (→ UNSUPPORTED).
    */
  private def rewriteBrackets(s0: String): String = {
    var s = s0
    var changed = true
    var guard = 0
    while (changed && guard < 400) {
      changed = false
      guard += 1
      val mask = quoteMask(s)
      var i = 0
      while (i < s.length && !changed) {
        s.charAt(i) match {
          case '\'' | '"' => i = skipQuoted(s, i)
          case '[' =>
            val close = matchBracket(s, i)
            if (close < 0) { i += 1 }
            else {
              val inner = s.substring(i + 1, close)
              val forIdx = findWordTopLevel(inner, "for", 0)
              val isComp = forIdx >= 0
              // previous non-space char decides indexing vs literal
              var p = i - 1
              while (p >= 0 && s.charAt(p).isWhitespace) p -= 1
              val prev = if (p >= 0) s.charAt(p) else ' '
              if (isComp) {
                // DuckDB comprehension [EXPR for VAR in SEQ [if COND]]
                // → transform(SEQ, VAR -> EXPR) (+ filter for COND)
                val expr = inner.substring(0, forIdx).trim
                val rest = inner.substring(forIdx + 3)
                val inIdx = findWordTopLevel(rest, "in", 0)
                if (inIdx < 0) { i = close + 1 }
                else {
                  val v = rest.substring(0, inIdx).trim
                  val seqAll = rest.substring(inIdx + 2)
                  val ifIdx = findWordTopLevel(seqAll, "if", 0)
                  val rep =
                    if (ifIdx >= 0) {
                      val seq = seqAll.substring(0, ifIdx).trim
                      val cond = seqAll.substring(ifIdx + 2).trim
                      s"transform(filter($seq, $v -> $cond), $v -> $expr)"
                    } else s"transform(${seqAll.trim}, $v -> $expr)"
                  s = s.substring(0, i) + rep + s.substring(close + 1)
                  changed = true
                }
              } else if ((isIdent(prev) && !endsWithKeyword(s, p)) ||
                  prev == ')' || prev == ']') {
                // indexing / slice / TYPE[] — find start of primary expr
                val start = exprStart(s, p, mask)
                val target = s.substring(start, i)
                val colon = topLevelColon(inner)
                val rep =
                  if (inner.trim.isEmpty) s"ARRAY<$target>"
                  else if (colon >= 0) {
                    val lo = inner.substring(0, colon).trim
                    val hi = inner.substring(colon + 1).trim
                    if (lo.isEmpty || hi.isEmpty) null
                    else s"slice($target, $lo, ($hi) - ($lo) + 1)"
                  } else s"try_element_at($target, $inner)"
                if (rep == null) i = close + 1
                else {
                  s = s.substring(0, start) + rep + s.substring(close + 1)
                  changed = true
                }
              } else {
                // list literal
                s = s.substring(0, i) + "array(" + inner + ")" + s.substring(close + 1)
                changed = true
              }
            }
          case '{' =>
            // struct literal {'k': v, ...} → named_struct('k', v, ...)
            val close = matchBrace(s, i)
            if (close < 0) { i += 1 }
            else {
              val parts = splitArgs(s.substring(i + 1, close))
              val kvs = parts.map { part =>
                val c = topLevelColon(part)
                if (c < 0) null
                else s"${part.substring(0, c).trim}, ${part.substring(c + 1).trim}"
              }
              if (kvs.exists(_ == null) || kvs.isEmpty) { i = close + 1 }
              else {
                s = s.substring(0, i) + "named_struct(" + kvs.mkString(", ") +
                  ")" + s.substring(close + 1)
                changed = true
              }
            }
          case _ => i += 1
        }
      }
    }
    s
  }

  /** True at every index lying inside a quoted literal (delimiters
    * included) — lets the backward walks treat literals as opaque.
    */
  private def quoteMask(s: String): Array[Boolean] = {
    val mask = new Array[Boolean](s.length)
    var i = 0
    while (i < s.length) {
      s.charAt(i) match {
        case '\'' | '"' =>
          val j = skipQuoted(s, i)
          var k = i
          while (k < j) { mask(k) = true; k += 1 }
          i = j
        case _ => i += 1
      }
    }
    mask
  }

  /** Walk backward from `pEnd` (last char of a primary expression) to
    * its start: identifier chains with dots, with balanced call/index
    * suffixes (`f(x)[1]`, `a.b[2]`). Quoted literals are opaque.
    */
  private def exprStart(s: String, pEnd: Int, mask: Array[Boolean]): Int = {
    var p = pEnd
    var scanning = true
    while (scanning && p >= 0) {
      val c = s.charAt(p)
      if (c == ')' || c == ']') {
        val closeC = c
        val openC = if (c == ')') '(' else '['
        var depth = 0
        var done = false
        while (p >= 0 && !done) {
          if (mask(p)) {
            // jump to just before this quoted literal
            while (p >= 0 && mask(p)) p -= 1
          } else {
            val ch = s.charAt(p)
            if (ch == closeC) depth += 1
            else if (ch == openC) { depth -= 1; if (depth == 0) done = true }
            p -= 1
          }
        }
        if (!done) return 0
        // an identifier (function/array name) may precede the opener
        while (p >= 0 && !mask(p) && (isIdent(s.charAt(p)) || s.charAt(p) == '.')) p -= 1
        // another suffix group may precede (f(x)(y)[1]); else stop
        if (p < 0 || mask(p) || (s.charAt(p) != ')' && s.charAt(p) != ']'))
          scanning = false
      } else if (isIdent(c) || c == '.') {
        while (p >= 0 && !mask(p) && (isIdent(s.charAt(p)) || s.charAt(p) == '.')) p -= 1
        scanning = false
      } else {
        return p + 1
      }
    }
    p + 1
  }

  private val sqlKeywords = Set(
    "select", "when", "then", "else", "end", "and", "or", "not", "in",
    "from", "where", "union", "all", "by", "as", "on", "case", "distinct",
    "having", "limit", "offset", "join", "left", "right", "inner", "outer",
    "cross", "using", "group", "order", "values", "if", "over", "between",
    "exists", "like", "is", "null", "asc", "desc", "qualify", "window")

  /** True when the identifier ENDING at index `p` is a SQL keyword —
    * a bracket after it is a list literal, not an index. */
  private def endsWithKeyword(s: String, p: Int): Boolean = {
    var a = p
    while (a >= 0 && isIdent(s.charAt(a))) a -= 1
    sqlKeywords.contains(s.substring(a + 1, p + 1).toLowerCase)
  }

  private def topLevelColon(s: String): Int = {
    var depth = 0
    var i = 0
    while (i < s.length) {
      s.charAt(i) match {
        case '\'' | '"' => i = skipQuoted(s, i) - 1
        case '(' | '[' | '{' => depth += 1
        case ')' | ']' | '}' => depth -= 1
        case ':' if depth == 0 => return i
        case _ =>
      }
      i += 1
    }
    -1
  }

  // ---- word-level maps ---------------------------------------------

  /** Function-name map: applied only when the identifier is followed
    * by '(' (never to aliases or column references).
    */
  private val funcMap: Map[String, String] = Map(
    "len" -> "size",
    "strpos" -> "instr",
    "arg_max" -> "max_by",
    "arg_min" -> "min_by",
    "epoch_us" -> "unix_micros",
    "epoch_ms" -> "unix_millis",
    "string_split" -> "split",
    "string_split_regex" -> "split",
    "str_split" -> "split",
    "regexp_split_to_array" -> "split",
    "quantile_cont" -> "percentile",
    "list_transform" -> "transform",
    "list_filter" -> "filter",
    "list_distinct" -> "array_distinct",
    "list_intersect" -> "array_intersect",
    "list_max" -> "array_max",
    "list_min" -> "array_min",
    "list_contains" -> "array_contains",
    "regexp_matches" -> "regexp_like",
    "json_extract_string" -> "get_json_object",
    "unnest" -> "explode"
  )

  /** Unconditional type-name map. */
  private val typeMap: Map[String, String] = Map(
    "VARCHAR" -> "STRING",
    "HUGEINT" -> "DECIMAL(38,0)",
    // BIGINT, not DECIMAL(20,0): the oracles use UBIGINT as a 64-bit
    // BIT container (shifts, bit_or/xor) — the bit patterns coincide
    // in int64, while decimals cannot do bitwise ops at all
    "UBIGINT" -> "BIGINT",
    "UINTEGER" -> "BIGINT"
  )

  private def rewriteWords(s0: String): String = {
    val out = new StringBuilder
    var i = 0
    while (i < s0.length) {
      s0.charAt(i) match {
        case c @ ('\'' | '"') =>
          val j = skipQuoted(s0, i)
          out.append(s0.substring(i, j)); i = j
          val _ = c
        case c if isIdent(c) =>
          var j = i
          while (j < s0.length && isIdent(s0.charAt(j))) j += 1
          val tok = s0.substring(i, j)
          var k = j
          while (k < s0.length && s0.charAt(k).isWhitespace) k += 1
          val isCall = k < s0.length && s0.charAt(k) == '('
          val mapped =
            if (isCall && funcMap.contains(tok)) funcMap(tok)
            else typeMap.getOrElse(tok.toUpperCase, tok)
          out.append(mapped)
          i = j
        case c =>
          out.append(c); i += 1
      }
    }
    out.toString
  }

  /** `//` → ` div ` outside quotes. */
  private def rewriteIntDiv(s0: String): String = {
    val out = new StringBuilder
    var i = 0
    while (i < s0.length) {
      s0.charAt(i) match {
        case '\'' | '"' =>
          val j = skipQuoted(s0, i)
          out.append(s0.substring(i, j)); i = j
        case '/' if i + 1 < s0.length && s0.charAt(i + 1) == '/' =>
          out.append(" div "); i += 2
        case c =>
          out.append(c); i += 1
      }
    }
    out.toString
  }
}
