package graft.model

/**
 * Translation of DuckDB-dialect SQL fragments — as found in model.json
 * files the reference writes with `sql_dialect: "duckdb"`
 * (`settings.py:568-595`; conditions are stored pre-dialected, e.g.
 * `jaro_winkler_similarity("first_name_l", "first_name_r") >= 0.92`) —
 * into Spark SQL against this engine's registered function surface, so a
 * model trained in the reference loads and predicts here unchanged.
 *
 * Scope: the constructs the reference's own comparison/blocking libraries
 * emit for DuckDB (identifier quoting, similarity function names,
 * TEXT casts, try_strptime/EPOCH date arithmetic). Anything else passes
 * through verbatim and fails loudly at Spark parse time, never silently.
 * Double-quoted identifiers are normalised to backticks for EVERY
 * dialect: Spark would otherwise parse them as string literals and a
 * condition like `"a_l" = "a_r"` would silently evaluate as a constant
 * string comparison instead of failing.
 */
object DialectSql {

  /** Function/keyword rewrites applied OUTSIDE string literals. Word
    * boundaries are enforced by the regex so e.g. a column named
    * `my_levenshtein_x` is untouched. */
  private val duckdbRewrites: Seq[(scala.util.matching.Regex, String)] = Seq(
    ("(?i)\\bjaro_winkler_similarity\\b".r, "jaro_winkler"),
    ("(?i)\\bjaro_similarity\\b".r, "jaro_sim"),
    // DuckDB's jaccard is char-SET jaccard; the engine's `jaccard` alias
    // keeps the reference Spark jar's BIGRAM semantics, so duckdb
    // fragments must target the q=1 kernel explicitly
    ("(?i)\\bjaccard\\s*\\(".r, "jaccard_chars("),
    // our damerau_levenshtein / levenshtein / regexp_extract match already
    ("(?i)\\bas\\s+text\\b".r, "AS STRING"),
    ("(?i)::\\s*varchar\\b".r, "::STRING"),
    ("(?i)::\\s*text\\b".r, "::STRING"),
    ("(?i)\\bepoch\\s*\\(".r, "unix_timestamp("),
    ("(?i)\\btry_strptime\\s*\\(".r, "try_to_timestamp("),
    // array level surface (`dialects.py:296-360`): list_* -> Spark names;
    // array_length(list_intersect(..)) is ArrayIntersectLevel's rendering
    ("(?i)\\blist_intersect\\s*\\(".r, "array_intersect("),
    ("(?i)\\barray_length\\s*\\(".r, "size("),
    ("(?i)\\blist_max\\s*\\(".r, "array_max("),
    ("(?i)\\blist_min\\s*\\(".r, "array_min("),
    ("(?i)\\blist_transform\\s*\\(".r, "transform("),
    ("(?i)\\barray_cosine_similarity\\s*\\(".r, "cosine_sim("))

  /** Cast normalisation for spark/unknown dialects: older reference
    * settings files (pre-`sql_dialect`, e.g. real_time_settings.json)
    * carry `::VARCHAR`/`::TEXT`, never valid Spark SQL. */
  private val castRewrites: Seq[(scala.util.matching.Regex, String)] = Seq(
    ("(?i)::\\s*varchar\\b".r, "::STRING"),
    ("(?i)::\\s*text\\b".r, "::STRING"))

  /** strptime -> java.time format tokens (only the tokens the reference's
    * date-comparison templates emit). */
  private val strptimeTokens = Seq(
    "%Y" -> "yyyy", "%y" -> "yy", "%m" -> "MM", "%d" -> "dd",
    "%H" -> "HH", "%M" -> "mm", "%S" -> "ss")

  /** DuckDB strptime format -> java.time pattern: translate %-tokens and
    * single-quote literal-letter RUNS (e.g. the T/Z in the reference's
    * default timestamp format '%Y-%m-%dT%H:%M:%SZ' — bare letters are
    * reserved in java.time patterns). Runs must share one quote pair:
    * quoting letters individually would render `hrs` as `'h''r''s'`,
    * which java.time reads as the literal h'r's. */
  private def strptimeToJavaTime(fmt: String): String = {
    val out = new StringBuilder
    var i = 0
    var inLiteral = false
    def closeLiteral(): Unit = if (inLiteral) { out.append('\''); inLiteral = false }
    while (i < fmt.length) {
      if (fmt.charAt(i) == '%' && i + 1 < fmt.length) {
        closeLiteral()
        val tok = fmt.substring(i, i + 2)
        strptimeTokens.find(_._1 == tok) match {
          case Some((_, repl)) => out.append(repl)
          case None => out.append(tok) // unknown token: verbatim
        }
        i += 2
      } else {
        val c = fmt.charAt(i)
        if (c.isLetter) {
          if (!inLiteral) { out.append('\''); inLiteral = true }
          out.append(c)
        } else { closeLiteral(); out.append(c) }
        i += 1
      }
    }
    closeLiteral()
    out.toString
  }

  /** Apply `f` to every stretch of `sql` OUTSIDE single-quoted string
    * literals ('' escapes respected). */
  private def outsideLiterals(sql: String)(f: String => String): String = {
    val lit = "'(?:[^']|'')*'".r
    val out = new StringBuilder
    var last = 0
    for (m <- lit.findAllMatchIn(sql)) {
      out.append(f(sql.substring(last, m.start)))
      out.append(m.matched)
      last = m.end
    }
    out.append(f(sql.substring(last)))
    out.toString
  }

  /** One scan splitting the text into literal / quoted-identifier /
    * code segments: token rewrites never touch the inside of a '...'
    * string, and every `"ident"` becomes a backtick identifier ("" escape
    * -> a literal " inside the name). */
  private def normalizeQuoting(sql: String,
      rewrites: Seq[(scala.util.matching.Regex, String)]): String = {
    val out = new StringBuilder
    val code = new StringBuilder // current non-literal run, rewritten on flush
    def flushCode(): Unit = {
      var s = code.toString
      rewrites.foreach { case (re, repl) => s = re.replaceAllIn(s, repl) }
      out.append(s)
      code.clear()
    }
    var i = 0
    val n = sql.length
    while (i < n) {
      sql.charAt(i) match {
        case '\'' => // single-quoted literal, '' escapes
          flushCode()
          val end = {
            var j = i + 1
            while (j < n && !(sql.charAt(j) == '\'' &&
              (j + 1 >= n || sql.charAt(j + 1) != '\''))) {
              if (sql.charAt(j) == '\'') j += 2 else j += 1
            }
            math.min(j, n - 1)
          }
          out.append(sql.substring(i, end + 1))
          i = end + 1
        case '"' => // quoted identifier -> backticks
          flushCode()
          val body = new StringBuilder
          var j = i + 1
          var closed = false
          while (j < n && !closed) {
            if (sql.charAt(j) == '"') {
              if (j + 1 < n && sql.charAt(j + 1) == '"') { body.append('"'); j += 2 }
              else { closed = true; j += 1 }
            } else { body.append(sql.charAt(j)); j += 1 }
          }
          out.append('`').append(body).append('`')
          i = j
        case c =>
          code.append(c)
          i += 1
      }
    }
    flushCode()
    out.toString
  }

  /** DuckDB SQL fragment -> Spark SQL fragment. */
  def duckdbToSpark(sql: String): String = {
    val normalized = normalizeQuoting(sql, duckdbRewrites)
    // DuckDB 1-based bracket indexing (array_first_index=1; `x[-1]` =
    // last, `dialects.py:362-372`) -> element_at, which is 1-based and
    // negative-index-aware in Spark, unlike Spark's 0-based `[]`.
    // Both backtick-quoted and bare identifiers are matched; literal
    // content like '[1]' is protected.
    val indexed = outsideLiterals(normalized)(seg =>
      "((?:`[^`]+`)|(?:[A-Za-z_][A-Za-z0-9_]*))\\[(-?\\d+)\\]".r
        .replaceAllIn(seg, m => scala.util.matching.Regex.quoteReplacement(
          s"element_at(${m.group(1)}, ${m.group(2)})")))
    // try_strptime's %-format literal (now the 2nd arg of
    // try_to_timestamp) must become a java.time pattern; the pattern's
    // own quote chars double up inside the SQL string literal
    rewriteTryToTimestamp(indexed)
  }

  /** Rewrite every `try_to_timestamp(expr, '%-format')` call so the format
    * literal becomes a java.time pattern. A balanced-paren walk (not a
    * regex) finds each call's top-level comma, so the first argument may
    * nest arbitrarily — `try_to_timestamp(substr(trim(x), 1, 10), '%Y-%m-%d')`
    * included. A second argument that is not a plain string literal is
    * left untouched; a %-format that SURVIVES the rewrite (which Spark
    * would silently null out per row) throws instead — this file's
    * contract is "fails loudly, never silently". */
  private def rewriteTryToTimestamp(sql: String): String = {
    val token = "try_to_timestamp("
    val lower = sql.toLowerCase
    val out = new StringBuilder
    var i = 0
    var inStr = false
    while (i < sql.length) {
      val c = sql.charAt(i)
      if (inStr) {
        out.append(c)
        if (c == '\'') {
          if (i + 1 < sql.length && sql.charAt(i + 1) == '\'') {
            out.append('\''); i += 1
          } else inStr = false
        }
        i += 1
      } else if (c == '\'') { out.append(c); inStr = true; i += 1 }
      else if (lower.startsWith(token, i)) {
        // walk the argument list tracking depth and literals
        var j = i + token.length
        var depth = 1
        var lit = false
        var topComma = -1
        while (j < sql.length && depth > 0) {
          val cj = sql.charAt(j)
          if (lit) {
            if (cj == '\'') {
              if (j + 1 < sql.length && sql.charAt(j + 1) == '\'') j += 1
              else lit = false
            }
          } else cj match {
            case '\'' => lit = true
            case '(' => depth += 1
            case ')' => depth -= 1
            case ',' if depth == 1 && topComma < 0 => topComma = j
            case _ =>
          }
          j += 1
        }
        val whole = sql.substring(i, j)
        val fmtLit = "^\\s*'((?:[^']|'')*)'\\s*$".r
        if (depth == 0 && topComma >= 0) {
          // recurse into the first argument: a try_to_timestamp nested
          // inside another call's arg1 (e.g. inside a coalesce) must have
          // ITS %-format rewritten too, or it would survive silently —
          // breaking this file's fails-loudly contract
          val arg1 = rewriteTryToTimestamp(
            sql.substring(i + token.length, topComma))
          sql.substring(topComma + 1, j - 1) match {
            case fmtLit(raw) =>
              val fmt = strptimeToJavaTime(raw.replace("''", "'")).replace("'", "''")
              out.append(s"try_to_timestamp($arg1, '$fmt')")
            case other if other.contains('%') =>
              throw new IllegalArgumentException(
                "duckdbToSpark: cannot translate the strptime format in " +
                  s"`$whole` — the second argument is not a plain string " +
                  "literal, and leaving a %-format in place would make " +
                  "Spark's try_to_timestamp return NULL for every row.")
            case other => out.append(s"try_to_timestamp($arg1,$other)")
          }
        } else if (whole.contains('%')) {
          throw new IllegalArgumentException(
            "duckdbToSpark: unbalanced or single-argument try_to_timestamp " +
              s"call `$whole` still carries a %-format Spark cannot parse.")
        } else out.append(whole)
        i = j
      } else { out.append(c); i += 1 }
    }
    out.toString
  }

  /** Apply the dialect named in a model.json (`sql_dialect` field) to a
    * stored SQL fragment. Spark-dialect and unknown-dialect fragments get
    * the same literal-protected quoting pass (double-quoted identifiers
    * -> backticks, `::VARCHAR`/`::TEXT` -> `::STRING`) but none of the
    * duckdb function renames. */
  def toSpark(sql: String, dialect: String): String =
    if (dialect.equalsIgnoreCase("duckdb")) duckdbToSpark(sql)
    else normalizeQuoting(sql, castRewrites)
}
