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
 */
object DialectSql {

  /** Function/keyword rewrites applied OUTSIDE string literals. Word
    * boundaries are enforced by the regex so e.g. a column named
    * `my_levenshtein_x` is untouched. */
  private val tokenRewrites: Seq[(scala.util.matching.Regex, String)] = Seq(
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

  /** strptime -> java.time format tokens (only the tokens the reference's
    * date-comparison templates emit). */
  private val strptimeTokens = Seq(
    "%Y" -> "yyyy", "%y" -> "yy", "%m" -> "MM", "%d" -> "dd",
    "%H" -> "HH", "%M" -> "mm", "%S" -> "ss")

  /** DuckDB strptime format -> java.time pattern: translate %-tokens and
    * single-quote any literal letters (e.g. the T/Z in the reference's
    * default timestamp format '%Y-%m-%dT%H:%M:%SZ' — bare letters are
    * reserved in java.time patterns). */
  private def strptimeToJavaTime(fmt: String): String = {
    val out = new StringBuilder
    var i = 0
    while (i < fmt.length) {
      if (fmt.charAt(i) == '%' && i + 1 < fmt.length) {
        val tok = fmt.substring(i, i + 2)
        strptimeTokens.find(_._1 == tok) match {
          case Some((_, repl)) => out.append(repl); i += 2
          case None => out.append(tok); i += 2 // unknown token: verbatim
        }
      } else {
        val c = fmt.charAt(i)
        if (c.isLetter) out.append('\'').append(c).append('\'')
        else out.append(c)
        i += 1
      }
    }
    out.toString
  }

  /** DuckDB SQL fragment -> Spark SQL fragment. */
  def duckdbToSpark(sql: String): String = {
    // one pass splitting the text into literal / non-literal segments so
    // rewrites never touch the inside of a '...' string; "ident" becomes
    // `ident` ("" escape -> a literal " inside the name)
    val out = new StringBuilder
    val code = new StringBuilder // current non-literal run, rewritten on flush
    def flushCode(): Unit = {
      var s = code.toString
      tokenRewrites.foreach { case (re, repl) => s = re.replaceAllIn(s, repl) }
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
    // DuckDB 1-based bracket indexing (array_first_index=1; `x[-1]` =
    // last, `dialects.py:362-372`) -> element_at, which is 1-based and
    // negative-index-aware in Spark, unlike Spark's 0-based `[]`
    val indexed = "(`[^`]+`)\\[(-?\\d+)\\]".r
      .replaceAllIn(out.toString,
        m => scala.util.matching.Regex.quoteReplacement(
          s"element_at(${m.group(1)}, ${m.group(2)})"))
    // try_strptime's %-format literal (now the 2nd arg of
    // try_to_timestamp) must become a java.time pattern; the pattern's
    // own quote chars double up inside the SQL string literal
    "(?i)try_to_timestamp\\(([^,()]*(?:\\([^()]*\\))?[^,()]*),\\s*'([^']*)'\\)".r
      .replaceAllIn(indexed, m => {
        val fmt = strptimeToJavaTime(m.group(2)).replace("'", "''")
        scala.util.matching.Regex.quoteReplacement(
          s"try_to_timestamp(${m.group(1)}, '$fmt')")
      })
  }

  /** Apply the dialect named in a model.json (`sql_dialect` field) to a
    * stored SQL fragment. Spark-dialect and unknown-dialect fragments pass
    * through nearly untouched — only `::VARCHAR`/`::TEXT` casts are
    * normalised to `::STRING`, because older reference settings files
    * (pre-`sql_dialect`, e.g. real_time_settings.json) carry them and the
    * tokens are never valid Spark SQL, so the rewrite cannot collide. */
  def toSpark(sql: String, dialect: String): String =
    if (dialect.equalsIgnoreCase("duckdb")) duckdbToSpark(sql)
    else "(?i)::\\s*(varchar|text)\\b".r.replaceAllIn(sql, "::STRING")
}
