package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * One-pass text metrics kernel. The pure-Column formulation uses
 * higher-order functions (filter/transform with lambdas) which Spark
 * evaluates interpreted (no codegen for HOFs) — ~1ms/row; this kernel is
 * one JVM pass per document. Semantics mirror [[graft.pipeline.TextOps]]
 * exactly (same tokenisation, marker lists and formula) so the DuckDB
 * oracle SQL stays valid.
 */
object TextStatsKernel {
  val stopwords: Set[String] =
    Set("the", "a", "an", "of", "to", "and", "in", "is", "it", "that", "or")
  val markers: Array[(String, Set[String])] = Array(
    "en" -> Set("the", "a", "of", "and", "to"),
    "de" -> Set("der", "die", "das", "und", "ist"),
    "fr" -> Set("le", "la", "et", "les", "des"),
    "es" -> Set("el", "los", "de", "y", "que"))
  private val punct = Set('.', ',', ';', ':', '!', '?')

  private val md5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  def eval(s0: UTF8String): InternalRow = {
    val text = s0.toString
    val trimmed = text.trim
    val lower = trimmed.toLowerCase(java.util.Locale.ROOT)
    // tokens of lower == tokens of trimmed, lowercased
    val toks: Array[String] =
      if (lower.isEmpty) Array.empty else lower.split("\\s+")
    val nTok = toks.length
    val nChars = text.length
    var punctCount = 0
    var i = 0
    while (i < text.length) {
      if (punct.contains(text.charAt(i))) punctCount += 1
      i += 1
    }
    val punctRatio = if (nChars == 0) 0.0 else punctCount.toDouble / nChars
    var stopHits = 0
    val markerHits = new Array[Int](markers.length)
    toks.foreach { t =>
      if (stopwords.contains(t)) stopHits += 1
      var j = 0
      while (j < markers.length) {
        if (markers(j)._2.contains(t)) markerHits(j) += 1
        j += 1
      }
    }
    val stopRatio = if (nTok == 0) 0.0 else stopHits.toDouble / nTok
    val quality =
      (if (nTok >= 10 && nTok <= 10000) 0.4 else 0.0) +
        (if (stopRatio > 0.05) 0.3 else 0.0) +
        (if (punctRatio < 0.2) 0.3 else 0.0)
    // argmax with ties to earliest language, 'und' when all zero
    var best = 0
    var bestIdx = -1
    var j = markers.length - 1
    while (j >= 0) {
      if (markerHits(j) >= best && markerHits(j) > 0) {
        if (markerHits(j) > best || bestIdx == -1 || j < bestIdx) {
          best = markerHits(j); bestIdx = j
        }
      }
      j -= 1
    }
    val lang = if (bestIdx == -1) "und" else markers(bestIdx)._1
    val normalised = lower.replaceAll("\\s+", " ")
    val digest = md5.get()
    digest.reset()
    val hash = digest.digest(normalised.getBytes("UTF-8"))
    val hex = hash.map(b => f"$b%02x").mkString.substring(0, 16)
    new GenericInternalRow(Array[Any](
      nTok, nChars, punctRatio, stopRatio, quality,
      UTF8String.fromString(lang), UTF8String.fromString(hex)))
  }
}

/**
 * One-pass repetition/junk metrics kernel: duplicate-token and duplicate-
 * bigram ratios via exact string hash sets, longest whitespace token, and
 * ASCII-digit ratio. Same tokenisation as [[TextStatsKernel]]; semantics
 * mirror the pure-Column [[graft.pipeline.CorpusOps]] formulation (which
 * pays one interpreted higher-order pass per metric — ~8 regex splits per
 * document) in a single split + single scan.
 */
object RepetitionStatsKernel {
  def eval(s0: UTF8String): InternalRow = {
    val text = s0.toString
    val nChars = text.length
    var digits = 0
    var i = 0
    while (i < nChars) {
      val ch = text.charAt(i)
      if (ch >= '0' && ch <= '9') digits += 1
      i += 1
    }
    val digitRatio = if (nChars == 0) 0.0 else digits.toDouble / nChars
    val trimmed = text.trim
    val rawToks: Array[String] =
      if (trimmed.isEmpty) Array.empty else trimmed.split("\\s+")
    val n = rawToks.length
    var maxLen = 0
    var dupTok = 0
    var dupBi = 0
    val seen = new java.util.HashSet[String](math.max(16, n * 2))
    val seenBi = new java.util.HashSet[String](math.max(16, n * 2))
    var prev: String = null
    i = 0
    while (i < n) {
      val raw = rawToks(i)
      if (raw.length > maxLen) maxLen = raw.length
      val t = raw.toLowerCase(java.util.Locale.ROOT)
      if (!seen.add(t)) dupTok += 1
      if (prev != null && !seenBi.add(prev + " " + t)) dupBi += 1
      prev = t
      i += 1
    }
    val dupTokRatio = if (n == 0) 0.0 else dupTok.toDouble / n
    val nBi = n - 1
    val dupBiRatio = if (nBi <= 0) 0.0 else dupBi.toDouble / nBi
    new GenericInternalRow(Array[Any](dupTokRatio, dupBiRatio, maxLen, digitRatio))
  }
}

/** repetition_stats(str) -> struct of the four repetition/junk metrics. */
case class RepetitionStats(child: Expression) extends UnaryExpression with Serializable {
  override def dataType: DataType = StructType(Seq(
    StructField("dup_token_ratio", DoubleType, nullable = false),
    StructField("dup_bigram_ratio", DoubleType, nullable = false),
    StructField("max_word_len", IntegerType, nullable = false),
    StructField("digit_ratio", DoubleType, nullable = false)))
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "repetition_stats"
  override def nullSafeEval(v: Any): Any =
    RepetitionStatsKernel.eval(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, v => s"graft.functions.RepetitionStatsKernel.eval($v)")
  override protected def withNewChildInternal(c: Expression): RepetitionStats = copy(child = c)
}

/** text_stats(str) -> struct of the seven document metrics. */
case class TextStats(child: Expression) extends UnaryExpression with Serializable {
  override def dataType: DataType = StructType(Seq(
    StructField("n_tokens", IntegerType, nullable = false),
    StructField("n_chars", IntegerType, nullable = false),
    StructField("punct_ratio", DoubleType, nullable = false),
    StructField("stopword_ratio", DoubleType, nullable = false),
    StructField("quality", DoubleType, nullable = false),
    StructField("lang_guess", StringType, nullable = false),
    StructField("fingerprint", StringType, nullable = false)))
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "text_stats"
  override def nullSafeEval(v: Any): Any =
    TextStatsKernel.eval(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, v => s"graft.functions.TextStatsKernel.eval($v)")
  override protected def withNewChildInternal(c: Expression): TextStats = copy(child = c)
}

/** DEFLATE kernel for [[CompressionRatio]]. */
object CompressionKernel {
  /** compressed_bytes / raw_bytes of the UTF-8 text at fixed level 6 —
    * deterministic for a given zlib build; highly repetitive text
    * compresses far below ~0.4, a standard pretraining junk signal
    * (empty text -> 1.0). */
  def eval(s: UTF8String): Double = {
    val raw = s.getBytes
    if (raw.isEmpty) return 1.0
    val d = new java.util.zip.Deflater(6, false)
    d.setInput(raw)
    d.finish()
    val buf = new Array[Byte](8192)
    var total = 0L
    while (!d.finished()) total += d.deflate(buf)
    d.end()
    total.toDouble / raw.length
  }
}

/** compression_ratio(str) -> deflated/raw byte ratio (junk-text signal). */
case class CompressionRatio(child: Expression) extends UnaryExpression
    with Serializable {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "compression_ratio"
  override def nullSafeEval(v: Any): Any =
    CompressionKernel.eval(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, v => s"graft.functions.CompressionKernel.eval($v)")
  override protected def withNewChildInternal(c: Expression): CompressionRatio =
    copy(child = c)
}

/**
 * One-pass whitespace token count, bit-identical to the pure-Column chain
 * `size(when(length(trim(c)) = 0, array()).otherwise(split(trim(c), "\s+")))`
 * ([[graft.pipeline.TextOps.tokenCount]]) WITHOUT materialising the token
 * array: SQL `trim` strips only 0x20 spaces, and Spark's `split` is Java
 * `String.split(re, -1)`, so a leading or trailing NON-SPACE whitespace run
 * (tab/CR/LF) each contributes one empty token — the count is
 * (non-ws runs) + [starts with ws] + [ends with ws] over the space-trimmed
 * text. All Java `\s` characters are ASCII, so one byte pass suffices (a
 * multi-byte UTF-8 sequence can never contain them).
 */
object TokenCountKernel {
  @inline private def isWs(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0B || b == '\f' || b == '\r'

  def eval(s: UTF8String): Int = {
    val bytes = s.getBytes
    var lo = 0
    var hi = bytes.length - 1
    while (lo <= hi && bytes(lo) == ' ') lo += 1
    while (hi >= lo && bytes(hi) == ' ') hi -= 1
    if (lo > hi) return 0 // blank after space-trim -> tokens() yields []
    var count = 0
    var inField = false
    var i = lo
    while (i <= hi) {
      val ws = isWs(bytes(i))
      if (!ws && !inField) { count += 1; inField = true }
      else if (ws) inField = false
      i += 1
    }
    if (isWs(bytes(lo))) count += 1
    if (isWs(bytes(hi))) count += 1
    count
  }
}

/** token_count(str) -> whitespace token count (Java split(-1) semantics). */
case class TokenCount(child: Expression) extends UnaryExpression
    with Serializable {
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "token_count"
  override def nullSafeEval(v: Any): Any =
    TokenCountKernel.eval(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, v => s"graft.functions.TokenCountKernel.eval($v)")
  override protected def withNewChildInternal(c: Expression): TokenCount =
    copy(child = c)
}

/**
 * Count-only matcher for the GPT-2-style pre-tokenizer pattern
 * ([[graft.pipeline.TextOps.BpeIshPattern]]):
 *
 *   `'(?:s|t|re|ve|m|ll|d)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s`
 *
 * `regexp_count` expands to `size(regexp_extract_all(...))` — the regex
 * engine materialises EVERY match into an array that is immediately
 * discarded for its size. This kernel reproduces the exact
 * java.util.regex match count in one code-point walk with zero
 * allocation beyond the string itself.
 *
 * Why a hand decision tree is exact here: the five alternatives are
 * disjoint on their first character class —
 *  - `'` can only start alt 1 or alt 4 (an apostrophe is neither `\s`,
 *    `\p{L}` nor `\p{N}`), and regex alternation is ORDERED, so the
 *    contraction suffix is tried first and alt 4 is the fallback;
 *  - a literal space (the pattern's ` ?` is U+0020 only) starts alts
 *    2/3/4 when followed by a letter / number / other, else falls to
 *    alt 5 (`\s`); note Java `\s` without UNICODE_CHARACTER_CLASS is
 *    ASCII-only: [ \t\n\x0B\f\r];
 *  - a letter / number / other character starts exactly one of alts
 *    2/3/4 with the optional space unmatched;
 *  - the remaining ASCII whitespace matches alt 5 alone.
 * The greedy `+` runs never need backtracking because the character
 * classes are disjoint, and every position matches SOME alternative
 * (alt 4's class is the complement of the others), so the match count is
 * the number of such steps. `\p{L}` = Unicode categories Lu/Ll/Lt/Lm/Lo
 * (Character.isLetter over code points, including supplementary);
 * `\p{N}` = Nd/Nl/No (Character.getType). Fuzz-pinned bit-identical to
 * the `regexp_count` formulation in TextKernelSpec.
 */
object BpeCountKernel {
  @inline private def isAsciiWs(cp: Int): Boolean =
    cp == ' ' || cp == '\t' || cp == '\n' || cp == 0x0B || cp == '\f' ||
      cp == '\r'
  @inline private def isNum(cp: Int): Boolean = {
    val t = Character.getType(cp)
    t == Character.DECIMAL_DIGIT_NUMBER || t == Character.LETTER_NUMBER ||
      t == Character.OTHER_NUMBER
  }
  // "other" = alt 4's class: not ASCII-ws, not letter, not number
  @inline private def isOther(cp: Int): Boolean =
    !isAsciiWs(cp) && !Character.isLetter(cp) && !isNum(cp)

  def eval(s: UTF8String): Int = {
    val str = s.toString
    val n = str.length
    var i = 0
    var count = 0
    while (i < n) {
      val cp = str.codePointAt(i)
      if (cp == '\'') {
        // alt 1: contraction suffix (ordered: s|t|re|ve|m|ll|d)
        val j = i + 1
        val suffixLen =
          if (j >= n) 0
          else str.charAt(j) match {
            case 's' | 't' | 'm' | 'd' => 1
            case 'r' | 'v' => if (j + 1 < n && str.charAt(j + 1) == 'e') 2 else 0
            case 'l' => if (j + 1 < n && str.charAt(j + 1) == 'l') 2 else 0
            case _ => 0
          }
        if (suffixLen > 0) i = j + suffixLen
        else i = runEnd(str, i + 1, n, 3) // alt 4 fallback: `'` + other-run
      } else if (cp == ' ') {
        // alts 2/3/4 with the optional leading space, else alt 5
        if (i + 1 < n) {
          val la = str.codePointAt(i + 1)
          if (Character.isLetter(la)) i = runEnd(str, i + 1, n, 1)
          else if (isNum(la)) i = runEnd(str, i + 1, n, 2)
          else if (isOther(la)) i = runEnd(str, i + 1, n, 3)
          else i += 1 // following ws: the space matches alt 5 alone
        } else i += 1 // trailing space: alt 5
      } else if (Character.isLetter(cp)) i = runEnd(str, i, n, 1)
      else if (isNum(cp)) i = runEnd(str, i, n, 2)
      else if (isAsciiWs(cp)) i += 1 // alt 5
      else i = runEnd(str, i, n, 3) // alt 4 without the space
      count += 1
    }
    count
  }

  /** End index (exclusive) of the greedy run of class `cls` starting at
    * `from`: 1 = `\p{L}`, 2 = `\p{N}`, 3 = alt 4's other class. */
  private def runEnd(str: String, from: Int, n: Int, cls: Int): Int = {
    var i = from
    while (i < n) {
      val cp = str.codePointAt(i)
      val in = cls match {
        case 1 => Character.isLetter(cp)
        case 2 => isNum(cp)
        case _ => isOther(cp)
      }
      if (!in) return i
      i += Character.charCount(cp)
    }
    i
  }
}

/** bpe_count(str) -> match count of the BPE-ish pre-tokenizer pattern
  * (java.util.regex semantics) without materialising the match array. */
case class BpeCount(child: Expression) extends UnaryExpression
    with Serializable {
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "bpe_count"
  override def nullSafeEval(v: Any): Any =
    BpeCountKernel.eval(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, v => s"graft.functions.BpeCountKernel.eval($v)")
  override protected def withNewChildInternal(c: Expression): BpeCount =
    copy(child = c)
}

/**
 * One-pass Gopher rule-feature kernel (Rae et al. 2021 A1.1), bit-identical
 * to the pure-Column chain in [[graft.pipeline.TextOps.gopherRulesReference]]
 * — which pays ~7 interpreted higher-order passes (filter/transform/
 * aggregate lambdas get no codegen) plus three regex engines per document.
 * Ratios are returned RAW; the frame applies the same `round(_, 9)` the
 * Column `ratio()` helper does, so results match bit-for-bit.
 *
 * Parity corners handled exactly:
 *  - tokens = Java `split("\s+", -1)` of the SPACE-trimmed text (SQL `trim`
 *    strips 0x20 only), so leading/trailing tab/CR runs yield EMPTY tokens
 *    that count in every nTok denominator — and lower to "", which can
 *    match an (unusual) empty stopword;
 *  - token length is `length()` = code POINTS, not UTF-16 units;
 *  - stop hits count DISTINCT lowered token values present in the stopword
 *    list (`array_intersect(array_distinct(...))`), lowered with the same
 *    `UTF8String.toLowerCase` Spark's `lower()` uses;
 *  - `"\.\.\.\s*$"` on a line: Java's non-MULTILINE `$` also matches
 *    before ONE final line terminator; inside a `split("\n")` line that can
 *    still be U+0085/U+2028/U+2029 (\r is already `\s`), so one such final
 *    char is stepped over before the trailing-whitespace skip;
 *  - non-overlapping `regexp_replace(c, "\.\.\.", "")` count = sum of
 *    floor(run/3) over maximal '.' runs.
 */
object GopherStatsKernel {
  @inline private def isWs(ch: Char): Boolean =
    ch == ' ' || ch == '\t' || ch == '\n' || ch == '\u000B' ||
      ch == '\f' || ch == '\r'

  def eval(s0: UTF8String, stopIndex: java.util.HashMap[String, Integer],
      nStops: Int): InternalRow = {
    val text = s0.toString
    val len = text.length

    // ---- full-text counts: '#' chars, non-overlapping "..." matches ----
    var hashCount = 0
    var ellipsisMatches = 0
    var dotRun = 0
    var i = 0
    while (i < len) {
      val ch = text.charAt(i)
      if (ch == '#') hashCount += 1
      if (ch == '.') dotRun += 1
      else { ellipsisMatches += dotRun / 3; dotRun = 0 }
      i += 1
    }
    ellipsisMatches += dotRun / 3

    // ---- tokens of the space-trimmed text ----
    var lo = 0
    var hi = len - 1
    while (lo <= hi && text.charAt(lo) == ' ') lo += 1
    while (hi >= lo && text.charAt(hi) == ' ') hi -= 1
    var nTok = 0
    var meanSum = 0
    var alphaToks = 0
    val stopSeen = new Array[Boolean](nStops)
    var stopHits = 0
    @inline def stopCheck(lowered: String): Unit = {
      val idx = stopIndex.get(lowered)
      if (idx != null && !stopSeen(idx)) { stopSeen(idx) = true; stopHits += 1 }
    }
    if (lo <= hi) { // non-blank: tokens() took the split branch
      if (isWs(text.charAt(lo))) { nTok += 1; stopCheck("") } // leading empty
      if (isWs(text.charAt(hi))) { nTok += 1; stopCheck("") } // trailing empty
      var fs = -1
      i = lo
      while (i <= hi + 1) {
        val ws = i > hi || isWs(text.charAt(i))
        if (!ws && fs < 0) fs = i
        else if (ws && fs >= 0) {
          nTok += 1
          meanSum += text.codePointCount(fs, i)
          var j = fs
          var alpha = false
          while (j < i && !alpha) {
            val c = text.charAt(j)
            alpha = (c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z')
            j += 1
          }
          if (alpha) alphaToks += 1
          stopCheck(UTF8String.fromString(text.substring(fs, i))
            .toLowerCase.toString)
          fs = -1
        }
        i += 1
      }
    }

    // ---- lines of the ORIGINAL text: split("\n", -1) ----
    var nLines = 0
    var bulletLines = 0
    var ellipsisLines = 0
    var ls = 0
    while (ls <= len) {
      var le = text.indexOf('\n', ls)
      if (le < 0) le = len
      nLines += 1
      // "^\s*[-*•]": skip ASCII \s, then a bullet char
      var p = ls
      while (p < le && isWs(text.charAt(p))) p += 1
      if (p < le) {
        val c = text.charAt(p)
        if (c == '-' || c == '*' || c == '•') bulletLines += 1
      }
      // "\.\.\.\s*$": one optional FINAL Unicode line terminator, then
      // trailing \s, then three dots
      var q = le - 1
      if (q >= ls) {
        val c = text.charAt(q)
        if (c == '\u0085' || c == '\u2028' || c == '\u2029') q -= 1
      }
      while (q >= ls && isWs(text.charAt(q))) q -= 1
      if (q - 2 >= ls && text.charAt(q) == '.' && text.charAt(q - 1) == '.' &&
          text.charAt(q - 2) == '.') ellipsisLines += 1
      ls = le + 1
    }

    val meanLen = if (nTok == 0) 0.0 else meanSum.toDouble / nTok.toDouble
    val symbolRatio =
      if (nTok == 0) 0.0
      else (hashCount.toDouble + (ellipsisMatches * 3).toDouble / 3.0) /
        nTok.toDouble
    val bulletRatio =
      if (nLines == 0) 0.0 else bulletLines.toDouble / nLines.toDouble
    val ellipsisLineRatio =
      if (nLines == 0) 0.0 else ellipsisLines.toDouble / nLines.toDouble
    val alphaRatio =
      if (nTok == 0) 0.0 else alphaToks.toDouble / nTok.toDouble
    new GenericInternalRow(Array[Any](
      nTok, meanLen, symbolRatio, bulletRatio, ellipsisLineRatio,
      alphaRatio, stopHits))
  }
}

/** gopher_stats(str) -> struct of the seven Gopher rule features (raw,
  * un-rounded ratios — the frame rounds, matching the Column `ratio()`). */
case class GopherStats(child: Expression, stopwords: Seq[String])
    extends UnaryExpression with Serializable {
  override def dataType: DataType = StructType(Seq(
    StructField("n_tokens", IntegerType, nullable = false),
    StructField("mean_word_len", DoubleType, nullable = false),
    StructField("symbol_word_ratio", DoubleType, nullable = false),
    StructField("bullet_line_ratio", DoubleType, nullable = false),
    StructField("ellipsis_line_ratio", DoubleType, nullable = false),
    StructField("alpha_word_ratio", DoubleType, nullable = false),
    StructField("n_stop_hits", IntegerType, nullable = false)))
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "gopher_stats"
  // first index per distinct value: array_intersect counts distinct
  // matched VALUES, so duplicate stopwords must not double-count
  @transient private lazy val stopIndex: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer]()
    stopwords.foreach(s => if (!m.containsKey(s)) m.put(s, m.size))
    m
  }
  override def nullSafeEval(v: Any): Any =
    GopherStatsKernel.eval(v.asInstanceOf[UTF8String], stopIndex,
      stopIndex.size)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // the stopword index rides along as a codegen reference object — the
    // kernel call stays inside whole-stage codegen like the other kernels
    val stops = ctx.addReferenceObj("gopherStops", stopIndex,
      "java.util.HashMap")
    val n = stopIndex.size
    defineCodeGen(ctx, ev,
      v => s"graft.functions.GopherStatsKernel.eval($v, $stops, $n)")
  }
  override protected def withNewChildInternal(c: Expression): GopherStats =
    copy(child = c)
}
