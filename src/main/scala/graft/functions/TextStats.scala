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
