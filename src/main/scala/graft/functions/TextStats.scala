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
    val lower = trimmed.toLowerCase
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
