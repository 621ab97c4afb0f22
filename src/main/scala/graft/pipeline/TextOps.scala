package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Text-analysis operators for large-scale training-data pipelines:
 * tokenisation, quality scoring, language-ID heuristics, fingerprinting.
 * All pure `Column` compositions (codegen-friendly, no UDFs) so they
 * survive 100TB scans inside whole-stage codegen.
 */
object TextOps {

  /** Whitespace tokens of trimmed text ([] for blank). */
  def tokens(c: Column): Column =
    when(length(trim(c)) === 0, array().cast("array<string>"))
      .otherwise(split(trim(c), "\\s+"))

  def tokenCount(c: Column): Column = size(tokens(c))

  /** One-pass native token count — bit-identical to [[tokenCount]] (the
    * reference Column formulation it is fuzz-pinned against in
    * TextKernelSpec) without materialising the token array or running the
    * regex engine. Use in count-only scans (token budgeting, span-dedup
    * ratios, sequence packing). */
  def tokenCountNative(c: Column): Column =
    org.apache.spark.sql.GraftSqlBridge.column(graft.functions.TokenCount(
      org.apache.spark.sql.GraftSqlBridge.expression(c)))

  /** GPT-2-style pre-tokenizer pattern, lookahead-free so Java regex
    * (Spark) and RE2 (DuckDB/Go tooling) agree match-for-match:
    * contraction suffixes, space-prefixed letter/digit/punctuation runs,
    * then single whitespace. Counting its matches approximates the token
    * count a byte-pair encoder sees BEFORE merges — the standard cheap
    * stand-in for budgeting corpus token counts without shipping a
    * tokenizer model. */
  val BpeIshPattern: String =
    "'(?:s|t|re|ve|m|ll|d)| ?\\p{L}+| ?\\p{N}+| ?[^\\s\\p{L}\\p{N}]+|\\s"

  /** BPE-ish token count of a text column (see [[BpeIshPattern]]) — the
    * count-only [[graft.functions.BpeCount]] kernel. `regexp_count`
    * physically expands to `size(regexp_extract_all(...))`, materialising
    * every match into an array that is discarded for its size; the kernel
    * walks code points once with no allocation. Bit-identical to
    * [[bpeTokenCountReference]] (fuzz-pinned in TextKernelSpec). */
  def bpeTokenCount(c: Column): Column =
    org.apache.spark.sql.GraftSqlBridge.column(graft.functions.BpeCount(
      org.apache.spark.sql.GraftSqlBridge.expression(c)))

  /** The regex-engine formulation of [[bpeTokenCount]] — the semantics
    * contract the kernel is fuzz-pinned against. */
  private[graft] def bpeTokenCountReference(c: Column): Column =
    regexp_count(c, lit(BpeIshPattern))

  /** Corpus token budgeting: whitespace tokens, BPE-ish pre-tokens,
    * characters, and characters-per-pre-token — one codegen'd scan. */
  def tokenCounts(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val c = col(textCol)
    df.select(col(idCol),
      tokenCountNative(c).cast("bigint").as("ws_tokens"),
      bpeTokenCount(c).cast("bigint").as("bpe_tokens"),
      length(c).cast("bigint").as("n_chars"))
      .withColumn("chars_per_token",
        round(when(col("bpe_tokens") === 0, 0.0)
          .otherwise(col("n_chars").cast("double") / col("bpe_tokens")), 9))
  }

  /** Punctuation character ratio (0 for empty). */
  def punctRatio(c: Column): Column = {
    val punct = length(c) - length(regexp_replace(c, "[.,;:!?]", ""))
    when(length(c) === 0, lit(0.0))
      .otherwise(punct.cast("double") / length(c))
  }

  val EnglishStopwords: Seq[String] =
    Seq("the", "a", "an", "of", "to", "and", "in", "is", "it", "that", "or")

  /** Fraction of tokens that are (lowercase) stopwords. */
  def stopwordRatio(c: Column, stops: Seq[String] = EnglishStopwords): Column = {
    val toks = tokens(lower(c))
    val hits = size(filter(toks, t => t.isInCollection(stops)))
    when(size(toks) === 0, lit(0.0))
      .otherwise(hits.cast("double") / size(toks))
  }

  /** Mean token length (0 for blank) — crude fluency signal. */
  def meanTokenLen(c: Column): Column = {
    val toks = tokens(c)
    when(size(toks) === 0, lit(0.0))
      .otherwise(aggregate(toks, lit(0), (acc, t) => acc + length(t)).cast("double") /
        size(toks))
  }

  /** Composite quality score in [0,1]: length band + stopword presence +
    * punctuation sanity. Deterministic, documented formula (the usual
    * C4/Gopher-style heuristic family). */
  def qualityScore(c: Column): Column = {
    val nTok = tokenCount(c)
    val lenOk = when(nTok.between(10, 10000), lit(0.4)).otherwise(lit(0.0))
    val stopOk = when(stopwordRatio(c) > 0.05, lit(0.3)).otherwise(lit(0.0))
    val punctOk = when(punctRatio(c) < 0.2, lit(0.3)).otherwise(lit(0.0))
    lenOk + stopOk + punctOk
  }

  private val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to"),
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "fr" -> Seq("le", "la", "et", "les", "des"),
    "es" -> Seq("el", "los", "de", "y", "que"))

  /** N-gram/stopword language-ID heuristic: argmax of per-language marker
    * hits, ties broken by fixed language order ('en' first), 'und'
    * (undetermined) when nothing matches. */
  def langGuess(c: Column): Column = {
    val toks = tokens(lower(c))
    val scores = langMarkers.map { case (lang, markers) =>
      lang -> size(filter(toks, t => t.isInCollection(markers)))
    }
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    scores.reverse.foldLeft(lit("und")) { case (acc, (lang, s)) =>
      when(s === best && best > 0, lit(lang)).otherwise(acc)
    }
  }

  /** Stable 64-bit-hex document fingerprint over whitespace-normalised
    * lowercase text (md5-derived — portable across engines). */
  def fingerprint(c: Column): Column =
    substring(md5(lower(regexp_replace(trim(c), "\\s+", " "))), 1, 16)

  /** Portable deterministic hash to [0, 2^32): md5 prefix as bigint.
    * Unlike `hash()`, the value is reproducible in any engine with md5 —
    * used for sampling parity with external oracles (the reference pins a
    * deterministic hash sample for the same reason, `dialects.py:177-206`). */
  def portableHash(c: Column): Column =
    conv(substring(md5(c.cast("string")), 1, 8), 16, 10).cast("bigint")

  /** Deterministic proportion sample: keep rows with hash < p * 2^32. */
  def hashSample(c: Column, proportion: Double): Column =
    portableHash(c) < (proportion * 4294967296.0).toLong

  /** All text metrics as named columns, one pass. */
  def allMetrics(c: Column): Seq[(String, Column)] = Seq(
    "n_tokens" -> tokenCount(c),
    "n_chars" -> length(c),
    "punct_ratio" -> round(punctRatio(c), 9),
    "stopword_ratio" -> round(stopwordRatio(c), 9),
    "quality" -> round(qualityScore(c), 9),
    "lang_guess" -> langGuess(c),
    "fingerprint" -> fingerprint(c))

  /** Gopher-style rule-based quality gate (Rae et al. 2021,
    * "Scaling Language Models: Methods, Analysis & Insights from Training
    * Gopher", appendix A1.1 — the published heuristic set most pretraining
    * pipelines start from): per-document features for each rule plus the
    * conjunction verdict. Thresholds are the paper's defaults,
    * parameterised. Ratios are 9dp-rounded BEFORE thresholding so the
    * verdict is engine-portable.
    *
    * One scan, no shuffle, via the one-pass [[graft.functions.GopherStats]]
    * kernel (the pure-Column formulation, kept below as
    * [[gopherRulesReference]] and fuzz-pinned bit-identical in
    * TextKernelSpec, pays ~7 interpreted higher-order passes plus three
    * regex engines per document — at 100 TB that is the whole corpus scan
    * budget).
    */
  def gopherRules(df: DataFrame, idCol: String, textCol: String,
      minTokens: Long = 50, maxTokens: Long = 100000,
      minMeanWordLen: Double = 3.0, maxMeanWordLen: Double = 10.0,
      maxSymbolWordRatio: Double = 0.1, maxBulletLineRatio: Double = 0.9,
      maxEllipsisLineRatio: Double = 0.3, minAlphaWordRatio: Double = 0.8,
      minStopHits: Int = 2,
      stopwords: Seq[String] =
        Seq("the", "be", "to", "of", "and", "that", "have", "with"))
      : DataFrame = {
    val stats = org.apache.spark.sql.GraftSqlBridge.column(
      graft.functions.GopherStats(
        org.apache.spark.sql.GraftSqlBridge.expression(col(textCol)),
        stopwords))
    val feats = df.select(col(idCol), stats.as("__g"))
      .select(col(idCol),
        col("__g.n_tokens").cast("bigint").as("n_tokens"),
        round(col("__g.mean_word_len"), 9).as("mean_word_len"),
        round(col("__g.symbol_word_ratio"), 9).as("symbol_word_ratio"),
        round(col("__g.bullet_line_ratio"), 9).as("bullet_line_ratio"),
        round(col("__g.ellipsis_line_ratio"), 9).as("ellipsis_line_ratio"),
        round(col("__g.alpha_word_ratio"), 9).as("alpha_word_ratio"),
        col("__g.n_stop_hits").cast("bigint").as("n_stop_hits"))
    withGopherKeep(feats, minTokens, maxTokens, minMeanWordLen,
      maxMeanWordLen, maxSymbolWordRatio, maxBulletLineRatio,
      maxEllipsisLineRatio, minAlphaWordRatio, minStopHits)
  }

  /** The conjunction verdict over the (already 9dp-rounded) rule features —
    * shared by the kernel path and the reference formulation. */
  private def withGopherKeep(feats: DataFrame,
      minTokens: Long, maxTokens: Long,
      minMeanWordLen: Double, maxMeanWordLen: Double,
      maxSymbolWordRatio: Double, maxBulletLineRatio: Double,
      maxEllipsisLineRatio: Double, minAlphaWordRatio: Double,
      minStopHits: Int): DataFrame =
    feats.withColumn("keep",
      (col("n_tokens").between(minTokens, maxTokens) &&
        col("mean_word_len").between(minMeanWordLen, maxMeanWordLen) &&
        col("symbol_word_ratio") < maxSymbolWordRatio &&
        col("bullet_line_ratio") < maxBulletLineRatio &&
        col("ellipsis_line_ratio") < maxEllipsisLineRatio &&
        col("alpha_word_ratio") > minAlphaWordRatio &&
        col("n_stop_hits") >= minStopHits).cast("int"))

  /** The pure-Column reference formulation of [[gopherRules]] — the
    * semantics contract the kernel is fuzz-pinned against (and the shape a
    * SQL-only engine would run). Interpreted higher-order functions; do not
    * use on a full corpus scan. */
  private[graft] def gopherRulesReference(df: DataFrame, idCol: String,
      textCol: String,
      minTokens: Long = 50, maxTokens: Long = 100000,
      minMeanWordLen: Double = 3.0, maxMeanWordLen: Double = 10.0,
      maxSymbolWordRatio: Double = 0.1, maxBulletLineRatio: Double = 0.9,
      maxEllipsisLineRatio: Double = 0.3, minAlphaWordRatio: Double = 0.8,
      minStopHits: Int = 2,
      stopwords: Seq[String] =
        Seq("the", "be", "to", "of", "and", "that", "have", "with"))
      : DataFrame = {
    val c = col(textCol)
    val t = tokens(c)
    val lines = split(c, "\n")
    def ratio(num: Column, den: Column): Column =
      round(when(den === 0, 0.0).otherwise(num.cast("double") / den), 9)
    val nTok = size(t)
    val meanLen = ratio(aggregate(t, lit(0), (acc, x) => acc + length(x)), nTok)
    val hashCount = length(c) - length(translate(c, "#", ""))
    val ellipsisCount = (length(c) -
      length(regexp_replace(c, "\\.\\.\\.", ""))) / 3
    val symbolRatio = ratio(hashCount + ellipsisCount, nTok)
    val bulletRatio = ratio(
      size(filter(lines, l => l.rlike("^\\s*[-*•]"))), size(lines))
    val ellipsisLineRatio = ratio(
      size(filter(lines, l => l.rlike("\\.\\.\\.\\s*$"))), size(lines))
    val alphaRatio = ratio(
      size(filter(t, x => x.rlike("[A-Za-z]"))), nTok)
    val stopHits = size(array_intersect(
      array_distinct(transform(t, x => lower(x))),
      array(stopwords.map(lit): _*))).cast("bigint")
    df.select(col(idCol),
        nTok.cast("bigint").as("n_tokens"),
        meanLen.as("mean_word_len"),
        symbolRatio.as("symbol_word_ratio"),
        bulletRatio.as("bullet_line_ratio"),
        ellipsisLineRatio.as("ellipsis_line_ratio"),
        alphaRatio.as("alpha_word_ratio"),
        stopHits.as("n_stop_hits"))
      .withColumn("keep",
        (col("n_tokens").between(minTokens, maxTokens) &&
          col("mean_word_len").between(minMeanWordLen, maxMeanWordLen) &&
          col("symbol_word_ratio") < maxSymbolWordRatio &&
          col("bullet_line_ratio") < maxBulletLineRatio &&
          col("ellipsis_line_ratio") < maxEllipsisLineRatio &&
          col("alpha_word_ratio") > minAlphaWordRatio &&
          col("n_stop_hits") >= minStopHits).cast("int"))
  }

  /** Model-based quality filtering — the classifier stage of a pretraining
    * pipeline (a linear stand-in for the usual fastText/logreg scorer;
    * weights come from the caller, e.g. distilled offline from labels).
    * The score is a linear form over the 9dp-rounded one-pass features in
    * a FIXED term order, so any engine reproduces the decision
    * bit-for-bit; `keep` thresholds the raw score (logistic is monotone,
    * so thresholding the linear score is thresholding the probability).
    * One codegen'd scan, no shuffle — the right shape for a 100 TB corpus.
    *
    * @param weights per-feature weights over
    *                n_tokens / n_chars / punct_ratio / stopword_ratio
    */
  def qualityClassify(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, weights: Map[String, Double], bias: Double,
      threshold: Double): org.apache.spark.sql.DataFrame = {
    val feats = metricsFrame(df, textCol, Seq(idCol))
    val order = Seq("n_tokens", "n_chars", "punct_ratio", "stopword_ratio")
    val score = order.foldLeft(lit(bias)) { (acc, f) =>
      acc + col(f) * lit(weights.getOrElse(f, 0.0)) }
    feats.select(col(idCol), score.as("__z"))
      .select(col(idCol), round(col("__z"), 9).as("score"),
        (col("__z") >= threshold).cast("int").as("keep"))
  }

  /** All seven metrics via the one-pass native kernel
    * ([[graft.functions.TextStats]]): the pure-Column formulation leans on
    * higher-order functions, which Spark evaluates interpreted — at 100TB
    * that is the difference between one cheap scan and a ~50x slower one.
    * Output is identical to [[allMetrics]]. */
  def metricsFrame(df: org.apache.spark.sql.DataFrame, textCol: String,
      keep: Seq[String]): org.apache.spark.sql.DataFrame = {
    val stats = org.apache.spark.sql.GraftSqlBridge.column(
      graft.functions.TextStats(
        org.apache.spark.sql.GraftSqlBridge.expression(col(textCol))))
    df.select((keep.map(col) :+ stats.as("__m")): _*)
      .select((keep.map(col) :+
        col("__m.n_tokens").as("n_tokens") :+
        col("__m.n_chars").as("n_chars") :+
        round(col("__m.punct_ratio"), 9).as("punct_ratio") :+
        round(col("__m.stopword_ratio"), 9).as("stopword_ratio") :+
        round(col("__m.quality"), 9).as("quality") :+
        col("__m.lang_guess").as("lang_guess") :+
        col("__m.fingerprint").as("fingerprint")): _*)
  }
}
