package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Corpus-level operators a large-scale training-data pipeline needs beyond
 * per-document text stats: benchmark decontamination (word-n-gram overlap),
 * TF-IDF keyword extraction, sliding-window chunking for embedding
 * pipelines, PII detection/redaction, and repetition-based quality metrics.
 *
 * Scale shape: every op is a single scan plus at most one shuffle keyed on
 * the document id (TF-IDF adds one term-keyed shuffle for document
 * frequencies); the probe set in [[contaminationReport]] is broadcast, so
 * the 100 TB corpus never reshuffles for decontamination.
 */
object CorpusOps {

  /** Word n-grams of the whitespace-tokenised text, joined by single
    * spaces; [] when the text has fewer than n tokens. */
  def wordNgrams(c: Column, n: Int): Column = {
    val toks = TextOps.tokens(c)
    when(size(toks) < n, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(0), size(toks) - n),
        i => array_join(slice(toks, i + 1, lit(n)), " ")))
  }

  /**
   * Benchmark-decontamination report: for every corpus document, how many
   * of its word n-grams (total and distinct) also appear in the probe
   * (benchmark) collection. Docs with zero overlap are kept with 0 counts
   * so the result is a complete filter column.
   *
   * The distinct probe n-gram set is broadcast — a benchmark suite is tiny
   * next to a training corpus — so the corpus side is one scan + one
   * doc-keyed aggregation, no corpus shuffle on the n-gram key.
   */
  def contaminationReport(corpus: DataFrame, idCol: String, textCol: String,
      probes: DataFrame, probeTextCol: String, n: Int): DataFrame = {
    val probeGrams = probes
      .select(explode(wordNgrams(lower(col(probeTextCol)), n)).as("gram"))
      .distinct()
    val corpusGrams = corpus.select(col(idCol),
        explode(wordNgrams(lower(col(textCol)), n)).as("gram"))
    val hits = corpusGrams.join(broadcast(probeGrams), Seq("gram"))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_hits"),
        count_distinct(col("gram")).as("n_distinct_hits"))
    corpus.select(col(idCol))
      .join(hits, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        coalesce(col("n_distinct_hits"), lit(0L)).as("n_distinct_hits"))
  }

  /**
   * Top-k TF-IDF keywords per document. Rank is fully integer-deterministic
   * (term frequency desc, document frequency asc, term asc) so results are
   * reproducible across engines; the reported score is the standard
   * smoothed tf-idf `tf * (ln((N+1)/(df+1)) + 1)`.
   *
   * Two shuffles total: (doc, term) aggregation, then term-keyed document
   * frequencies joined back (broadcast when small). The per-doc top-k
   * window partitions on the doc id — no global sort.
   */
  def tfidfTopK(df: DataFrame, idCol: String, textCol: String,
      k: Int): DataFrame = {
    val docTerms = df
      .select(col(idCol), explode(TextOps.tokens(lower(col(textCol)))).as("term"))
      .groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).as("tf"))
    val docFreq = docTerms.groupBy("term")
      .agg(count(lit(1)).as("doc_freq"))
    val total = df.agg(count(lit(1)).as("__n"))
    val w = Window.partitionBy(idCol)
      .orderBy(col("tf").desc, col("doc_freq").asc, col("term").asc)
    docTerms
      .join(docFreq, Seq("term"))
      .crossJoin(broadcast(total))
      .withColumn("score", round(col("tf") *
        (log((col("__n") + 1).cast("double") / (col("doc_freq") + 1)) + 1.0), 9))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(idCol), col("term"), col("tf"), col("doc_freq"),
        col("score"), col("rank"))
  }

  /**
   * Sliding-window character chunking for embedding pipelines: windows of
   * `size` chars every `stride` chars (stride <= size gives overlap), final
   * partial window kept. Empty documents produce no chunks. Pure per-row
   * explode — embarrassingly parallel, no shuffle.
   */
  def chunkDocuments(df: DataFrame, idCol: String, textCol: String,
      size: Int, stride: Int): DataFrame = {
    require(stride >= 1 && size >= 1, "size and stride must be >= 1")
    val len = length(col(textCol))
    val nChunks = (lit(1) +
      ceil(greatest(len - size, lit(0)).cast("double") / stride)).cast("int")
    df.filter(len > 0)
      .select(col(idCol), col(textCol),
        posexplode(sequence(lit(0), nChunks - 1)).as(Seq("chunk_id", "__i")))
      .select(col(idCol), col("chunk_id"),
        col(textCol).substr(col("chunk_id") * stride + 1, lit(size))
          .as("chunk_text"))
      .withColumn("chunk_chars", length(col("chunk_text")))
  }

  // ---- PII detection ----------------------------------------------------
  // Patterns stay in the common Java-regex / RE2 subset (no lookaround, no
  // backreferences) so external engines can replay the counts exactly.
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Pattern = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"
  val PhonePattern = "\\+[0-9]{2}[0-9 -]{7,12}[0-9]"
  val SsnPattern = "\\b[0-9]{3}-[0-9]{2}-[0-9]{4}\\b"

  private val piiPatterns = Seq(
    "n_emails" -> EmailPattern, "n_ipv4" -> Ipv4Pattern,
    "n_phones" -> PhonePattern, "n_ssn" -> SsnPattern)

  /** Per-kind non-overlapping PII match counts plus an `any_pii` flag. */
  def piiCounts(c: Column): Seq[(String, Column)] = {
    val counts = piiPatterns.map { case (name, pat) =>
      name -> regexp_count(c, lit(pat))
    }
    counts :+ ("any_pii" -> counts.map(_._2).reduce(_ + _).>(0))
  }

  /** Text with every PII match replaced by a typed placeholder. */
  def redactPii(c: Column): Column =
    Seq(EmailPattern -> "<EMAIL>", Ipv4Pattern -> "<IP>",
      PhonePattern -> "<PHONE>", SsnPattern -> "<SSN>")
      .foldLeft(c) { case (acc, (pat, tag)) => regexp_replace(acc, pat, tag) }

  // ---- repetition / quality metrics ------------------------------------

  /** Fraction of tokens that are repeats of an earlier token (0 if empty). */
  def dupTokenRatio(c: Column): Column = {
    val toks = TextOps.tokens(lower(c))
    when(size(toks) === 0, lit(0.0))
      .otherwise((size(toks) - size(array_distinct(toks))).cast("double") /
        size(toks))
  }

  /** Fraction of word bigrams that are repeats — catches repeated phrases
    * that token-level dedup misses (boilerplate, chorus lines). */
  def dupBigramRatio(c: Column): Column = {
    val grams = wordNgrams(lower(c), 2)
    when(size(grams) === 0, lit(0.0))
      .otherwise((size(grams) - size(array_distinct(grams))).cast("double") /
        size(grams))
  }

  /** Length of the longest whitespace token (0 if empty) — flags
    * base64/URL junk that inflates token counts. */
  def maxWordLen(c: Column): Column = {
    val toks = TextOps.tokens(c)
    when(size(toks) === 0, lit(0))
      .otherwise(array_max(transform(toks, t => length(t))))
  }

  /** Fraction of characters that are ASCII digits (0 for empty text). */
  def digitRatio(c: Column): Column =
    when(length(c) === 0, lit(0.0))
      .otherwise((length(c) - length(regexp_replace(c, "[0-9]", "")))
        .cast("double") / length(c))

  // ---- sequence packing / corpus mixing ---------------------------------

  /**
   * Pack documents into fixed token-budget training sequences, GPT-style:
   * concatenate documents in a deterministic order and cut every `budget`
   * tokens; a document is assigned to the sequence where its first token
   * falls (it may straddle the boundary — exactly what concat-then-chunk
   * pretraining pipelines do).
   *
   * Global concatenation order would serialise the corpus through one
   * task, so documents are first spread over `numBuckets` independent
   * streams by a PORTABLE hash of the id (md5-derived — any engine can
   * replay the assignment) and packed per stream: one shuffle keyed on the
   * bucket, cumulative sum per bucket, no global sort. At 100 TB pick
   * numBuckets ~ executors so each stream packs in parallel.
   *
   * Output: (doc_id, bucket, n_tokens, seq_id, seq_offset) — all integers,
   * so cross-engine comparison is exact.
   */
  def packSequences(df: DataFrame, idCol: String, textCol: String,
      budget: Int, numBuckets: Int): DataFrame = {
    require(budget >= 1 && numBuckets >= 1, "budget and numBuckets must be >= 1")
    val base = df.select(col(idCol).as("doc_id"),
      TextOps.tokenCount(col(textCol)).cast("bigint").as("n_tokens"),
      (TextOps.portableHash(col(idCol)) % numBuckets).as("bucket"))
    val w = Window.partitionBy("bucket").orderBy("doc_id")
    val start = sum(col("n_tokens")).over(w) - col("n_tokens")
    base.select(col("doc_id"), col("bucket"), col("n_tokens"),
      floor(start / budget).cast("bigint").as("seq_id"),
      (start % budget).as("seq_offset"))
  }

  /**
   * Deterministic weighted corpus mixing: keep each row with a per-group
   * sampling rate (domain/source weighting for training-data mixes). The
   * portable md5 hash makes the sample reproducible across engines and
   * runs; a pure filter, no shuffle, fully pushdown-friendly.
   *
   * Use rates that are exact multiples of 2^-32 (0.5, 0.25, 0.125, ...) if
   * an external engine must replay the cut EXACTLY: the threshold
   * `rate * 2^32` is then an exact integer in both engines.
   */
  def weightedSample(df: DataFrame, idCol: String, groupCol: String,
      rates: Map[String, Double], defaultRate: Double): DataFrame = {
    val rateCol = rates.foldLeft(lit(defaultRate)) {
      case (acc, (k, v)) => when(col(groupCol) === k, lit(v)).otherwise(acc)
    }
    df.filter(TextOps.portableHash(col(idCol)) <
      (rateCol * 4294967296.0).cast("bigint"))
  }
}
