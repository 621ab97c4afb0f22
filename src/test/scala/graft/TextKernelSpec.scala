package graft

import graft.functions.TokenCountKernel
import graft.pipeline.TextOps
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import scala.util.Random

/** Bit-identity of the one-pass token-count and Gopher-feature kernels
  * against the pure-Column formulations they replace. The live queries run
  * the kernels; these fuzz tests pin them to the Column semantics the
  * DuckDB oracles encode — including the two corners that bit the span
  * dedup kernels in earlier rounds: SQL `trim` strips ONLY 0x20 spaces
  * (unlike Java `String.trim`), and Spark `split` is Java
  * `split(re, -1)`, so leading/trailing NON-SPACE whitespace runs each
  * yield an empty token that still counts in every denominator. */
class TextKernelSpec extends SparkSpec {
  import spark.implicits._

  /** Adversarial corpus: ws edges (tab/CR/VT at the ends survives SQL
    * trim), dot runs, bullets, Unicode line terminators (U+2028/U+0085 —
    * Java's non-MULTILINE `$` matches before a FINAL one), astral chars
    * (code points != UTF-16 units), dotted-capital-I (lowercases to TWO
    * chars), and stopwords in mixed case. */
  private val nasty: Seq[String] = Seq(
    "", " ", "  ", "\t", "\t\t", "\r\n", " \t hello \t ", "a", " a ",
    "\ta b\tc\r", "the THE The tHe", "of", " of\t", "...", "....",
    ".....", "......", "a...b... c ...", "line one...\nline two... \n...",
    "- bullet\n* star\n• dot\n  - indented\nplain",
    "ends with dots...\u2028", "dots then term...\u0085", "x...\u2029",
    "x...\u2028 ", "x... \u2028", "\u2028...", "### a # b ##",
    "😀 emoji 😀😀 tok",
    "İstanbul THE İ of", "café naïve",
    "a\u000Bb", "\u000B", "\u000Ba b\u000B", "  \u000B  ",
    "one\n\ntwo\n", "\n", "\n\n", "12345 678 9", "#.#.#...#",
    "the quick brown fox and the lazy dog", "- ...\n-...\n ...-")

  private val rnd = new Random(0xC0FFEE15L)
  private val atoms: Array[String] = Array(
    " ", " ", "\t", "\n", "\r", "\u000B", "\f", ".", "...", "#", "-", "*",
    "•", "\u2028", "\u0085", "\u2029", "a", "b", "Z", "9", "the",
    "The", "of", "AND", "😀", "İ", "é", "x.y",
    "word", "...", "\n- ", "...\n")
  private def randText(): String =
    (0 until rnd.nextInt(40)).map(_ => atoms(rnd.nextInt(atoms.length)))
      .mkString

  private val corpus: Seq[(Long, String)] =
    (nasty ++ (1 to 400).map(_ => randText())).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }

  test("TokenCountKernel == Java split(-1) of the space-trimmed text") {
    def ref(s: String): Int = {
      var lo = 0
      var hi = s.length
      while (lo < hi && s.charAt(lo) == ' ') lo += 1
      while (hi > lo && s.charAt(hi - 1) == ' ') hi -= 1
      val trimmed = s.substring(lo, hi)
      if (trimmed.isEmpty) 0 else trimmed.split("\\s+", -1).length
    }
    corpus.foreach { case (_, t) =>
      assert(TokenCountKernel.eval(UTF8String.fromString(t)) == ref(t),
        s"token count diverges on ${t.map(c => f"\\u${c.toInt}%04x")}")
    }
  }

  test("tokenCountNative == pure-Column tokenCount through Spark") {
    val df = corpus.toDF("doc_id", "text")
    val got = df.select(col("doc_id"),
        TextOps.tokenCountNative(col("text")).as("k"),
        TextOps.tokenCount(col("text")).as("c"))
      .collect()
    got.foreach { r =>
      assert(r.getInt(1) == r.getInt(2),
        s"doc ${r.getLong(0)}: kernel ${r.getInt(1)} != column ${r.getInt(2)}")
    }
  }

  test("gopherRules kernel frame == pure-Column reference frame") {
    val df = corpus.toDF("doc_id", "text")
    // thresholds chosen so both keep outcomes occur in the corpus; the
    // stopword list carries a duplicate and an EMPTY entry on purpose
    // (array_intersect counts distinct matched VALUES; an empty token from
    // an edge whitespace run lowers to "")
    val stops = Seq("the", "of", "and", "the", "")
    val a = TextOps.gopherRules(df, "doc_id", "text", minTokens = 2,
        minStopHits = 1, stopwords = stops)
      .orderBy("doc_id").collect().toSeq
    val b = TextOps.gopherRulesReference(df, "doc_id", "text", minTokens = 2,
        minStopHits = 1, stopwords = stops)
      .orderBy("doc_id").collect().toSeq
    assert(a.length == b.length)
    a.zip(b).foreach { case (ka, kb) =>
      assert(ka == kb, s"gopher frame diverges:\n kernel: $ka\n column: $kb")
    }
    // both keep outcomes actually exercised
    assert(a.exists(_.getAs[Int]("keep") == 1))
    assert(a.exists(_.getAs[Int]("keep") == 0))
  }

  test("gopherRules default-parameter frames agree on the nasty corpus") {
    val df = corpus.toDF("doc_id", "text")
    val a = TextOps.gopherRules(df, "doc_id", "text")
      .orderBy("doc_id").collect().toSeq
    val b = TextOps.gopherRulesReference(df, "doc_id", "text")
      .orderBy("doc_id").collect().toSeq
    assert(a == b)
  }

  /** BPE-pattern corners: contraction suffixes (matched and near-miss),
    * apostrophe runs, space-prefixed class switches, non-Nd Unicode
    * numbers (Nl/No — `\p{N}` but NOT Character.isDigit), supplementary
    * letters/digits (surrogate pairs), NBSP (Unicode ws but not Java
    * `\s`), and ASCII-ws singles. */
  private val bpeNasty: Seq[String] = Seq(
    "'s", "'t", "'re", "'ve", "'m", "'ll", "'d", "don't", "it's we'll",
    "they're I've I'm you'd", "'l", "'la", "'r", "'rex", "'v", "'vex",
    "can't've", "''", "'''s", "'", "x'", " '", " 'abc", "a'b", "'S", "'RE",
    "’s curly", "o’clock", " 's", "\t's", "' s", "'\t", "rock'n'roll",
    "123", " 123", "a1", "1a", "a 1", " a 1b2 ", "x,y.z", " ,.; ",
    "१२३ देवनागरी", "Ⅻ Ⅶ", "½ ¾", "²³", "⑩", "〡〢",
    " ", "a b", "   ", "𝔘𝔫𝔦𝔠𝔬𝔡𝔢", "𐍈𐍉", "𝟘𝟙𝟚",
    "😀's", "#'s", "mixed 𝔘p 𝟙23 ok", "  double  spaces  ",
    "tab\tsep", "nl\nsep", "cr\rsep", "\f")

  test("BpeCountKernel == java.util.regex match count of BpeIshPattern") {
    val p = java.util.regex.Pattern.compile(TextOps.BpeIshPattern)
    def ref(s: String): Int = {
      val m = p.matcher(s)
      var c = 0
      while (m.find()) c += 1
      c
    }
    (nasty ++ bpeNasty ++ (1 to 400).map(_ => randText())).foreach { t =>
      assert(graft.functions.BpeCountKernel.eval(UTF8String.fromString(t))
          == ref(t),
        s"bpe count diverges on ${t.map(c => f"\\u${c.toInt}%04x")}")
    }
  }

  test("bpeTokenCount kernel == regexp_count reference through Spark") {
    val df = (corpus ++ bpeNasty.zipWithIndex.map { case (t, i) =>
      (10000L + i, t) }).toDF("doc_id", "text")
    val got = df.select(col("doc_id"),
        TextOps.bpeTokenCount(col("text")).as("k"),
        TextOps.bpeTokenCountReference(col("text")).as("c"))
      .collect()
    got.foreach { r =>
      assert(r.getInt(1) == r.getInt(2),
        s"doc ${r.getLong(0)}: kernel ${r.getInt(1)} != regex ${r.getInt(2)}")
    }
  }
}
