package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{Phonetics, StringSim}

class StringSimSpec extends AnyFunSuite {
  def approx(a: Double, b: Double): Boolean = math.abs(a - b) < 1e-3

  test("jaro known values") {
    assert(approx(StringSim.jaro("MARTHA", "MARHTA"), 0.9444))
    assert(approx(StringSim.jaro("DIXON", "DICKSONX"), 0.7667))
    assert(approx(StringSim.jaro("JELLYFISH", "SMELLYFISH"), 0.8963))
    assert(StringSim.jaro("", "") == 1.0)
    assert(StringSim.jaro("a", "") == 0.0)
    assert(StringSim.jaro("abc", "abc") == 1.0)
    assert(StringSim.jaro("abc", "xyz") == 0.0)
  }

  test("jaro-winkler known values") {
    assert(approx(StringSim.jaroWinkler("MARTHA", "MARHTA"), 0.9611))
    assert(approx(StringSim.jaroWinkler("DIXON", "DICKSONX"), 0.8133))
    assert(StringSim.jaroWinkler("abc", "abc") == 1.0)
  }

  test("damerau-levenshtein (unrestricted)") {
    assert(StringSim.damerauLevenshtein("abc", "abc") == 0)
    assert(StringSim.damerauLevenshtein("ab", "ba") == 1)
    assert(StringSim.damerauLevenshtein("CA", "ABC") == 2) // unrestricted < OSA's 3
    assert(StringSim.damerauLevenshtein("kitten", "sitting") == 3)
    assert(StringSim.damerauLevenshtein("", "abc") == 3)
    assert(StringSim.damerauLevenshtein("martha", "marhta") == 1)
  }

  test("banded levenshteinWithin agrees with the full DP on random strings") {
    def naiveLev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0
      }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    // fixed cases across the band boundaries
    assert(StringSim.levenshteinWithin("", "", 0))
    assert(StringSim.levenshteinWithin("", "abc", 3))
    assert(!StringSim.levenshteinWithin("", "abcd", 3))
    assert(StringSim.levenshteinWithin("kitten", "sitting", 3))
    assert(!StringSim.levenshteinWithin("kitten", "sitting", 2))
    assert(!StringSim.levenshteinWithin("abc", "abc", -1))
    // random fuzz: small alphabet forces near-matches; every (pair, d)
    // must agree with the unbanded full-matrix distance
    val rng = new scala.util.Random(7)
    def randStr() = {
      val n = rng.nextInt(25)
      (1 to n).map(_ => ('a' + rng.nextInt(4)).toChar).mkString
    }
    for (_ <- 1 to 2000) {
      val (a, b) = (randStr(), randStr())
      val exact = naiveLev(a, b)
      for (d <- 0 to 6) {
        assert(StringSim.levenshteinWithin(a, b, d) == (exact <= d),
          s"'$a' vs '$b' d=$d exact=$exact")
      }
    }
  }

  test("banded damerauLevenshteinWithin agrees with the full DP") {
    // fixed anchors including the unrestricted-vs-OSA separator
    assert(StringSim.damerauLevenshteinWithin("abc", "abc", 0))
    assert(StringSim.damerauLevenshteinWithin("ab", "ba", 1))
    assert(StringSim.damerauLevenshteinWithin("CA", "ABC", 2)) // unrestricted: 2
    assert(!StringSim.damerauLevenshteinWithin("CA", "ABC", 1))
    assert(StringSim.damerauLevenshteinWithin("kitten", "sitting", 3))
    assert(!StringSim.damerauLevenshteinWithin("kitten", "sitting", 2))
    assert(StringSim.damerauLevenshteinWithin("martha", "marhta", 1))
    assert(!StringSim.damerauLevenshteinWithin("abc", "abc", -1))
    assert(StringSim.damerauLevenshteinWithin("", "ab", 2))
    assert(!StringSim.damerauLevenshteinWithin("", "abc", 2))
    // random fuzz vs the full alphabet-mapped matrix: a TINY alphabet
    // maximises transposition density (the term banding must not break),
    // and d sweeps past the band width on both sides
    val rng = new scala.util.Random(13)
    def randStr(alpha: Int, maxLen: Int) = {
      val n = rng.nextInt(maxLen)
      (1 to n).map(_ => ('a' + rng.nextInt(alpha)).toChar).mkString
    }
    for (trial <- 1 to 3000) {
      val alpha = 2 + trial % 3
      val (a, b) = (randStr(alpha, 14), randStr(alpha, 14))
      val exact = StringSim.damerauLevenshtein(a, b)
      for (d <- 0 to 6) {
        assert(StringSim.damerauLevenshteinWithin(a, b, d) == (exact <= d),
          s"'$a' vs '$b' d=$d exact=$exact")
      }
    }
  }

  test("levenshteinWithinU8: code-point fallback and negative-bound guard") {
    import org.apache.spark.unsafe.types.UTF8String
    def u(s: String) = UTF8String.fromString(s)
    // a single astral (supplementary-plane) substitution is ONE edit,
    // matching Spark's code-point-counting built-in levenshtein — a
    // UTF-16 DP would see two surrogate-unit edits
    val astralA = "a𝕏b" // a 𝕏 b
    val astralB = "a𝕐b" // a 𝕐 b
    assert(StringSim.levenshteinWithinU8(u(astralA), u(astralB), 1))
    assert(!StringSim.levenshteinWithinU8(u(astralA), u(astralB), 0))
    // deleting one astral char is one edit
    assert(StringSim.levenshteinWithinU8(u("𝕏ab"), u("ab"), 1))
    // identical strings with a NEGATIVE bound: false on every path
    // (the equality fast path must not override d < 0)
    assert(!StringSim.levenshteinWithinU8(u("abc"), u("abc"), -1))
    assert(!StringSim.levenshteinWithinU8(u("café"), u("café"), -1))
    assert(StringSim.levenshteinWithinU8(u("abc"), u("abc"), 0))
    // BMP multi-byte still works through the code-point path
    assert(StringSim.levenshteinWithinU8(u("café"), u("cafe"), 1))
    assert(!StringSim.levenshteinWithinU8(u("café"), u("caxxé"), 1))
    // ASCII path parity with the CharSequence kernel
    val rng = new scala.util.Random(17)
    for (_ <- 1 to 500) {
      val a = (1 to rng.nextInt(12)).map(_ => ('a' + rng.nextInt(3)).toChar).mkString
      val b = (1 to rng.nextInt(12)).map(_ => ('a' + rng.nextInt(3)).toChar).mkString
      for (d <- 0 to 4)
        assert(StringSim.levenshteinWithinU8(u(a), u(b), d) ==
          StringSim.levenshteinWithin(a, b, d))
    }
  }

  test("damerauLevenshteinWithinU8 guards and parity") {
    import org.apache.spark.unsafe.types.UTF8String
    def u(s: String) = UTF8String.fromString(s)
    assert(!StringSim.damerauLevenshteinWithinU8(u("abc"), u("abc"), -1))
    assert(StringSim.damerauLevenshteinWithinU8(u("abc"), u("abc"), 0))
    assert(StringSim.damerauLevenshteinWithinU8(u("ab"), u("ba"), 1))
    // UTF-16 semantics on the non-ASCII fallback, matching the full
    // damerauLevenshtein (the reference's UDF is JVM-char based)
    assert(StringSim.damerauLevenshteinWithinU8(u("café"), u("café"), 0))
    assert(StringSim.damerauLevenshteinWithinU8(u("café"), u("cafe"), 1))
  }

  test("jaccardQgramU8 ASCII fast path is bit-identical to the String path") {
    import org.apache.spark.unsafe.types.UTF8String
    def u(s: String) = UTF8String.fromString(s)
    val rng = new scala.util.Random(23)
    def randStr(maxLen: Int) = {
      val n = rng.nextInt(maxLen)
      (1 to n).map(_ => ('a' + rng.nextInt(5)).toChar).mkString
    }
    // edge lengths 0/1/2 hit the whole-string-token branch on both paths
    val fixed = Seq("", "a", "ab", "ba", "aa", "abc", "night", "nacht")
    for (a <- fixed; b <- fixed; q <- Seq(1, 2))
      assert(StringSim.jaccardQgramU8(u(a), u(b), q) ==
        StringSim.jaccardQgram(a, b, q), s"'$a' vs '$b' q=$q")
    for (_ <- 1 to 2000) {
      val (a, b) = (randStr(20), randStr(20))
      for (q <- Seq(1, 2))
        assert(StringSim.jaccardQgramU8(u(a), u(b), q) ==
          StringSim.jaccardQgram(a, b, q), s"'$a' vs '$b' q=$q")
    }
    // non-ASCII falls back to the String path — exact same value
    assert(StringSim.jaccardQgramU8(u("café"), u("cafe"), 2) ==
      StringSim.jaccardQgram("café", "cafe", 2))
  }

  test("qgram jaccard") {
    assert(StringSim.jaccardQgram("abc", "abc", 2) == 1.0)
    // bigrams: {ab,bc} vs {ab,bd}: inter 1, union 3
    assert(approx(StringSim.jaccardQgram("abc", "abd", 2), 1.0 / 3.0))
    assert(StringSim.jaccardQgram("", "", 2) == 1.0)
    assert(StringSim.jaccardQgram("a", "", 2) == 0.0)
  }

  test("qgram tokenise") {
    assert(StringSim.qgramTokenise("abcd", 2) == "ab bc cd")
    assert(StringSim.qgramTokenise("ab", 2) == "ab")
    assert(StringSim.qgramTokenise("a", 2) == "a")
  }

  test("double metaphone basics") {
    assert(Phonetics.doubleMetaphone("SMITH") == Phonetics.doubleMetaphone("SMYTH")
      || Phonetics.doubleMetaphoneAlt("SMITH") == Phonetics.doubleMetaphoneAlt("SMYTH"))
    assert(Phonetics.doubleMetaphone("catherine") == Phonetics.doubleMetaphone("katherine"))
    assert(Phonetics.doubleMetaphone("JOHN").nonEmpty)
    assert(Phonetics.doubleMetaphone("") == "")
    assert(Phonetics.doubleMetaphone("PHONE") == Phonetics.doubleMetaphone("FONE"))
  }

  test("char-set jaccard (q=1) matches DuckDB's built-in jaccard") {
    // anchors computed with duckdb: SELECT jaccard(a, b)
    assert(StringSim.jaccardQgram("night", "nacht", 1) == 0.42857142857142855)
    assert(StringSim.jaccardQgram("DIXON", "DICKSONX", 1) == 0.625)
    assert(StringSim.jaccardQgram("sm", "smith", 1) == 0.4)
    assert(StringSim.jaccardQgram("night", "NIGHT", 1) == 0.0) // case-sensitive
    // deviation: duckdb ERRORS on empty input; a distributed scan returns
    assert(StringSim.jaccardQgram("", "x", 1) == 0.0)
    assert(StringSim.jaccardQgram("", "", 1) == 1.0)
  }

  test("classic metaphone against published encodings") {
    // vectors from the published rule table (Philips, Computer Language
    // 7(12) 1990): PH->F, silent GH, initial-X->S, terminal -GN silent
    assert(Phonetics.metaphone("Stephen") == "STFN")
    assert(Phonetics.metaphone("night") == "NT")
    assert(Phonetics.metaphone("knight") == "NT") // initial KN- drops K
    assert(Phonetics.metaphone("xerox") == "SRKS")
    assert(Phonetics.metaphone("phone") == "FN")
    assert(Phonetics.metaphone("school") == "SKL") // SCH -> SK
    assert(Phonetics.metaphone("science") == "SNS") // SCI: C silent
    assert(Phonetics.metaphone("judge") == "JJ") // -DGE -> J
    assert(Phonetics.metaphone("ghost") == "KST") // GH before vowel -> K
    assert(Phonetics.metaphone("thomas") == "0MS") // TH -> 0
    // G silences only in terminal -GN/-GNED, not before any N
    assert(Phonetics.metaphone("sign") == "SN")
    assert(Phonetics.metaphone("signed") == "SNT")
    assert(Phonetics.metaphone("magnet") == "MKNT")
    assert(Phonetics.metaphone("") == "")
    assert(Phonetics.metaphone(null) == "")
  }

  test("soundex") {
    assert(Phonetics.soundex("Robert") == "R163")
    assert(Phonetics.soundex("Rupert") == "R163")
    assert(Phonetics.soundex("Tymczak") == "T522")
    assert(Phonetics.soundex("Honeyman") == "H555")
  }

  test("winnowed fingerprints match an independent MOSS reference") {
    import org.apache.spark.unsafe.types.UTF8String
    // independent FNV-1a + winnow implementation (not the kernel's code)
    def fnv(s: String): Long =
      s.foldLeft(0xcbf29ce484222325L)((h, c) => (h ^ c) * 0x100000001b3L)
    def reference(text: String, q: Int, w: Int): Set[Long] = {
      val norm = text.trim.toLowerCase.replaceAll("\\s+", " ")
      if (norm.isEmpty) return Set.empty
      val grams =
        if (norm.length <= q) Seq(norm)
        else (0 to norm.length - q).map(i => norm.substring(i, i + q))
      val hs = grams.map(fnv)
      if (hs.length <= w) Set(hs.minBy(h => (h ^ Long.MinValue)))
      else hs.sliding(w).map(_.minBy(h => (h ^ Long.MinValue))).toSet
    }
    def kernel(text: String, q: Int, w: Int): Set[Long] = {
      val arr = graft.functions.ShingleKernel
        .winnowFingerprints(UTF8String.fromString(text), q, w)
      (0 until arr.numElements()).map(arr.getLong).toSet
    }
    val rnd = new scala.util.Random(3)
    val samples = Seq("", "ab", "the quick brown fox jumps over the lazy dog",
      "AAAA aaaa AAAA", "unicode: café naïve über") ++
      (1 to 20).map(_ => (1 to rnd.nextInt(60)).map(_ =>
        ('a' + rnd.nextInt(4)).toChar).mkString)
    for (s <- samples; (q, w) <- Seq((3, 4), (8, 4), (5, 2)))
      assert(kernel(s, q, w) == reference(s, q, w), s"text='$s' q=$q w=$w")
    // the MOSS guarantee: any shared substring of length >= w + q - 1
    // produces at least one shared fingerprint
    val a = "prefix material SHARED COMMON RUN OF TEXT trailing bits"
    val b = "other document start SHARED COMMON RUN OF TEXT and its end"
    assert((kernel(a, 5, 4) intersect kernel(b, 5, 4)).nonEmpty)
  }
}
