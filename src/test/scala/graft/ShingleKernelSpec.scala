package graft

import graft.functions.ShingleKernel
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

/** Bit-identity of the allocation-light dedupe kernels against straight
  * reimplementations of the String-pipeline originals (regex normalise +
  * boxed TreeSet). The kernels carry an ASCII fast path (single-pass
  * normalise, primitive open-addressing set) — these tests pin that fast
  * path and the non-ASCII fallback to the exact original semantics,
  * including the String.trim vs regex-\s asymmetry (trim drops ALL chars
  * <= U+0020 at the ends; \s is only [ \t\n\x0B\f\r]). */
class ShingleKernelSpec extends AnyFunSuite {

  private def refNorm(s: String): String =
    s.trim.toLowerCase(java.util.Locale.ROOT).replaceAll("\\s+", " ")

  private def fnv(s: CharSequence, from: Int, until: Int): Long = {
    var h = 0xcbf29ce484222325L
    var j = from
    while (j < until) { h ^= s.charAt(j); h *= 0x100000001b3L; j += 1 }
    h
  }

  private def refHashedShingles(s: String, q: Int): Seq[Long] = {
    val norm = refNorm(s)
    if (norm.isEmpty) return Seq.empty
    val set = new java.util.TreeSet[java.lang.Long]()
    val n = norm.length
    val last = if (n <= q) 0 else n - q
    (0 to last).foreach(i => set.add(fnv(norm, i, math.min(i + q, n))))
    import scala.jdk.CollectionConverters._
    set.asScala.toSeq.map(_.longValue)
  }

  private def refMinhash(s: String, q: Int, params: Array[Long]): Seq[Long] = {
    val norm = refNorm(s)
    val k = params.length / 2
    val mins = Array.fill(k)(Long.MaxValue)
    if (norm.nonEmpty) {
      val n = norm.length
      val seen = new java.util.HashSet[Long]()
      val last = if (n <= q) 0 else n - q
      (0 to last).foreach { i =>
        val h = fnv(norm, i, math.min(i + q, n))
        if (seen.add(h)) (0 until k).foreach { x =>
          val v = params(2 * x) * h + params(2 * x + 1)
          if (v < mins(x)) mins(x) = v
        }
      }
    }
    mins.toSeq
  }

  private def refHashedTokens(s: String): Seq[Long] = {
    val norm = s.trim.toLowerCase(java.util.Locale.ROOT)
    if (norm.isEmpty) return Seq.empty
    val set = new java.util.TreeSet[java.lang.Long]()
    norm.split("\\s+").filter(_.nonEmpty)
      .foreach(t => set.add(fnv(t, 0, t.length)))
    import scala.jdk.CollectionConverters._
    set.asScala.toSeq.map(_.longValue)
  }

  private def refShingleStrings(s: String, q: Int): Seq[String] = {
    val norm = refNorm(s)
    if (norm.isEmpty) return Seq.empty
    // round-trip through UTF8String like the kernel output does: a window
    // slicing a surrogate pair leaves a lone surrogate, which UTF8String
    // encodes as the replacement char — both kernel generations share that
    val rt = (x: String) => UTF8String.fromString(x).toString
    if (norm.length <= q) Seq(rt(norm))
    else {
      val out = new java.util.LinkedHashSet[String]()
      (0 to norm.length - q).foreach(i => out.add(rt(norm.substring(i, i + q))))
      import scala.jdk.CollectionConverters._
      out.asScala.toSeq
    }
  }

  private val adversarial = Seq(
    "", " ", "\t\n  \r", "a", "A", "  MiXeD   Case\tText  ",
    "x\u0001y", "\u0001leading ctrl", "trailing ctrl\u0001",
    "a\u0001 b", "b\u0001\tc", "double  space", "tab\tsep", "\u000Bvt\u000B",
    "exact", "sh", "ABCDEFGH", "aaaaaaaaaaaa",
    // leading/trailing tab/newline with >= 3 tokens: the exact shape where
    // String.trim (drops chars <= U+0020) and a space-only SQL trim diverge
    // -- pins the kernel side of the q_contamination oracle alignment
    "\tlead tab three tokens", "\nlead newline more tokens here",
    "trail tokens three\t", "\t\n both ends trimmed here \r\n",
    "\u0000nul lead three tokens",
    // non-ASCII: fallback path, incl. the length-changing lowercases
    // (U+0130 lowercases to "i" + combining dot = 2 chars; U+1E9E
    // lowercases to U+00DF; U+00DF itself is lowercase-stable)
    "STRA\u1e9eE gross strasse", "\u00df alone", "\u0130\u0130 DOTTED \u0130",
    "İstanbul", "ÅNGSTRÖM  värde", "日本語 テキスト", "emoji 😀 tail",
    "mixed ascii Ünïcode  runs", " nbsp is not regex space ")

  private def randomAscii(rng: Random, n: Int): String =
    (0 until n).map { _ =>
      val r = rng.nextInt(20)
      if (r < 2) ' '
      else if (r == 2) "\t\n\u000B\f\r\u0001\u0000".charAt(rng.nextInt(7))
      else ('0' + rng.nextInt(75)).toChar // digits..letters+punct, ASCII
    }.mkString

  private def randomUnicode(rng: Random, n: Int): String =
    (0 until n).map { _ =>
      rng.nextInt(5) match {
        case 0 => ' '
        case 1 => ('a' + rng.nextInt(26)).toChar
        case 2 => ('À' + rng.nextInt(100)).toChar
        case 3 => ('぀' + rng.nextInt(90)).toChar
        case _ => ('A' + rng.nextInt(26)).toChar
      }
    }.mkString

  private def allInputs: Seq[String] = {
    val rng = new Random(991)
    adversarial ++
      (1 to 150).map(_ => randomAscii(rng, rng.nextInt(60))) ++
      (1 to 80).map(_ => randomUnicode(rng, rng.nextInt(40)))
  }

  test("hashedShingles matches the String-pipeline reference") {
    for (s <- allInputs; q <- Seq(3, 5, 8)) {
      val got = ShingleKernel.hashedShingles(UTF8String.fromString(s), q)
        .toLongArray().toSeq
      assert(got == refHashedShingles(s, q), s"input=${s.take(40)} q=$q")
    }
  }

  test("minhash matches the String-pipeline reference") {
    val params = ShingleKernel.hashParams(16)
    for (s <- allInputs) {
      val got = ShingleKernel.minhash(UTF8String.fromString(s), 8, params)
        .toLongArray().toSeq
      assert(got == refMinhash(s, 8, params), s"input=${s.take(40)}")
    }
  }

  test("shinglesAndMinhash fused outputs match both references") {
    val params = ShingleKernel.hashParams(16)
    for (s <- allInputs) {
      val row = ShingleKernel.shinglesAndMinhash(UTF8String.fromString(s), 8, params)
      val toks = row.getArray(0).toLongArray().toSeq
      val sig = row.getArray(1).toLongArray().toSeq
      assert(toks == refHashedShingles(s, 8), s"toks input=${s.take(40)}")
      assert(sig == refMinhash(s, 8, params), s"sig input=${s.take(40)}")
    }
  }

  test("hashedTokens matches the String-pipeline reference") {
    for (s <- allInputs) {
      val got = ShingleKernel.hashedTokens(UTF8String.fromString(s))
        .toLongArray().toSeq
      assert(got == refHashedTokens(s), s"input=${s.take(40)}")
    }
  }

  test("string shingles match the String-pipeline reference (order kept)") {
    for (s <- allInputs; q <- Seq(4, 8)) {
      val got = ShingleKernel.shingles(UTF8String.fromString(s), q)
        .toObjectArray(org.apache.spark.sql.types.StringType)
        .map(_.toString).toSeq
      assert(got == refShingleStrings(s, q), s"input=${s.take(40)} q=$q")
    }
  }

  test("wordNgramHashes matches tokens -> join -> hash over strings") {
    // reference: the semantics of the Column chain it replaces (and of
    // the DuckDB oracle CTE): normalise, split on single spaces, slide a
    // window of n tokens, join with ' ', FNV-hash the joined string;
    // fewer than n tokens (incl. empty text) yields an empty array
    def ref(s: String, n: Int): Seq[Long] = {
      val norm = refNorm(s)
      if (norm.isEmpty) return Seq.empty
      val toks = norm.split(" ")
      if (toks.length < n) Seq.empty
      else toks.sliding(n).map(g => { val j = g.mkString(" "); fnv(j, 0, j.length) }).toSeq
    }
    for (s <- allInputs; n <- Seq(1, 2, 3, 4)) {
      val got = ShingleKernel.wordNgramHashes(UTF8String.fromString(s), n)
        .toLongArray().toSeq
      assert(got == ref(s, n), s"input=${s.take(40)} n=$n")
    }
  }

  // Spark-trim (spaces only) + Spark split = Java \s+ split with limit
  // -1 (leading AND trailing separator runs each yield one empty token),
  // the TextOps.tokens chain
  private def refTokens(s: String): Seq[String] = {
    var lo = 0
    while (lo < s.length && s.charAt(lo) == ' ') lo += 1
    var hi = s.length
    while (hi > lo && s.charAt(hi - 1) == ' ') hi -= 1
    val t = s.substring(lo, hi)
    if (t.isEmpty) Seq.empty else t.split("\\s+", -1).toSeq
  }

  private def fnvBytes(b: Array[Byte]): Long = {
    var h = 0xcbf29ce484222325L
    b.foreach { x => h ^= (x & 0xff); h *= 0x100000001b3L }
    h
  }

  test("tokenWindowHashes matches trim -> split -> window-fold reference") {
    def ref(s: String, k: Int): Seq[Long] = {
      // reference tokenizes the UTF8String round-trip of s, like the
      // kernel's byte view (lone surrogates become replacement chars)
      val toks = refTokens(UTF8String.fromString(s).toString)
      if (toks.length < k) Seq.empty
      else {
        val th = toks.map(t =>
          fnvBytes(t.getBytes(java.nio.charset.StandardCharsets.UTF_8)))
        th.sliding(k).map { w =>
          var h = 0xcbf29ce484222325L
          w.foreach { v =>
            var sh = 56
            while (sh >= 0) { h ^= (v >>> sh) & 0xffL; h *= 0x100000001b3L; sh -= 8 }
          }
          h
        }.toSeq
      }
    }
    for (s <- allInputs; k <- Seq(1, 2, 3, 10)) {
      val got = ShingleKernel.tokenWindowHashes(UTF8String.fromString(s), k)
        .toLongArray().toSeq
      assert(got == ref(s, k), s"input=${s.take(40)} k=$k")
    }
  }

  test("tokenTf matches lower -> split -> count (first-occurrence order)") {
    def ref(s: String): Seq[(String, Int)] = {
      val low = UTF8String.fromString(s).toLowerCase.toString
      val order = scala.collection.mutable.LinkedHashMap[String, Int]()
      refTokens(low).foreach(t => order(t) = order.getOrElse(t, 0) + 1)
      order.toSeq
    }
    for (s <- allInputs) {
      val arr = ShingleKernel.tokenTf(UTF8String.fromString(s))
      val got = (0 until arr.numElements()).map { i =>
        val r = arr.getStruct(i, 2)
        (r.getUTF8String(0).toString, r.getInt(1))
      }
      assert(got == ref(s), s"input=${s.take(40)}")
    }
  }

  test("winnow fingerprints: fast-path normalisation preserved") {
    // reference winnow over refNorm, mirroring the kernel's window scheme
    def refWinnow(s: String, q: Int, w: Int): Seq[Long] = {
      val norm = refNorm(s)
      if (norm.isEmpty) return Seq.empty
      val n = norm.length
      val last = if (n <= q) 0 else n - q
      val hs = (0 to last).map(i => fnv(norm, i, math.min(i + q, n))).toArray
      val sel = new java.util.TreeSet[java.lang.Long]()
      if (hs.length <= w) sel.add(hs.minBy(h => (h ^ Long.MinValue)))
      else (0 to hs.length - w).foreach { st =>
        sel.add(hs.slice(st, st + w).minBy(h => (h ^ Long.MinValue)))
      }
      import scala.jdk.CollectionConverters._
      sel.asScala.toSeq.map(_.longValue)
    }
    for (s <- allInputs) {
      val got = ShingleKernel.winnowFingerprints(UTF8String.fromString(s), 5, 4)
        .toLongArray().toSeq
      assert(got == refWinnow(s, 5, 4), s"input=${s.take(40)}")
    }
  }
}
