package graft.functions

/**
 * Pure-JVM string similarity kernels used by the Catalyst expressions in
 * [[graft.functions.expressions]]. These mirror the function surface the
 * reference exposes through its Spark UDF jar (reference:
 * `splink/internals/spark/jar_location.py:40-63` — jaro_sim, jaro_winkler,
 * jaccard, damerau_levenshtein, Dmetaphone, QgramTokeniser), implemented
 * from the published algorithm definitions, not from the reference jar.
 *
 * All methods are static (object) so generated codegen can call them via a
 * stable class name: `graft.functions.StringSim.jaroWinkler(a, b)`.
 */
object StringSim {

  /** CharSequence view over an ASCII UTF8String — no String allocation.
    * Only valid when every byte is ASCII (checked by [[cs]]). */
  private final class AsciiSeq(u: org.apache.spark.unsafe.types.UTF8String)
      extends CharSequence {
    override val length: Int = u.numBytes()
    override def charAt(i: Int): Char = (u.getByte(i) & 0x7F).toChar
    override def subSequence(s: Int, e: Int): CharSequence =
      u.substring(s, e).toString
    override def toString: String = u.toString
  }

  /** Cheap zero-copy view for ASCII inputs; falls back to toString for
    * multi-byte UTF-8 (where byte != char). */
  def cs(u: org.apache.spark.unsafe.types.UTF8String): CharSequence = {
    val n = u.numBytes()
    var i = 0
    while (i < n) {
      if (u.getByte(i) < 0) return u.toString
      i += 1
    }
    new AsciiSeq(u)
  }

  /** `levenshtein(s1, s2) <= d`, decided with a BANDED two-row DP
    * (Ukkonen's cutoff: a cell with |i-j| > d can never be <= d, so only
    * the 2d+1-wide diagonal band is computed) plus a row-minimum early
    * exit. The exit is valid because the band's row minimum is monotone
    * non-decreasing down the matrix: every in-band cell of row i is
    * min(prev(j-1)+cost, prev(j)+1, cur(j-1)+1), each term >= the row
    * i-1 band minimum (the in-row ins chain bottoms out at a prev-row
    * seed), so once a whole band row exceeds d no later row can recover.
    * (Individual cells are NOT monotone down a column — only the band
    * row-min is.) For the bounded predicates the comparison levels
    * actually ask (d of 1-4 on names), this does O(n*d) work instead of
    * the full O(n*m) matrix — measured 5x+ per pair against the built-in
    * full DP on the EM/predict gamma hot path at 90M pairs. */
  def levenshteinWithin(s1: CharSequence, s2: CharSequence, dIn: Int): Boolean = {
    if (dIn < 0) return false
    var a = s1
    var b = s2
    if (a.length > b.length) { val t = a; a = b; b = t }
    val n = a.length
    val m = b.length
    val d = dIn
    if (m - n > d) return false
    if (n == 0) return m <= d
    val inf = d + 1
    var prev = new Array[Int](m + 1)
    var cur = new Array[Int](m + 1)
    var j = 0
    while (j <= m) { prev(j) = if (j <= d) j else inf; j += 1 }
    var i = 1
    while (i <= n) {
      val lo = if (i > d) i - d else 1
      val hi = if (i + d < m) i + d else m
      cur(0) = if (i <= d) i else inf
      if (lo > 1) cur(lo - 1) = inf
      var best = inf
      val ca = a.charAt(i - 1)
      j = lo
      while (j <= hi) {
        val cost = if (ca == b.charAt(j - 1)) 0 else 1
        var v = prev(j - 1) + cost
        val del = prev(j) + 1
        if (del < v) v = del
        val ins = cur(j - 1) + 1
        if (ins < v) v = ins
        cur(j) = if (v > inf) inf else v
        if (v < best) best = v
        j += 1
      }
      if (hi < m) cur(hi + 1) = inf
      if (best > d) return false
      val t = prev; prev = cur; cur = t
      i += 1
    }
    prev(m) <= d
  }

  /** [[levenshteinWithin]] over CODE POINTS (Int alphabet) — the
    * non-ASCII fallback of [[levenshteinWithinU8]]. Spark's built-in
    * `levenshtein` counts full Unicode characters, so a single astral
    * (supplementary-plane) substitution must count as ONE edit; a
    * UTF-16 CharSequence DP would count its two surrogate units as two
    * edits and could flip a gamma level vs the reference. Identical
    * banded algorithm, identical early exit. */
  def levenshteinWithinInts(a0: Array[Int], b0: Array[Int], dIn: Int): Boolean = {
    if (dIn < 0) return false
    var a = a0
    var b = b0
    if (a.length > b.length) { val t = a; a = b; b = t }
    val n = a.length
    val m = b.length
    val d = dIn
    if (m - n > d) return false
    if (n == 0) return m <= d
    val inf = d + 1
    var prev = new Array[Int](m + 1)
    var cur = new Array[Int](m + 1)
    var j = 0
    while (j <= m) { prev(j) = if (j <= d) j else inf; j += 1 }
    var i = 1
    while (i <= n) {
      val lo = if (i > d) i - d else 1
      val hi = if (i + d < m) i + d else m
      cur(0) = if (i <= d) i else inf
      if (lo > 1) cur(lo - 1) = inf
      var best = inf
      val ca = a(i - 1)
      j = lo
      while (j <= hi) {
        val cost = if (ca == b(j - 1)) 0 else 1
        var v = prev(j - 1) + cost
        val del = prev(j) + 1
        if (del < v) v = del
        val ins = cur(j - 1) + 1
        if (ins < v) v = ins
        cur(j) = if (v > inf) inf else v
        if (v < best) best = v
        j += 1
      }
      if (hi < m) cur(hi + 1) = inf
      if (best > d) return false
      val t = prev; prev = cur; cur = t
      i += 1
    }
    prev(m) <= d
  }

  private def codePointArray(s: String): Array[Int] = {
    val out = new Array[Int](s.codePointCount(0, s.length))
    var i = 0
    var k = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      out(k) = cp
      k += 1
      i += Character.charCount(cp)
    }
    out
  }

  /** UTF8String entry point for `levenshtein_lte`: byte-equality fast
    * path (guarded by d >= 0 so a negative bound stays uniformly false),
    * allocation-light ASCII band, CODE-POINT band for multi-byte UTF-8
    * (parity with Spark's code-point-counting built-in — a single astral
    * char substitution is one edit, not two). */
  def levenshteinWithinU8(a: org.apache.spark.unsafe.types.UTF8String,
      b: org.apache.spark.unsafe.types.UTF8String, d: Int): Boolean = {
    if (d < 0) return false
    if (a.equals(b)) return true
    if (isAsciiU8(a) && isAsciiU8(b))
      levenshteinWithin(new AsciiSeq(a), new AsciiSeq(b), d)
    else
      levenshteinWithinInts(codePointArray(a.toString),
        codePointArray(b.toString), d)
  }

  /** `damerau_levenshtein(s1, s2) <= d` (unrestricted Damerau-Levenshtein,
    * Lowrance-Wagner: adjacent transposition with gap penalties), decided
    * with a BANDED DP over a rolling window of d+3 rows. Banding is valid
    * because ins/del are the only length-changing edits, so
    * DL(i,j) >= |i-j| — out-of-band cells can never be <= d. The
    * transposition term reaches back at most d rows (its gap penalty
    * (i-i1-1) + 1 + (j-j1-1) already exceeds d beyond that), so the
    * window suffices; reads outside the window, outside the band, or
    * into the inf boundary rows are skipped as provably > d. Windowed
    * row-min early exit: once d+2 CONSECUTIVE rows have a band minimum
    * (boundary cell included) above d, no later cell can dip back under
    * it — sub/ins/del chains seed from the previous row's band, and a
    * transposition's base lies within those same d+2 rows with a
    * non-negative gap penalty. (A single bad row does NOT suffice here:
    * unlike plain Levenshtein, a transposition can reach past it.)
    * Matches
    * [[damerauLevenshtein]]'s UTF-16 semantics exactly (fuzzed) — the
    * reference's DamerauLevenshtein UDF is JVM-char based, unlike the
    * built-in levenshtein, so UTF-16 IS parity here. */
  def damerauLevenshteinWithin(s1: CharSequence, s2: CharSequence,
      dIn: Int): Boolean = {
    if (dIn < 0) return false
    var a = s1
    var b = s2
    if (a.length > b.length) { val t = a; a = b; b = t }
    val n = a.length
    val m = b.length
    val d = dIn
    if (m - n > d) return false
    if (n == 0) return m <= d
    val inf = d + 1
    // rolling window of matrix rows R = i+1 (R-1 = prefix length of a);
    // trans reads back to matrix row i1 >= i-d, so W = d+3 covers every
    // live row including the previous row and the current one.
    val W = d + 3
    val rows = Array.ofDim[Int](W, m + 2)
    // matrix row 0 is the all-inf guard row; row 1 is D(0, j) = j.
    var j = 0
    while (j <= m + 1) { rows(0)(j) = inf; j += 1 }
    rows(1)(0) = inf
    j = 0
    while (j <= m) {
      rows(1)(j + 1) = if (j <= d) j else inf
      j += 1
    }
    // last matrix row where each char of `a` was seen (Lowrance-Wagner da)
    val da = new java.util.HashMap[Character, Integer]()
    var badRowStreak = 0
    var i = 1
    while (i <= n) {
      val curRow = rows((i + 1) % W)
      curRow(0) = inf
      curRow(1) = if (i <= d) i else inf // D(i, 0) = i deletions
      val lo = if (i > d) i - d else 1
      val hi = if (i + d < m) i + d else m
      if (lo > 1) curRow(lo) = inf // cell (i, lo-1): band edge
      if (hi < m) curRow(hi + 2) = inf // cell (i, hi+1): band edge
      val prevRow = rows(i % W)
      var best = if (i <= d) i else inf
      var db = 0
      val ca = a.charAt(i - 1)
      j = lo
      while (j <= hi) {
        val cb = b.charAt(j - 1)
        val i1 = { val v = da.get(cb); if (v == null) 0 else v.intValue }
        val j1 = db
        var cost = 1
        if (ca == cb) { cost = 0; db = j }
        var v = prevRow(j) + cost // D(i-1, j-1) at matrix col j
        val del = prevRow(j + 1) + 1
        if (del < v) v = del
        val ins = curRow(j) + 1
        if (ins < v) v = ins
        if (i1 > 0 && j1 > 0) {
          val penalty = (i - i1 - 1) + 1 + (j - j1 - 1)
          // skip when provably > d: gap cost alone exceeds d, or the
          // base cell is out of band (its true value >= |i1-j1| > d).
          // In-window in-band cells are always freshly written: the
          // window holds rows down to i-d-1 and penalty <= d bounds
          // i1 >= i-d+1- ... >= i-d.
          if (penalty <= d && math.abs((i1 - 1) - (j1 - 1)) <= d) {
            val trans = rows(i1 % W)(j1) + penalty // D(i1-1, j1-1)
            if (trans < v) v = trans
          }
        }
        curRow(j + 1) = if (v > inf) inf else v
        if (v < best) best = v
        j += 1
      }
      if (best > d) {
        badRowStreak += 1
        if (badRowStreak >= d + 2) return false
      } else badRowStreak = 0
      da.put(ca, i)
      i += 1
    }
    rows((n + 1) % W)(m + 1) <= d
  }

  /** UTF8String entry point for `damerau_levenshtein_lte`: byte-equality
    * fast path (d >= 0 guarded), zero-copy ASCII view, String fallback
    * for multi-byte UTF-8 — deliberately UTF-16, matching
    * [[damerauLevenshtein]] and the reference's JVM-string UDF. */
  def damerauLevenshteinWithinU8(a: org.apache.spark.unsafe.types.UTF8String,
      b: org.apache.spark.unsafe.types.UTF8String, d: Int): Boolean = {
    if (d < 0) return false
    if (a.equals(b)) return true
    damerauLevenshteinWithin(cs(a), cs(b), d)
  }

  /** Jaro similarity in [0,1]. Standard definition (Jaro 1989). */
  def jaro(s1: CharSequence, s2: CharSequence): Double = {
    val len1 = s1.length
    val len2 = s2.length
    if (len1 == 0 && len2 == 0) return 1.0
    if (len1 == 0 || len2 == 0) return 0.0
    val matchDist = math.max(0, math.max(len1, len2) / 2 - 1)
    val matched1 = new Array[Boolean](len1)
    val matched2 = new Array[Boolean](len2)
    var matches = 0
    var i = 0
    while (i < len1) {
      val lo = math.max(0, i - matchDist)
      val hi = math.min(len2 - 1, i + matchDist)
      var j = lo
      var done = false
      while (j <= hi && !done) {
        if (!matched2(j) && s1.charAt(i) == s2.charAt(j)) {
          matched1(i) = true
          matched2(j) = true
          matches += 1
          done = true
        }
        j += 1
      }
      i += 1
    }
    if (matches == 0) return 0.0
    // transpositions: compare matched chars in order
    var k = 0
    var transpositions = 0
    i = 0
    while (i < len1) {
      if (matched1(i)) {
        while (!matched2(k)) k += 1
        if (s1.charAt(i) != s2.charAt(k)) transpositions += 1
        k += 1
      }
      i += 1
    }
    val m = matches.toDouble
    (m / len1 + m / len2 + (m - transpositions / 2.0) / m) / 3.0
  }

  /** Jaro-Winkler similarity, prefix scale 0.1, max prefix 4 (standard). */
  def jaroWinkler(s1: CharSequence, s2: CharSequence): Double = {
    val j = jaro(s1, s2)
    var prefix = 0
    val maxP = math.min(4, math.min(s1.length, s2.length))
    while (prefix < maxP && s1.charAt(prefix) == s2.charAt(prefix)) prefix += 1
    j + prefix * 0.1 * (1.0 - j)
  }

  private def isAsciiU8(u: org.apache.spark.unsafe.types.UTF8String): Boolean = {
    val n = u.numBytes()
    var i = 0
    while (i < n) { if (u.getByte(i) < 0) return false; i += 1 }
    true
  }

  /** [[jaro]] specialised to ASCII `UTF8String`s: identical algorithm,
    * but monomorphic `getByte` access with no CharSequence view or String
    * materialisation — the gamma hot path calls this hundreds of millions
    * of times per predict, and the per-call view allocation plus
    * megamorphic `charAt` dispatch were a measurable slice of it. */
  private def jaroU8Ascii(s1: org.apache.spark.unsafe.types.UTF8String,
      s2: org.apache.spark.unsafe.types.UTF8String): Double = {
    val len1 = s1.numBytes()
    val len2 = s2.numBytes()
    if (len1 == 0 && len2 == 0) return 1.0
    if (len1 == 0 || len2 == 0) return 0.0
    val matchDist = math.max(0, math.max(len1, len2) / 2 - 1)
    val matched1 = new Array[Boolean](len1)
    val matched2 = new Array[Boolean](len2)
    var matches = 0
    var i = 0
    while (i < len1) {
      val lo = math.max(0, i - matchDist)
      val hi = math.min(len2 - 1, i + matchDist)
      val c1 = s1.getByte(i)
      var j = lo
      var done = false
      while (j <= hi && !done) {
        if (!matched2(j) && c1 == s2.getByte(j)) {
          matched1(i) = true
          matched2(j) = true
          matches += 1
          done = true
        }
        j += 1
      }
      i += 1
    }
    if (matches == 0) return 0.0
    var k = 0
    var transpositions = 0
    i = 0
    while (i < len1) {
      if (matched1(i)) {
        while (!matched2(k)) k += 1
        if (s1.getByte(i) != s2.getByte(k)) transpositions += 1
        k += 1
      }
      i += 1
    }
    val m = matches.toDouble
    (m / len1 + m / len2 + (m - transpositions / 2.0) / m) / 3.0
  }

  /** UTF8String entry points for the codegen'd expressions: ASCII inputs
    * (the overwhelmingly common case for the columns these levels
    * compare) take the allocation-free byte path; multi-byte UTF-8 falls
    * back to the CharSequence implementation via [[cs]]. Results are
    * bit-identical — same algorithm, same arithmetic. */
  def jaroU8(a: org.apache.spark.unsafe.types.UTF8String,
      b: org.apache.spark.unsafe.types.UTF8String): Double =
    if (isAsciiU8(a) && isAsciiU8(b)) jaroU8Ascii(a, b)
    else jaro(cs(a), cs(b))

  def jaroWinklerU8(a: org.apache.spark.unsafe.types.UTF8String,
      b: org.apache.spark.unsafe.types.UTF8String): Double =
    if (isAsciiU8(a) && isAsciiU8(b)) {
      val j = jaroU8Ascii(a, b)
      var prefix = 0
      val maxP = math.min(4, math.min(a.numBytes(), b.numBytes()))
      while (prefix < maxP && a.getByte(prefix) == b.getByte(prefix))
        prefix += 1
      j + prefix * 0.1 * (1.0 - j)
    } else jaroWinkler(cs(a), cs(b))

  /** Unrestricted Damerau-Levenshtein edit distance (adjacent transposition
    * counts as one edit). Full DP with alphabet map. */
  def damerauLevenshtein(s1: CharSequence, s2: CharSequence): Int = {
    val n = s1.length
    val m = s2.length
    if (n == 0) return m
    if (m == 0) return n
    val inf = n + m
    // da: last row where each char was seen in s1
    val da = new java.util.HashMap[Character, Integer]()
    val d = Array.ofDim[Int](n + 2, m + 2)
    d(0)(0) = inf
    var i = 0
    while (i <= n) { d(i + 1)(0) = inf; d(i + 1)(1) = i; i += 1 }
    var j = 0
    while (j <= m) { d(0)(j + 1) = inf; d(1)(j + 1) = j; j += 1 }
    i = 1
    while (i <= n) {
      var db = 0
      j = 1
      while (j <= m) {
        val i1 = Option(da.get(s2.charAt(j - 1))).map(_.intValue).getOrElse(0)
        val j1 = db
        var cost = 1
        if (s1.charAt(i - 1) == s2.charAt(j - 1)) { cost = 0; db = j }
        val sub = d(i)(j) + cost
        val ins = d(i + 1)(j) + 1
        val del = d(i)(j + 1) + 1
        val trans = d(i1)(j1) + (i - i1 - 1) + 1 + (j - j1 - 1)
        d(i + 1)(j + 1) = math.min(math.min(sub, ins), math.min(del, trans))
        j += 1
      }
      da.put(s1.charAt(i - 1), i)
      i += 1
    }
    d(n + 1)(m + 1)
  }

  /** Character q-gram Jaccard similarity (default q=2 per the reference's
    * jaccard UDF semantics: token sets are q-grams of the strings). For
    * strings shorter than q, the whole string is a single token. */
  def jaccardQgram(s1: String, s2: String, q: Int): Double = {
    val a = qgrams(s1, q)
    val b = qgrams(s2, q)
    if (a.isEmpty && b.isEmpty) return 1.0
    if (a.isEmpty || b.isEmpty) return 0.0
    var inter = 0
    val it = a.iterator
    while (it.hasNext) if (b.contains(it.next())) inter += 1
    inter.toDouble / (a.size + b.size - inter)
  }

  /** UTF8String entry point for the jaccard expressions: ASCII inputs at
    * q <= 2 (the only q the expressions use) take an int-encoded gram
    * path — a gram is at most two ASCII bytes, so the whole set fits in
    * sorted int arrays and the per-row String/HashSet/substring
    * allocations of the generic path disappear. Encoding keeps the
    * STRING-set semantics exactly: a 1-char gram and a 2-char gram can
    * never collide (disjoint tag bits), and the <=q whole-string token
    * of a 2-char input encodes identically to the same 2-char gram from
    * the other side — bit-identical results (fuzzed vs the String path). */
  def jaccardQgramU8(a: org.apache.spark.unsafe.types.UTF8String,
      b: org.apache.spark.unsafe.types.UTF8String, q: Int): Double =
    if (q >= 1 && q <= 2 && isAsciiU8(a) && isAsciiU8(b))
      jaccardAsciiSmallQ(a, b, q)
    else jaccardQgram(a.toString, b.toString, q)

  /** Distinct grams of an ASCII UTF8String as a SORTED int array.
    * 1-char grams carry tag 0x20000, 2-char grams tag 0x40000. */
  private def gramsAscii(u: org.apache.spark.unsafe.types.UTF8String,
      q: Int): Array[Int] = {
    val n = u.numBytes()
    if (n == 0) return Array.emptyIntArray
    if (n <= q) {
      // whole string is the single token (generic-path semantics)
      return if (n == 1) Array((u.getByte(0) & 0xFF) | 0x20000)
      else Array((((u.getByte(0) & 0xFF) << 8) |
        (u.getByte(1) & 0xFF)) | 0x40000)
    }
    val raw = new Array[Int](n - q + 1)
    var i = 0
    if (q == 1) {
      while (i < n) { raw(i) = (u.getByte(i) & 0xFF) | 0x20000; i += 1 }
    } else {
      while (i + 2 <= n) {
        raw(i) = (((u.getByte(i) & 0xFF) << 8) |
          (u.getByte(i + 1) & 0xFF)) | 0x40000
        i += 1
      }
    }
    java.util.Arrays.sort(raw)
    // in-place dedup of the sorted grams
    var w = 1
    i = 1
    while (i < raw.length) {
      if (raw(i) != raw(i - 1)) { raw(w) = raw(i); w += 1 }
      i += 1
    }
    if (w == raw.length) raw else java.util.Arrays.copyOf(raw, w)
  }

  private def jaccardAsciiSmallQ(a: org.apache.spark.unsafe.types.UTF8String,
      b: org.apache.spark.unsafe.types.UTF8String, q: Int): Double = {
    val ga = gramsAscii(a, q)
    val gb = gramsAscii(b, q)
    if (ga.length == 0 && gb.length == 0) return 1.0
    if (ga.length == 0 || gb.length == 0) return 0.0
    var i = 0
    var j = 0
    var inter = 0
    while (i < ga.length && j < gb.length) {
      if (ga(i) == gb(j)) { inter += 1; i += 1; j += 1 }
      else if (ga(i) < gb(j)) i += 1
      else j += 1
    }
    inter.toDouble / (ga.length + gb.length - inter)
  }

  private def qgrams(s: String, q: Int): java.util.HashSet[String] = {
    val set = new java.util.HashSet[String]()
    if (s.length == 0) return set
    if (s.length <= q) { set.add(s); return set }
    var i = 0
    while (i + q <= s.length) { set.add(s.substring(i, i + q)); i += 1 }
    set
  }

  /** Q-gram tokeniser: space-joined q-grams (reference QgramTokeniser UDF). */
  def qgramTokenise(s: String, q: Int): String = {
    if (s.length <= q) return s
    val sb = new java.lang.StringBuilder()
    var i = 0
    while (i + q <= s.length) {
      if (i > 0) sb.append(' ')
      sb.append(s, i, i + q)
      i += 1
    }
    sb.toString
  }

  /** Token (whitespace-split) Jaccard similarity. */
  def jaccardTokens(s1: String, s2: String): Double = {
    val a = new java.util.HashSet[String]()
    val b = new java.util.HashSet[String]()
    s1.split("\\s+").foreach(t => if (t.nonEmpty) a.add(t))
    s2.split("\\s+").foreach(t => if (t.nonEmpty) b.add(t))
    if (a.isEmpty && b.isEmpty) return 1.0
    if (a.isEmpty || b.isEmpty) return 0.0
    var inter = 0
    val it = a.iterator
    while (it.hasNext) if (b.contains(it.next())) inter += 1
    inter.toDouble / (a.size + b.size - inter)
  }
}
