package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

object ShingleKernel {
  import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData

  /** Normalisation shared by every dedupe kernel: bit-identical to
    * `toString.trim.toLowerCase(ROOT).replaceAll("\\s+", " ")`, but for
    * pure-ASCII input it runs as ONE char loop with a single array
    * allocation — the regex replaceAll (full regex engine pass + 2-3
    * String copies per document) was the largest constant in the
    * per-document cost of the whole dedupe family (measured via the
    * bench's certified-clean cpu_ms: q_minhash_pairs/q_dedup_docs/
    * q_near_dups are the top CPU consumers at sf0.1). Semantics
    * reproduced exactly: String.trim drops chars <= U+0020 from both
    * ends; regex \s is exactly [ \t\n\x0B\f\r]; ASCII lowercase is a
    * range check. Non-ASCII falls back to the String pipeline —
    * locale-correct lowercasing can change string LENGTH (U+0130 maps
    * to "i" + combining dot), so no fast path is safe there. */
  private[functions] def normalize(s: UTF8String): CharSequence = {
    val nb = s.numBytes
    var ascii = true
    var i = 0
    while (ascii && i < nb) { if (s.getByte(i) < 0) ascii = false; i += 1 }
    if (!ascii)
      return s.toString.trim.toLowerCase(java.util.Locale.ROOT)
        .replaceAll("\\s+", " ")
    var lo = 0
    while (lo < nb && s.getByte(lo) <= ' ') lo += 1
    var hi = nb
    while (hi > lo && s.getByte(hi - 1) <= ' ') hi -= 1
    val out = new Array[Char](hi - lo)
    var o = 0
    var pendingSpace = false // post-trim, a run can never start or end the string
    i = lo
    while (i < hi) {
      val c = s.getByte(i).toChar
      if (isRegexSpace(c)) pendingSpace = true
      else {
        if (pendingSpace) { out(o) = ' '; o += 1; pendingSpace = false }
        out(o) = if (c >= 'A' && c <= 'Z') (c + 32).toChar else c
        o += 1
      }
      i += 1
    }
    java.nio.CharBuffer.wrap(out, 0, o)
  }

  /** Minimal open-addressing long set (linear probing, power-of-two
    * table, zero handled via a flag). The boxed TreeSet/HashSet adds
    * were the second-largest dedupe-kernel term: one tree/hash node plus
    * one boxed Long PER SHINGLE, i.e. ~2 allocations per document
    * character. Sorted extraction matches TreeSet[java.lang.Long]'s
    * signed order. */
  private final class LongSet(expected: Int) {
    private var cap = 16
    while (cap < expected * 2 && cap > 0) cap <<= 1
    if (cap <= 0) cap = 1 << 30
    private var table = new Array[Long](cap)
    private var used = 0
    private var hasZero = false
    private def idx0(v: Long): Int = {
      val h = v ^ (v >>> 32)
      (h.toInt * -1640531527) & (cap - 1) // Fibonacci scramble
    }
    private def grow(): Unit = {
      // cap is clamped at 1<<30 (the largest power-of-two table we will
      // allocate): `cap <<= 1` would overflow Int. Past the clamp the
      // load-factor check keeps requesting growth, so add() fails with an
      // explicit message (below) instead of a NegativeArraySizeException
      // once the table can no longer keep a free slot.
      if (cap >= (1 << 30)) return
      val old = table
      cap <<= 1
      table = new Array[Long](cap)
      var i = 0
      while (i < old.length) {
        val v = old(i)
        if (v != 0L) { // re-insert, no duplicates possible
          var j = idx0(v)
          while (table(j) != 0L) j = (j + 1) & (cap - 1)
          table(j) = v
        }
        i += 1
      }
    }
    def add(v: Long): Boolean = {
      if (v == 0L) {
        if (hasZero) false else { hasZero = true; true }
      } else {
        // Long arithmetic: (used+1)*4 overflows Int once cap reaches 1<<30
        if ((used + 1L) * 4L > cap.toLong * 3L) grow()
        var j = idx0(v)
        var t = table(j)
        while (t != 0L && t != v) { j = (j + 1) & (cap - 1); t = table(j) }
        if (t == v) false
        else {
          // Full-table check only on the insertion path: a duplicate add at
          // the 1<<30 clamp needs no free slot and must still succeed. The
          // probe above always terminates because the last slot is never
          // filled (we throw before used can reach cap).
          if (used >= cap - 1) throw new IllegalStateException(
            s"ShingleKernel LongSet is full ($used distinct hashes): input " +
              "has more distinct shingles than the 1<<30 table clamp supports")
          table(j) = v; used += 1; true
        }
      }
    }
    def size: Int = used + (if (hasZero) 1 else 0)
    def sorted(): Array[Long] = {
      val out = new Array[Long](size)
      var o = 0
      if (hasZero) { out(o) = 0L; o += 1 }
      var i = 0
      while (i < cap) {
        val v = table(i)
        if (v != 0L) { out(o) = v; o += 1 }
        i += 1
      }
      java.util.Arrays.sort(out)
      out
    }
  }

  /** Normalise (trim, lower, collapse whitespace) then distinct q-gram
    * shingles. One JVM pass — the Column-level substr-in-transform
    * equivalent is O(n^2) per document because UTF8String.substring scans
    * for codepoint boundaries on every call. */
  def shingles(s: UTF8String, q: Int): ArrayData = {
    val norm = normalize(s)
    val out = new java.util.LinkedHashSet[UTF8String]()
    if (norm.length == 0) return new GenericArrayData(Array.empty[Any])
    if (norm.length <= q) {
      out.add(UTF8String.fromString(norm.toString))
    } else {
      var i = 0
      while (i + q <= norm.length) {
        out.add(UTF8String.fromString(norm.subSequence(i, i + q).toString))
        i += 1
      }
    }
    new GenericArrayData(out.toArray[AnyRef](new Array[AnyRef](out.size)))
  }

  /** Sorted distinct FNV-1a 64 hashes of the q-gram shingle set — the
    * whole `sort_array(array_distinct(transform(shingles(s), hash)))`
    * chain in ONE pass with no per-shingle string allocation (the
    * Column-level chain evaluates its lambda interpreted, once per
    * shingle). Jaccard over the hashes equals shingle-set jaccard up to
    * ~1e-19 collision probability — the same contract the minhash slots
    * already rely on. */
  def hashedShingles(s: UTF8String, q: Int): ArrayData = {
    val norm = normalize(s)
    if (norm.length == 0)
      return UnsafeArrayData.fromPrimitiveArray(new Array[Long](0))
    val n = norm.length
    val last = if (n <= q) 0 else n - q
    val set = new LongSet(last + 1)
    var i = 0
    while (i <= last) {
      val end = math.min(i + q, n)
      var h = 0xcbf29ce484222325L
      var j = i
      while (j < end) { h ^= norm.charAt(j); h *= 0x100000001b3L; j += 1 }
      set.add(h)
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(set.sorted())
  }

  /** Winnowed fingerprints (Schleimer et al. 2003, the MOSS scheme):
    * positional q-gram FNV hashes, then the MINIMUM (unsigned order) of
    * every w-consecutive-hash window; distinct selected values, sorted
    * (signed) for determinism. Guarantees every match of length
    * >= w + q - 1 shares a fingerprint while storing ~2/(w+1) of the
    * hashes. Documents shorter than one window yield the single minimum
    * over all their hashes; empty text yields an empty array. One JVM
    * pass, no per-window allocation. */
  def winnowFingerprints(s: UTF8String, q: Int, w: Int): ArrayData = {
    val norm = normalize(s)
    if (norm.length == 0)
      return UnsafeArrayData.fromPrimitiveArray(new Array[Long](0))
    val n = norm.length
    val last = if (n <= q) 0 else n - q
    val m = last + 1
    val hs = new Array[Long](m)
    var i = 0
    while (i <= last) {
      val end = math.min(i + q, n)
      var h = 0xcbf29ce484222325L
      var j = i
      while (j < end) { h ^= norm.charAt(j); h *= 0x100000001b3L; j += 1 }
      hs(i) = h
      i += 1
    }
    val out = new LongSet(if (m <= w) 1 else m - w + 1)
    if (m <= w) {
      var best = hs(0)
      var k = 1
      while (k < m) {
        if (java.lang.Long.compareUnsigned(hs(k), best) < 0) best = hs(k)
        k += 1
      }
      out.add(best)
    } else {
      var start = 0
      while (start + w <= m) {
        var best = hs(start)
        var k = start + 1
        while (k < start + w) {
          if (java.lang.Long.compareUnsigned(hs(k), best) < 0) best = hs(k)
          k += 1
        }
        out.add(best)
        start += 1
      }
    }
    UnsafeArrayData.fromPrimitiveArray(out.sorted())
  }

  /** Sorted distinct FNV-1a 64 hashes of the lowercased whitespace-token
    * set — the token twin of [[hashedShingles]] (replaces the interpreted
    * `transform(array_distinct(split(...)), hash)` chain with one pass).
    * Token semantics match `TextOps.tokens(lower(c))`: trim, lowercase,
    * split on whitespace runs. */
  // exactly Java regex \s — the char class `split(c, "\\s+")` uses; NOT
  // Character.isWhitespace, which also matches unicode separators and
  // would tokenise differently from the Column chain it replaces
  private def isRegexSpace(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  def hashedTokens(s: UTF8String): ArrayData = {
    // normalize collapses interior \s+ runs to a single ' ' — token
    // boundaries are unchanged (runs and single spaces split identically),
    // so the fast path is safe here too
    val norm = normalize(s)
    if (norm.length == 0)
      return UnsafeArrayData.fromPrimitiveArray(new Array[Long](0))
    val n = norm.length
    val set = new LongSet(8 + n / 6)
    var i = 0
    while (i < n) {
      while (i < n && isRegexSpace(norm.charAt(i))) i += 1
      if (i < n) {
        var h = 0xcbf29ce484222325L
        while (i < n && !isRegexSpace(norm.charAt(i))) {
          h ^= norm.charAt(i); h *= 0x100000001b3L; i += 1
        }
        set.add(h)
      }
    }
    UnsafeArrayData.fromPrimitiveArray(set.sorted())
  }

  /** Hashes of every word n-gram of the normalised text, in order — the
    * whole tokens -> arrays_zip -> concat_ws -> xxhash64 -> explode
    * Column chain in ONE pass with zero string allocation. After
    * whitespace collapse an n-gram "tok_i .. tok_(i+n-1)" is EXACTLY the
    * contiguous span from tok_i's first char to the last token's last
    * char, so each gram is FNV-hashed in place. Gram hashes are internal
    * join keys (both contamination sides use this kernel; the DuckDB
    * oracle joins the STRING grams), so FNV vs xxhash64 only moves the
    * ~grams^2/2^64 collision bound, never results. */
  def wordNgramHashes(s: UTF8String, n: Int): ArrayData = {
    val norm = normalize(s)
    val len = norm.length
    if (len == 0) return UnsafeArrayData.fromPrimitiveArray(new Array[Long](0))
    var tokens = 1
    var i = 0
    while (i < len) { if (norm.charAt(i) == ' ') tokens += 1; i += 1 }
    if (tokens < n) return UnsafeArrayData.fromPrimitiveArray(new Array[Long](0))
    // starts(t) = first char of token t; sentinel starts(tokens) = len+1
    // so "separator before token t" arithmetic also covers the last gram
    val starts = new Array[Int](tokens + 1)
    var t = 1
    i = 0
    while (i < len) {
      if (norm.charAt(i) == ' ') { starts(t) = i + 1; t += 1 }
      i += 1
    }
    starts(tokens) = len + 1
    val m = tokens - n + 1
    val out = new Array[Long](m)
    var g = 0
    while (g < m) {
      val until = starts(g + n) - 1
      var h = 0xcbf29ce484222325L
      var j = starts(g)
      while (j < until) { h ^= norm.charAt(j); h *= 0x100000001b3L; j += 1 }
      out(g) = h
      g += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  // Tokenization shared by tokenWindowHashes / tokenTf: EXACTLY the
  // `TextOps.tokens` Column chain it replaces — Spark `trim` strips
  // SPACES ONLY (U+0020; unlike normalize's Java String.trim), and the
  // split is Spark's `split(str, "\\s+")`, i.e. Java regex split with
  // limit -1: a leading separator run yields ONE empty token AND a
  // trailing separator run yields ONE empty token (an all-separator
  // string yields ["", ""]) — unlike Java's default limit-0 split,
  // which drops trailing empties. Case is PRESERVED. Separators are
  // \s = [ \t\n\x0B\f\r], ASCII bytes that never occur inside a UTF-8
  // multi-byte sequence, so the scan works on raw UTF-8 bytes for every
  // input with no decode.
  private def isJavaSpaceByte(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0B || b == '\f' || b == '\r'

  /** Token (start, end) byte offsets of `b[lo, hi)` under the semantics
    * above, flattened as [s0, e0, s1, e1, ...]; the possible leading /
    * trailing empty tokens are (lo, lo) / (hi, hi). Returns null for
    * zero tokens (empty input). */
  private def tokenOffsets(b: Array[Byte], lo: Int, hi: Int): Array[Int] = {
    if (lo >= hi) return null
    var n = 0
    if (isJavaSpaceByte(b(lo))) n += 1 // limit -1: leading empty token
    if (isJavaSpaceByte(b(hi - 1))) n += 1 // limit -1: trailing empty token
    var i = lo
    while (i < hi) {
      while (i < hi && isJavaSpaceByte(b(i))) i += 1
      if (i < hi) {
        n += 1
        while (i < hi && !isJavaSpaceByte(b(i))) i += 1
      }
    }
    val out = new Array[Int](2 * n)
    var t = 0
    if (isJavaSpaceByte(b(lo))) { out(0) = lo; out(1) = lo; t = 1 }
    i = lo
    while (i < hi) {
      while (i < hi && isJavaSpaceByte(b(i))) i += 1
      if (i < hi) {
        out(2 * t) = i
        while (i < hi && !isJavaSpaceByte(b(i))) i += 1
        out(2 * t + 1) = i
        t += 1
      }
    }
    if (isJavaSpaceByte(b(hi - 1))) { out(2 * t) = hi; out(2 * t + 1) = hi }
    out
  }

  private def spaceTrimLo(b: Array[Byte], n: Int): Int = {
    var lo = 0; while (lo < n && b(lo) == ' ') lo += 1; lo
  }
  private def spaceTrimHi(b: Array[Byte], lo: Int, n: Int): Int = {
    var hi = n; while (hi > lo && b(hi - 1) == ' ') hi -= 1; hi
  }

  /** FNV-1a 64 hash of every k-token WINDOW of the text, by start
    * position — the whole tokens -> transform(sequence) -> slice ->
    * array_join -> xxhash64 Column chain of the exact-substring span
    * dedup (Lee et al. arXiv:2107.06499 shape) in ONE byte pass with
    * zero string allocation. Each token is FNV-hashed once over its
    * UTF-8 bytes; a window's hash folds its k token hashes in order
    * (big-endian bytes), so window equality is token-sequence equality
    * up to 64-bit collisions — the same fidelity class as xxhash64 over
    * the space-joined window string it replaces. Hashes are internal
    * grouping/join keys only (the DuckDB oracle groups the literal
    * window strings); documents with fewer than k tokens yield an empty
    * array. */
  def tokenWindowHashes(s: UTF8String, k: Int): ArrayData = {
    val b = s.getBytes
    val lo = spaceTrimLo(b, b.length)
    val hi = spaceTrimHi(b, lo, b.length)
    val offs = tokenOffsets(b, lo, hi)
    val nTok = if (offs == null) 0 else offs.length / 2
    if (nTok < k)
      return UnsafeArrayData.fromPrimitiveArray(new Array[Long](0))
    val th = new Array[Long](nTok)
    var t = 0
    while (t < nTok) {
      var h = 0xcbf29ce484222325L
      var j = offs(2 * t)
      val e = offs(2 * t + 1)
      while (j < e) { h ^= (b(j) & 0xff); h *= 0x100000001b3L; j += 1 }
      th(t) = h
      t += 1
    }
    val m = nTok - k + 1
    val out = new Array[Long](m)
    var g = 0
    while (g < m) {
      var h = 0xcbf29ce484222325L
      var j = g
      while (j < g + k) {
        val v = th(j)
        var sh = 56
        while (sh >= 0) { h ^= (v >>> sh) & 0xffL; h *= 0x100000001b3L; sh -= 8 }
        j += 1
      }
      out(g) = h
      g += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** Per-document term frequencies in ONE pass: lowercases (identical to
    * Spark's `lower`: UTF8String.toLowerCase), tokenizes under the
    * semantics above, and aggregates counts per DISTINCT token locally —
    * the tokenize -> explode -> groupBy(doc, term) chain of TF-IDF
    * without the per-token row explosion or the (doc, term) shuffle
    * (the aggregate that fed it becomes a narrow map stage). Distinct
    * terms come out in first-occurrence order; every term UTF8String is
    * a zero-copy slice of one shared byte array.
    * @return array<struct<term string, tf int>> */
  def tokenTf(s: UTF8String): ArrayData = {
    val b = s.toLowerCase.getBytes
    val lo = spaceTrimLo(b, b.length)
    val hi = spaceTrimHi(b, lo, b.length)
    val offs = tokenOffsets(b, lo, hi)
    if (offs == null) return new GenericArrayData(new Array[Any](0))
    val nTok = offs.length / 2
    // open-addressing map keyed by token bytes (hash + byte-equality on
    // probe); slot payload indexes a parallel first-occurrence list.
    // Long arithmetic + 1<<30 clamp: nTok * 2 overflows Int for a ~1B-token
    // document, and this table is sized ONCE (no grow path), so an
    // under-sized table would probe forever — the clamp plus the
    // full-table guard below turn that into an explicit error instead.
    var cap = 16
    val target = math.min(nTok.toLong * 2L, 1L << 30)
    while (cap < target) cap <<= 1
    val slotTok = new Array[Int](cap) // first-occurrence token index + 1; 0 = empty
    val slotIdx = new Array[Int](cap) // index into the distinct list
    val distTok = new Array[Int](nTok) // token index of each distinct term
    val counts = new Array[Int](nTok)
    val hashes = new Array[Long](nTok)
    var nDist = 0
    var t = 0
    while (t < nTok) {
      val ts = offs(2 * t)
      val te = offs(2 * t + 1)
      var h = 0xcbf29ce484222325L
      var j = ts
      while (j < te) { h ^= (b(j) & 0xff); h *= 0x100000001b3L; j += 1 }
      var slot = ((h ^ (h >>> 32)).toInt * -1640531527) & (cap - 1)
      var done = false
      while (!done) {
        val st = slotTok(slot)
        if (st == 0) {
          if (nDist >= cap - 1) throw new IllegalStateException(
            s"token_tf term table is full ($nDist distinct terms): input " +
              "has more distinct tokens than the 1<<30 table clamp supports")
          slotTok(slot) = t + 1
          slotIdx(slot) = nDist
          distTok(nDist) = t
          counts(nDist) = 1
          hashes(nDist) = h
          nDist += 1
          done = true
        } else {
          val d = slotIdx(slot)
          val os = offs(2 * (st - 1))
          val oe = offs(2 * (st - 1) + 1)
          if (hashes(d) == h && oe - os == te - ts && {
            var a = os; var c = ts; var eq = true
            while (eq && a < oe) { eq = b(a) == b(c); a += 1; c += 1 }
            eq
          }) { counts(d) += 1; done = true }
          else slot = (slot + 1) & (cap - 1)
        }
      }
      t += 1
    }
    val rows = new Array[Any](nDist)
    var d = 0
    while (d < nDist) {
      val ts = offs(2 * distTok(d))
      val te = offs(2 * distTok(d) + 1)
      rows(d) = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](UTF8String.fromBytes(b, ts, te - ts), counts(d)))
      d += 1
    }
    new GenericArrayData(rows)
  }

  /** Pre-generated universal-hash params (fixed seed; odd multipliers). */
  def hashParams(k: Int): Array[Long] = {
    val rng = new scala.util.Random(0x5EEDL)
    Array.fill(2 * k)(rng.nextLong()).zipWithIndex
      .map { case (v, i) => if (i % 2 == 0) v | 1L else v }
  }

  /** One-pass MinHash signature over the shingle set of `s`: base FNV-1a
    * per shingle, k slots via wrap-around universal hashing (JVM semantics
    * — deliberately NOT Column arithmetic, which throws under ANSI). */
  def minhash(s: UTF8String, q: Int, params: Array[Long]): ArrayData = {
    val norm = normalize(s)
    val k = params.length / 2
    val mins = Array.fill(k)(Long.MaxValue)
    if (norm.length > 0) {
      val n = norm.length
      val last = if (n <= q) 0 else n - q
      val seen = new LongSet(last + 1)
      var i = 0
      while (i <= last) {
        val end = math.min(i + q, n)
        var h = 0xcbf29ce484222325L
        var j = i
        while (j < end) { h ^= norm.charAt(j); h *= 0x100000001b3L; j += 1 }
        if (seen.add(h)) {
          var x = 0
          while (x < k) {
            val v = params(2 * x) * h + params(2 * x + 1)
            if (v < mins(x)) mins(x) = v
            x += 1
          }
        }
        i += 1
      }
    }
    UnsafeArrayData.fromPrimitiveArray(mins)
  }

  /** [[hashedShingles]] and [[minhash]] FUSED into one pass: the two are
    * always consumed together by the LSH dedupe (shingle set for the exact
    * jaccard verify, signature for banding), and separately they each
    * normalise + re-shingle the full text — the heaviest per-document scan
    * in the dedupe pipeline, paid twice. Values are bit-identical to the
    * unfused kernels (same FNV stream feeds both outputs).
    * @return struct(toks: sorted distinct hashes, sig: k minhash slots) */
  def shinglesAndMinhash(s: UTF8String, q: Int,
      params: Array[Long]): org.apache.spark.sql.catalyst.InternalRow = {
    val norm = normalize(s)
    val k = params.length / 2
    val mins = Array.fill(k)(Long.MaxValue)
    var toks: Array[Long] = null
    if (norm.length > 0) {
      val n = norm.length
      val last = if (n <= q) 0 else n - q
      val set = new LongSet(last + 1)
      var i = 0
      while (i <= last) {
        val end = math.min(i + q, n)
        var h = 0xcbf29ce484222325L
        var j = i
        while (j < end) { h ^= norm.charAt(j); h *= 0x100000001b3L; j += 1 }
        if (set.add(h)) {
          var x = 0
          while (x < k) {
            val v = params(2 * x) * h + params(2 * x + 1)
            if (v < mins(x)) mins(x) = v
            x += 1
          }
        }
        i += 1
      }
      toks = set.sorted()
    } else toks = new Array[Long](0)
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(Array[Any](
      UnsafeArrayData.fromPrimitiveArray(toks),
      UnsafeArrayData.fromPrimitiveArray(mins)))
  }
}

/** char_shingles(str, q) -> array<string> (distinct, normalised). */
case class CharShingles(child: Expression, q: Int) extends UnaryExpression
    with Serializable {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "char_shingles"
  override def nullSafeEval(v: Any): Any =
    ShingleKernel.shingles(v.asInstanceOf[UTF8String], q)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, v => s"graft.functions.ShingleKernel.shingles($v, $q)")
  override protected def withNewChildInternal(c: Expression): CharShingles = copy(child = c)
}

/** hashed_shingles(str, q) -> sorted distinct array<long> (FNV-1a 64). */
case class HashedShingles(child: Expression, q: Int) extends UnaryExpression
    with Serializable {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "hashed_shingles"
  override def nullSafeEval(v: Any): Any =
    ShingleKernel.hashedShingles(v.asInstanceOf[UTF8String], q)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, v => s"graft.functions.ShingleKernel.hashedShingles($v, $q)")
  override protected def withNewChildInternal(c: Expression): HashedShingles = copy(child = c)
}

/** winnow_fingerprints(str, q, w) -> sorted distinct array<long> of the
  * MOSS-winnowed q-gram fingerprint selection. */
case class WinnowFingerprints(child: Expression, q: Int, w: Int)
    extends UnaryExpression with Serializable {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "winnow_fingerprints"
  override def nullSafeEval(v: Any): Any =
    ShingleKernel.winnowFingerprints(v.asInstanceOf[UTF8String], q, w)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      v => s"graft.functions.ShingleKernel.winnowFingerprints($v, $q, $w)")
  override protected def withNewChildInternal(c: Expression): WinnowFingerprints =
    copy(child = c)
}

/** word_ngram_hashes(str, n) -> array<long>: FNV-1a 64 of every word
  * n-gram (normalised, space-joined), in document order, duplicates
  * kept — the decontamination scan's gram key stream. */
case class WordNgramHashes(child: Expression, n: Int) extends UnaryExpression
    with Serializable {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "word_ngram_hashes"
  override def nullSafeEval(v: Any): Any =
    ShingleKernel.wordNgramHashes(v.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      v => s"graft.functions.ShingleKernel.wordNgramHashes($v, $n)")
  override protected def withNewChildInternal(c: Expression): WordNgramHashes =
    copy(child = c)
}

/** token_window_hashes(str, k) -> array<long>: FNV-1a 64 of every
  * k-token window by start position, case preserved — the span-dedup
  * window key stream (duplicates kept, document order). */
case class TokenWindowHashes(child: Expression, k: Int) extends UnaryExpression
    with Serializable {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "token_window_hashes"
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (k < 1)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a window size >= 1, got $k")
    else super.checkInputDataTypes()
  override def nullSafeEval(v: Any): Any =
    ShingleKernel.tokenWindowHashes(v.asInstanceOf[UTF8String], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      v => s"graft.functions.ShingleKernel.tokenWindowHashes($v, $k)")
  override protected def withNewChildInternal(c: Expression): TokenWindowHashes =
    copy(child = c)
}

/** token_tf(str) -> array<struct<term string, tf int>>: per-document
  * term frequencies of the lowercased whitespace tokens, distinct terms
  * in first-occurrence order — the TF-IDF (doc, term) aggregate as one
  * narrow kernel. */
case class TokenTf(child: Expression) extends UnaryExpression
    with Serializable {
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("term", StringType, nullable = false),
    StructField("tf", IntegerType, nullable = false))), containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "token_tf"
  override def nullSafeEval(v: Any): Any =
    ShingleKernel.tokenTf(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, v => s"graft.functions.ShingleKernel.tokenTf($v)")
  override protected def withNewChildInternal(c: Expression): TokenTf = copy(child = c)
}

/** hashed_tokens(str) -> sorted distinct array<long> (FNV-1a 64). */
case class HashedTokens(child: Expression) extends UnaryExpression
    with Serializable {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "hashed_tokens"
  override def nullSafeEval(v: Any): Any =
    ShingleKernel.hashedTokens(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, v => s"graft.functions.ShingleKernel.hashedTokens($v)")
  override protected def withNewChildInternal(c: Expression): HashedTokens = copy(child = c)
}

/** shingles_minhash(str, q, k) -> struct(toks array<long>, sig array<long>):
  * the hashed shingle set and the MinHash signature from ONE text pass. */
case class ShinglesMinhash(child: Expression, q: Int, k: Int)
    extends UnaryExpression with Serializable {
  @transient private lazy val params = ShingleKernel.hashParams(k)
  override def dataType: DataType = StructType(Seq(
    StructField("toks", ArrayType(LongType, containsNull = false), nullable = false),
    StructField("sig", ArrayType(LongType, containsNull = false), nullable = false)))
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "shingles_minhash"
  override def nullSafeEval(v: Any): Any =
    ShingleKernel.shinglesAndMinhash(v.asInstanceOf[UTF8String], q, params)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val p = ctx.addReferenceObj("smParams", params, "long[]")
    defineCodeGen(ctx, ev,
      v => s"graft.functions.ShingleKernel.shinglesAndMinhash($v, $q, $p)")
  }
  override protected def withNewChildInternal(c: Expression): ShinglesMinhash = copy(child = c)
}

/** minhash_sig(str, q, k) -> array<long> of k MinHash slots. */
case class MinHashSig(child: Expression, q: Int, k: Int) extends UnaryExpression
    with Serializable {
  @transient private lazy val params = ShingleKernel.hashParams(k)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "minhash_sig"
  override def nullSafeEval(v: Any): Any =
    ShingleKernel.minhash(v.asInstanceOf[UTF8String], q, params)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val p = ctx.addReferenceObj("mhParams", params, "long[]")
    defineCodeGen(ctx, ev, v => s"graft.functions.ShingleKernel.minhash($v, $q, $p)")
  }
  override protected def withNewChildInternal(c: Expression): MinHashSig = copy(child = c)
}
