package graft

import org.apache.spark.sql.functions._

import graft.pipeline.DedupOps

/** Cross-document duplicated-span detection (window-hash exact-substring
  * dedup, Lee et al. arXiv:2107.06499 style): window hashing, distinct-doc
  * thresholding, gaps-and-islands span merge, per-doc token stats. */
class DupSpansSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String)*) = rows.toSeq.toDF("doc_id", "text")

  test("windowHashes: one hash per start position, empty below k") {
    val d = docs((1L, "a b c d"), (2L, "a b"), (3L, ""))
      .select(col("doc_id"),
        size(DedupOps.windowHashes(split(col("text"), " "), 3)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(d == Map(1L -> 2, 2L -> 0, 3L -> 0))
  }

  test("a run shared by two documents is reported as one merged span in each") {
    // docs 1 and 2 share the 5-token run "q w e r t"; with k=3 that is 3
    // overlapping duplicated windows merging into a single span of 5 tokens
    val d = docs(
      (1L, "x1 x2 q w e r t x3 x4"),
      (2L, "y1 q w e r t y2 y3"),
      (3L, "z1 z2 z3 z4 z5 z6"))
    val spans = DedupOps.duplicatedSpans(d, "doc_id", "text", k = 3)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3)))
      .toSet
    // doc 1: run starts at token 2 -> span [2,6]; doc 2: starts at 1 -> [1,5]
    assert(spans == Set((1L, 2, 6, 3L), (2L, 1, 5, 3L)))
  }

  test("a window repeated only within one document does not qualify at minDocs=2") {
    val d = docs(
      (1L, "p q r s p q r s"), // "p q r" twice, but only in doc 1
      (2L, "a b c d e f"))
    assert(DedupOps.duplicatedSpans(d, "doc_id", "text", k = 3).count() == 0)
  }

  test("disjoint duplicated runs in one document become separate spans") {
    val d = docs(
      (1L, "q w e GAP1 GAP2 GAP3 r t y"),
      (2L, "q w e a1 a2 a3 a4 a5 a6"),
      (3L, "b1 b2 b3 b4 b5 b6 r t y"))
    val spans = DedupOps.duplicatedSpans(d, "doc_id", "text", k = 3)
      .filter(col("doc_id") === 1L)
      .collect().map(r => (r.getInt(1), r.getInt(2))).toSet
    assert(spans == Set((0, 2), (6, 8)))
  }

  test("removeDuplicatedSpans keeps the owning (min-id) copy, strips the rest") {
    val d = docs(
      (1L, "x1 x2 q w e r t x3 x4"), // owner of "q w e"... windows -> keeps all
      (2L, "y1 q w e r t y2 y3"),    // foreign copy -> tokens 1..5 removed
      (3L, "z1 z2 z3 z4 z5 z6"))     // untouched
    val out = DedupOps.removeDuplicatedSpans(d, "doc_id", "text", k = 3)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(out(1L) == (("x1 x2 q w e r t x3 x4", 0L)))
    assert(out(2L) == (("y1 y2 y3", 5L)))
    assert(out(3L) == (("z1 z2 z3 z4 z5 z6", 0L)))
  }

  test("removeDuplicatedSpans: empty and short documents pass through") {
    val d = docs((1L, ""), (2L, "a b"), (3L, "a b"))
    val out = DedupOps.removeDuplicatedSpans(d, "doc_id", "text", k = 3)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(1L -> "", 2L -> "a b", 3L -> "a b"))
  }

  test("property: spans match a brute-force reference on random corpora") {
    val rnd = new scala.util.Random(20260814)
    val vocab = Vector("a", "b", "c", "d", "e")
    for (trial <- 1 to 5) {
      val k = 2 + trial % 3 // k in 2..4
      val corpus = (0L until 30L).map { id =>
        id -> (0 until (3 + rnd.nextInt(18))).map(_ =>
          vocab(rnd.nextInt(vocab.length))).mkString(" ")
      }
      // brute force: window -> docs, dup windows, per-doc merged spans
      val wins = corpus.flatMap { case (id, text) =>
        val t = text.split(" ")
        (0 to t.length - k).map(p => (t.slice(p, p + k).mkString(" "), id, p))
      }
      val dupW = wins.groupBy(_._1).filter(_._2.map(_._2).distinct.size >= 2)
        .values.flatten.toSeq
      val expected = dupW.groupBy(_._2).flatMap { case (id, ws) =>
        val sorted = ws.map(_._3).distinct.sorted
        val spans = scala.collection.mutable.ArrayBuffer.empty[(Int, Int, Int)]
        for (p <- sorted) {
          if (spans.nonEmpty && p <= spans.last._2 + 1) {
            val (s0, e0, n0) = spans.last
            spans(spans.length - 1) = (s0, math.max(e0, p + k - 1), n0 + 1)
          } else spans += ((p, p + k - 1, 1))
        }
        spans.map { case (s0, e0, n0) => (id, s0, e0, n0.toLong) }
      }.toSet
      val got = DedupOps.duplicatedSpans(
          corpus.toDF("doc_id", "text"), "doc_id", "text", k = k)
        .collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3))).toSet
      assert(got == expected, s"trial $trial k=$k")
    }
  }

  test("property: span removal matches a brute-force ownership replay") {
    val rnd = new scala.util.Random(8141513)
    val vocab = Vector("a", "b", "c", "d")
    for (trial <- 1 to 4) {
      val k = 2 + trial % 2
      val corpus = (0L until 25L).map { id =>
        id -> (0 until (2 + rnd.nextInt(15))).map(_ =>
          vocab(rnd.nextInt(vocab.length))).mkString(" ")
      }
      // brute force: window -> min owning doc; tokens covered by any
      // window owned elsewhere are dropped
      val wins = corpus.flatMap { case (id, text) =>
        val t = text.split(" ").filter(_.nonEmpty)
        (0 to t.length - k).map(p => (t.slice(p, p + k).mkString(" "), id, p))
      }
      val owner = wins.groupBy(_._1)
        .filter(_._2.map(_._2).distinct.size >= 2)
        .view.mapValues(_.map(_._2).min).toMap
      val expected = corpus.map { case (id, text) =>
        val t = text.split(" ").filter(_.nonEmpty)
        val foreignCover = (0 to t.length - k)
          .filter { p =>
            val w = t.slice(p, p + k).mkString(" ")
            owner.get(w).exists(_ != id)
          }
          .flatMap(p => p until p + k).toSet
        val keptToks = t.indices.filterNot(foreignCover).map(t)
        (id, keptToks.mkString(" "), foreignCover.size.toLong)
      }.toSet
      val got = DedupOps.removeDuplicatedSpans(
          corpus.toDF("doc_id", "text"), "doc_id", "text", k = k)
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
      assert(got == expected, s"trial $trial k=$k")
    }
  }

  test("duplicatedTokenStats: covered-token counts and ratio, zero for clean docs") {
    val d = docs(
      (1L, "x1 x2 q w e r t x3 x4"), // 9 tokens, 5 duplicated
      (2L, "y1 q w e r t y2 y3"),    // 8 tokens, 5 duplicated
      (3L, "z1 z2 z3 z4 z5 z6"))     // clean
    val stats = DedupOps.duplicatedTokenStats(d, "doc_id", "text", k = 3)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(stats(1L) == ((9L, 5L, math.round(5.0 / 9 * 1e9) / 1e9)))
    assert(stats(2L) == ((8L, 5L, 0.625)))
    assert(stats(3L) == ((6L, 0L, 0.0)))
  }
}
