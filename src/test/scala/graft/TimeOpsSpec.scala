package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.pipeline.{DedupOps, TimeOps}

/** Sessionization and as-of join semantics, checked against hand-counted
  * fixtures and a naive range-join reference implementation. */
class TimeOpsSpec extends SparkSpec {
  import spark.implicits._

  test("sessionize splits on gap strictly greater than the threshold") {
    // user 1: gaps 10, 100 (== gap keeps), 101 (> gap splits)
    val e = Seq(
      (1L, 0L, 1L), (1L, 10L, 2L), (1L, 110L, 3L), (1L, 211L, 4L),
      (2L, 5L, 5L)).toDF("user_id", "ts", "event_id")
    val out = TimeOps.sessionize(e, "user_id", "ts", gap = 100L, "event_id")
      .select("user_id", "ts", "session_seq").as[(Long, Long, Long)]
      .collect().toSet
    assert(out == Set(
      (1L, 0L, 1L), (1L, 10L, 1L), (1L, 110L, 1L), (1L, 211L, 2L),
      (2L, 5L, 1L)))
  }

  test("sessionize ties on same timestamp break by tie column, one pass") {
    val e = Seq((1L, 100L, 2L), (1L, 100L, 1L), (1L, 301L, 3L))
      .toDF("user_id", "ts", "event_id")
    val stats = TimeOps.sessionStats(e, "user_id", "ts", gap = 200L,
      "event_id", valueCol = "ts")
    val rows = stats.orderBy("session_seq")
      .select("session_seq", "n_events").as[(Long, Long)].collect()
    assert(rows.toSeq == Seq((1L, 2L), (2L, 1L)))
  }

  test("asofJoin equals the naive range-join reference, incl. edge cases") {
    // right rows: same-instant (40), null payload field (t=20), dup keys
    val left = Seq((1L, 10L, "a"), (1L, 40L, "b"), (1L, 5L, "c"),
      (2L, 100L, "d"), (3L, 7L, "e")).toDF("k", "t", "tag")
    val right = Seq(
      (1L, 8L, Some(80L)), (1L, 20L, None), (1L, 40L, Some(77L)),
      (2L, 100L, Some(55L)), (2L, 101L, Some(56L)))
      .toDF("rk", "rt", "payload")
    val fast = TimeOps.asofJoin(left, right, "k", "rk", "t", "rt",
      Seq("payload"))
      .select("k", "t", "tag", "payload")
      .as[(Long, Long, String, Option[Long])].collect().toSet
    // naive reference: max-rt right row with rt <= t per left row
    val w = Window.partitionBy("k", "t", "tag").orderBy(desc("rt"))
    val naive = left.join(right,
        col("k") === col("rk") && col("rt") <= col("t"), "left")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select("k", "t", "tag", "payload")
      .as[(Long, Long, String, Option[Long])].collect().toSet
    assert(fast == naive)
    // spot-checks: same-instant right row included; a right row whose
    // payload FIELD is null must not resurrect the older value; no-match
    // rows stay null
    val byTag = fast.map(r => r._3 -> r._4).toMap
    assert(byTag("b").contains(77L)) // t=40 sees the same-instant rt=40
    assert(byTag("a").contains(80L)) // t=10 sees rt=8
    assert(byTag("c").isEmpty)       // t=5, earliest right is rt=8
    assert(byTag("e").isEmpty)       // key 3 has no right rows
    // null payload field: a left row between rt=20 (null) and rt=40 must
    // see the rt=20 row's null, not resurrect rt=8's 80
    val mid = TimeOps.asofJoin(Seq((1L, 30L)).toDF("k", "t"), right,
      "k", "rk", "t", "rt", Seq("payload"))
      .select("payload").as[Option[Long]].collect()
    assert(mid.toSeq == Seq(None))
    // SQL null semantics: null keys/times never match — a null-key left
    // row stays unmatched even when a null-key right row exists
    val nullish = TimeOps.asofJoin(
      Seq((Option.empty[Long], Option(30L), "nk"),
        (Option(1L), Option.empty[Long], "nt")).toDF("k", "t", "tag"),
      right.unionByName(Seq((Option.empty[Long], Option(5L), Option(99L)))
        .toDF("rk", "rt", "payload")),
      "k", "rk", "t", "rt", Seq("payload"))
      .select("tag", "payload").as[(String, Option[Long])].collect().toMap
    assert(nullish("nk").isEmpty && nullish("nt").isEmpty)
  }

  test("asofJoin is deterministic on duplicate (key, time) right rows") {
    // two right rows share (k=1, rt=10); the carried payload must be the
    // max payload struct, not shuffle-arrival order
    val left = Seq((1L, 20L)).toDF("k", "t")
    val right = Seq((1L, 10L, 5L), (1L, 10L, 9L), (1L, 10L, 2L))
      .toDF("rk", "rt", "payload")
    (1 to 5).foreach { i =>
      val got = TimeOps.asofJoin(
        left, right.repartition(i), "k", "rk", "t", "rt", Seq("payload"))
        .select("payload").as[Long].collect().toSeq
      assert(got == Seq(9L), s"layout $i")
    }
  }

  test("semanticDedup: nCells=1 equals brute-force transitive closure") {
    val emb = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
      .filter(col("vec_id") < 120)
    val got = DedupOps.semanticDedup(emb, "vec_id", "embedding",
      nCells = 1, threshold = 0.3)
      .select("vec_id", "canonical_id").as[(Long, Long)].collect().toMap
    // brute-force pairs + driver union-find
    val pairs = DedupOps.embeddingDupPairs(emb, "vec_id", "embedding",
      lit(0), 0.3).select("id_l", "id_r").as[(Long, Long)].collect()
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val ids = emb.select("vec_id").as[Long].collect()
    ids.foreach { id => assert(got(id) == find(id), s"vec $id") }
    // keep flag is 1 exactly on canonical rows
    val keeps = DedupOps.semanticDedup(emb, "vec_id", "embedding", 1, 0.3)
      .filter(col("keep") === 1).select("vec_id").as[Long].collect().toSet
    assert(keeps == ids.map(find).toSet)
  }

  test("asofJoin equals the naive reference on randomized data (seeded)") {
    val rng = new scala.util.Random(7)
    val left = Seq.tabulate(300)(i =>
      (rng.nextInt(20).toLong, rng.nextInt(100).toLong, i.toLong))
      .toDF("k", "t", "lid")
    // duplicate (key, time) rows collapsed so the match is well-defined
    val right = Seq.tabulate(300)(i =>
      (rng.nextInt(20).toLong, rng.nextInt(100).toLong, i.toLong))
      .toDF("rk", "rt", "rv")
      .groupBy("rk", "rt").agg(max("rv").as("rv"))
    val fast = TimeOps.asofJoin(left, right, "k", "rk", "t", "rt", Seq("rv"))
      .select("lid", "rv").as[(Long, Option[Long])].collect().toMap
    val w = Window.partitionBy("lid").orderBy(desc("rt"))
    val naive = left.join(right,
        col("k") === col("rk") && col("rt") <= col("t"), "left")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select("lid", "rv").as[(Long, Option[Long])].collect().toMap
    assert(fast == naive)
    assert(fast.size == 300 && fast.values.exists(_.nonEmpty))
  }

  test("sessionize equals a two-pointer driver reference on random data") {
    val rng = new scala.util.Random(11)
    val events = Seq.tabulate(500)(i =>
      (rng.nextInt(10).toLong, rng.nextInt(1000).toLong, i.toLong))
    val df = events.toDF("user_id", "ts", "event_id")
    val got = TimeOps.sessionize(df, "user_id", "ts", gap = 50L, "event_id")
      .select("user_id", "ts", "event_id", "session_seq")
      .as[(Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2, r._3) -> r._4).toMap
    // driver reference: sort per user by (ts, event_id), count gap breaks
    events.groupBy(_._1).foreach { case (u, es) =>
      var seq = 0L
      var last = Long.MinValue
      es.sortBy(e => (e._2, e._3)).foreach { e =>
        if (last == Long.MinValue || e._2 - last > 50L) seq += 1
        last = e._2
        assert(got((u, e._2, e._3)) == seq, s"user $u ts ${e._2}")
      }
    }
  }

  test("incremental near-dups agree with the full self-dedup pair set") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val probe = docs.filter(col("doc_id") % 10 === 0)
    val corpus = docs.filter(col("doc_id") % 10 =!= 0)
    val incr = DedupOps.minhashNearDuplicates(corpus, probe,
      "doc_id", "text", threshold = 0.5)
      .select("probe_id", "corpus_id").as[(Long, Long)].collect().toSet
    val full = DedupOps.minhashDedupPairs(docs, "doc_id", "text",
      threshold = 0.5)
      .select("id_l", "id_r").as[(Long, Long)].collect().toSet
    // every incremental hit appears in the full pair set (as an ordered
    // pair) and every full cross-population pair is found incrementally
    val fullCross = full.filter { case (a, b) =>
      (a % 10 == 0) != (b % 10 == 0) }
    val incrOrdered = incr.map { case (p, c) =>
      (math.min(p, c), math.max(p, c)) }
    assert(incrOrdered == fullCross)
  }

  test("dedupeBySimhash equals the union-find closure of its own pairs") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val pairs = DedupOps.simhashDedupPairs(docs, "doc_id", "text")
      .select("id_l", "id_r").as[(Long, Long)].collect()
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val got = DedupOps.dedupeBySimhash(docs, "doc_id", "text")
      .select("doc_id", "canonical_id", "keep")
      .as[(Long, Long, Int)].collect()
    got.foreach { case (id, canon, keep) =>
      assert(canon == find(id), s"doc $id")
      assert(keep == (if (id == canon) 1 else 0))
    }
    assert(got.length == docs.count())
  }

  test("semanticDedup cells only ever merge subsets of the true closure") {
    val emb = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
    val cells = DedupOps.semanticDedup(emb, "vec_id", "embedding", 8, 0.3)
      .select("vec_id", "canonical_id").as[(Long, Long)].collect()
    val brute = DedupOps.semanticDedup(emb, "vec_id", "embedding", 1, 0.3)
      .select("vec_id", "canonical_id").as[(Long, Long)].collect().toMap
    // cell partitioning can only DROP cross-cell pairs: every celled group
    // must sit inside one brute-force group
    cells.groupBy(_._2).values.foreach { grp =>
      assert(grp.map(g => brute(g._1)).toSet.size == 1)
    }
  }
}
