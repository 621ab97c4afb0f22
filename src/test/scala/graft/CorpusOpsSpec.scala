package graft

import org.apache.spark.sql.functions._
import graft.pipeline.{CorpusOps, DedupOps}

class CorpusOpsSpec extends SparkSpec {
  import spark.implicits._

  test("wordNgrams: sliding word windows, short text -> empty") {
    val df = Seq("a b c d", "a b", "", "  x  y  z  ").toDF("t")
      .select(CorpusOps.wordNgrams(col("t"), 3).as("g"))
    val got = df.as[Seq[String]].collect().toSeq
    assert(got == Seq(Seq("a b c", "b c d"), Seq(), Seq(), Seq("x y z")))
  }

  test("contaminationReport: hand-counted overlap incl. zero rows") {
    val corpus = Seq(
      (1L, "alpha beta gamma delta"),     // grams: "alpha beta gamma", "beta gamma delta"
      (2L, "beta gamma delta epsilon"),   // grams: "beta gamma delta", "gamma delta epsilon"
      (3L, "zeta eta theta iota")         // no overlap with probe
    ).toDF("doc_id", "text")
    val probes = Seq("x alpha beta gamma delta y").toDF("text")
    // probe grams: {x alpha beta, alpha beta gamma, beta gamma delta,
    //               gamma delta y}
    val got = CorpusOps.contaminationReport(corpus, "doc_id", "text",
        probes, "text", 3)
      .orderBy("doc_id").as[(Long, Long, Long)].collect().toSeq
    assert(got == Seq((1L, 2L, 2L), (2L, 1L, 1L), (3L, 0L, 0L)))
  }

  test("tfidfTopK: integer-deterministic rank and smoothed score") {
    val df = Seq(
      (1L, "cat cat dog"),
      (2L, "dog mouse"),
      (3L, "cat fish fish")).toDF("doc_id", "text")
    val got = CorpusOps.tfidfTopK(df, "doc_id", "text", 2)
      .orderBy("doc_id", "rank")
      .as[(Long, String, Long, Long, Double, Int)].collect().toSeq
    // doc 1: cat tf=2 (df 2), dog tf=1 (df 2) -> [cat, dog]
    // doc 2: tf ties at 1 -> lower df first: mouse (df 1) before dog (df 2)
    // doc 3: fish tf=2 first, then cat
    assert(got.map(r => (r._1, r._2)) ==
      Seq((1L, "cat"), (1L, "dog"), (2L, "mouse"), (2L, "dog"),
        (3L, "fish"), (3L, "cat")))
    val fish = got.find(_._2 == "fish").get
    val expected = BigDecimal(2.0 * (math.log(4.0 / 2.0) + 1.0))
      .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(fish._3 == 2L && fish._4 == 1L && fish._5 == expected)
  }

  test("tfidfTopK construction runs ONLY the two materialisation jobs " +
      "(broadcast estimate reads cached block sizes, no stats job)") {
    val sc = spark.sparkContext
    val df = Seq((1L, "cat cat dog"), (2L, "dog mouse"), (3L, "cat fish"))
      .toDF("doc_id", "text")
    // job group is per-thread, so parallel suites sharing the session
    // cannot pollute the count; AQE off, else every shuffle stage is its
    // own job and the count stops being "one job per materialisation"
    sc.setJobGroup("tfidf-jobcount", "probe", interruptOnCancel = false)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try CorpusOps.tfidfTopK(df, "doc_id", "text", 2) // construction only
    finally {
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      sc.clearJobGroup()
    }
    // the status store updates asynchronously — poll until stable
    def n = sc.statusTracker.getJobIdsForGroup("tfidf-jobcount").length
    var (prev, cur, waited) = (-1, n, 0)
    while ((cur != prev || cur == 0) && waited < 8000) {
      Thread.sleep(200); waited += 200; prev = cur; cur = n
    }
    assert(cur == 2,
      s"expected exactly the 2 eager lineage-break jobs, saw $cur")
  }

  test("chunkDocuments: window boundaries and final partial chunk") {
    def chunksOf(s: String): Seq[(Int, String)] =
      CorpusOps.chunkDocuments(Seq((1L, s)).toDF("doc_id", "text"),
          "doc_id", "text", size = 80, stride = 60)
        .orderBy("chunk_id")
        .select(col("chunk_id"), col("chunk_text"))
        .as[(Int, String)].collect().toSeq
    val s80 = "a" * 80
    assert(chunksOf(s80) == Seq((0, s80)))
    val s81 = "ab" * 40 + "Z"
    assert(chunksOf(s81) == Seq((0, s81.substring(0, 80)), (1, s81.substring(60))))
    val s150 = ('a' to 'z').mkString * 6 // 156 chars
    val got150 = chunksOf(s150.take(150))
    assert(got150.map(_._1) == Seq(0, 1, 2))
    assert(got150(1)._2 == s150.substring(60, 140))
    assert(got150(2)._2 == s150.substring(120, 150))
    assert(chunksOf("").isEmpty)
  }

  test("piiCounts and redactPii: all four kinds, exact redaction") {
    val text = "mail a.user+x@test.org or b@c.io, host 10.0.0.1, " +
      "call +44 7700 900123, ssn 123-45-6789 end"
    val df = Seq(text).toDF("t")
    val counts = df.select(CorpusOps.piiCounts(col("t"))
        .map { case (n, c) => c.as(n) }: _*)
      .as[(Int, Int, Int, Int, Boolean)].head()
    assert(counts == ((2, 1, 1, 1, true)))
    val redacted = df.select(CorpusOps.redactPii(col("t"))).as[String].head()
    assert(redacted == "mail <EMAIL> or <EMAIL>, host <IP>, " +
      "call <PHONE>, ssn <SSN> end")
    val clean = df.select(CorpusOps.piiCounts(lit("no pii here 42"))
        .map { case (n, c) => c.as(n) }: _*)
      .as[(Int, Int, Int, Int, Boolean)].head()
    assert(clean == ((0, 0, 0, 0, false)))
  }

  test("repetition metrics: hand-computed ratios") {
    val df = Seq("the THE cat", "a1b22 xy", "").toDF("t")
    val got = df.select(
        round(CorpusOps.dupTokenRatio(col("t")), 9).as("dtr"),
        round(CorpusOps.dupBigramRatio(col("t")), 9).as("dbr"),
        CorpusOps.maxWordLen(col("t")).as("mwl"),
        round(CorpusOps.digitRatio(col("t")), 9).as("dgr"))
      .as[(Double, Double, Int, Double)].collect().toSeq
    // "the THE cat": lowercased tokens (the,the,cat) -> 1/3 dup; bigrams
    // ("the the","the cat") distinct -> 0; longest token 3; no digits
    assert(got(0) == ((BigDecimal(1.0 / 3).setScale(9,
      BigDecimal.RoundingMode.HALF_UP).toDouble, 0.0, 3, 0.0)))
    // "a1b22 xy": 3 digits of 8 chars
    assert(got(1) == ((0.0, 0.0, 5, 0.375)))
    assert(got(2) == ((0.0, 0.0, 0, 0.0)))
  }

  test("repetitionFrame kernel == pure-Column metrics on adversarial rows") {
    val df = Seq(
      (1L, "the THE cat"), (2L, "a1b22 xy"), (3L, ""), (4L, "  pad  ted  "),
      (5L, "x y x y x y"), (6L, "one two one two three two one"),
      (7L, "A" * 40 + " b 12345"), (8L, "solo")).toDF("doc_id", "text")
    val kernel = CorpusOps.repetitionFrame(df, "doc_id", "text")
      .orderBy("doc_id").collect().toSeq
    val cols = df.select(col("doc_id"),
        round(CorpusOps.dupTokenRatio(col("text")), 9).as("dup_token_ratio"),
        round(CorpusOps.dupBigramRatio(col("text")), 9).as("dup_bigram_ratio"),
        CorpusOps.maxWordLen(col("text")).as("max_word_len"),
        round(CorpusOps.digitRatio(col("text")), 9).as("digit_ratio"))
      .orderBy("doc_id").collect().toSeq
    assert(kernel == cols)
  }

  test("packSequences: concat-then-chunk offsets within one stream") {
    // single bucket -> one stream ordered by doc_id; budget 5
    val df = Seq(
      (1L, "a b c"),       // 3 tokens, start 0 -> seq 0, offset 0
      (2L, "d e f g"),     // 4 tokens, start 3 -> seq 0, offset 3 (straddles)
      (3L, "h"),           // 1 token,  start 7 -> seq 1, offset 2
      (4L, "i j k l")      // 4 tokens, start 8 -> seq 1, offset 3
    ).toDF("doc_id", "text")
    val got = CorpusOps.packSequences(df, "doc_id", "text", budget = 5,
        numBuckets = 1)
      .orderBy("doc_id").as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq((1L, 0L, 3L, 0L, 0L), (2L, 0L, 4L, 0L, 3L),
      (3L, 0L, 1L, 1L, 2L), (4L, 0L, 4L, 1L, 3L)))
  }

  test("packSequences: buckets partition the corpus, totals preserved") {
    val df = (1L to 200L).map(i => (i, "w " * (i % 7 + 1).toInt)).toDF("doc_id", "text")
    val packed = CorpusOps.packSequences(df, "doc_id", "text", 32, 4)
    assert(packed.count() == 200)
    assert(packed.select("bucket").distinct().count() == 4)
    // within every (bucket, seq) the offsets stay below the budget and the
    // first doc of each stream starts at (0, 0)
    assert(packed.filter(col("seq_offset") >= 32 || col("seq_offset") < 0).count() == 0)
    val firsts = packed.groupBy("bucket").agg(min_by(
      struct(col("seq_id"), col("seq_offset")), col("doc_id")).as("f"))
    assert(firsts.filter(col("f.seq_id") =!= 0 || col("f.seq_offset") =!= 0).count() == 0)
  }

  test("weightedSample: rate 1 keeps all, rate 0 drops group, deterministic") {
    val df = (1L to 300L).map(i => (i, if (i % 3 == 0) "a" else "b"))
      .toDF("doc_id", "grp")
    val kept = CorpusOps.weightedSample(df, "doc_id", "grp",
      Map("a" -> 1.0, "b" -> 0.0), defaultRate = 0.5)
    val byGrp = kept.groupBy("grp").count().as[(String, Long)].collect().toMap
    assert(byGrp.getOrElse("a", 0L) == 100L && !byGrp.contains("b"))
    // deterministic: same filter twice -> identical ids
    val again = CorpusOps.weightedSample(df, "doc_id", "grp",
      Map("a" -> 1.0, "b" -> 0.0), defaultRate = 0.5)
    assert(kept.select("doc_id").except(again.select("doc_id")).count() == 0)
  }

  test("assignSplits: exhaustive, deterministic, fractions near-target") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val out = CorpusOps.assignSplits(docs, "doc_id",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    val bySplit = out.groupBy("split").count().as[(String, Long)]
      .collect().toMap
    val total = bySplit.values.sum.toDouble
    assert(bySplit.keySet == Set("train", "val", "test"))
    assert(bySplit("train") / total > 0.7 && bySplit("train") / total < 0.9)
    // repartitioning must not move any row between splits
    val again = CorpusOps.assignSplits(docs.repartition(7), "doc_id",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    assert(out.select("doc_id", "split")
      .except(again.select("doc_id", "split")).count() == 0)
  }

  test("compression_ratio: repetitive text compresses far below prose") {
    val df = Seq(
      (1L, "ab" * 500),
      (2L, "the study of distributed query execution involves partitioning, " +
        "shuffles, codegen, statistics, and adaptive replanning at runtime"),
      (3L, "")).toDF("doc_id", "text")
    val rows = df.select(col("doc_id"),
      graft.functions.funcs.compression_ratio(col("text")).as("cr"))
      .as[(Long, Double)].collect().toMap
    assert(rows(1L) < 0.1, s"repetitive ${rows(1L)}")      // junk signal
    assert(rows(2L) > 0.5 && rows(2L) <= 1.2, s"prose ${rows(2L)}")
    assert(rows(3L) == 1.0)
    // deterministic + codegen-friendly (no UDF node in the plan)
    val plan = df.select(graft.functions.funcs.compression_ratio(col("text")))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("ScalaUDF"), plan)
  }

  test("assignSplits on the dedup canonical id is leakage-safe") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val canon = DedupOps.dedupeByMinhash(docs, "doc_id", "text")
    val split = CorpusOps.assignSplits(canon, "canonical_id",
      Seq("train" -> 0.5, "val" -> 0.5))
    // every member of a near-dup cluster lands in ONE split: a val doc can
    // never have a train near-duplicate (train/test contamination)
    val splitsPerCluster = split.groupBy("canonical_id")
      .agg(countDistinct("split").as("k")).agg(max("k")).collect()(0).getLong(0)
    assert(splitsPerCluster == 1L)
  }
}
