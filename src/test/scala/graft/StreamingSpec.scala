package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.model._
import graft.model.{LevelLibrary => ll}
import graft.streaming.StreamingLink

/** The r13-era span-ownership state shape (pre-FNV kernel, no
  * `stateVersion` field) — used only to fabricate a v1 checkpoint and
  * prove the current operator REJECTS it instead of silently restoring
  * keys that no longer match anything. */
case class LegacySpanOwnerState(owner: String, ownerTime: Long,
  ownerPositions: Seq[Int])

class StreamingSpec extends SparkSpec {
  import spark.implicits._

  test("streaming find-matches scores each micro-batch against the corpus") {
    val corpus = Seq(
      (0L, "John", "Smith"), (1L, "Mary", "Jones"), (2L, "Peter", "Brown"))
      .toDF("unique_id", "first_name", "surname")
    val settings = LinkSettings(
      linkType = LinkType.DedupeOnly,
      blockingRules = Seq(BlockingRule.blockOn("surname")),
      comparisons = Seq(Comparison("first_name", Seq(
        ll.nullLevel("first_name"),
        ll.exactMatch("first_name").withM(0.9).withU(0.01),
        ll.elseLevel.withM(0.1).withU(0.99)))),
      probabilityTwoRandomRecordsMatch = 0.1)
    val linker = new Linker(corpus, settings)

    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, String, String)]
    stream.addData((100L, "John", "Smith"), (101L, "Zoe", "Nguyen"))
    val out = scala.collection.mutable.ArrayBuffer.empty[Row]
    val query = StreamingLink.startCollecting(linker,
      stream.toDF.toDF("unique_id", "first_name", "surname"), None, out)
    query.awaitTermination(60000)
    // only (0, 100) share the Smith block; Zoe matches nothing
    assert(out.map(r => (r.getAs[Long]("unique_id_l"),
      r.getAs[Long]("unique_id_r"))).toSet == Set((0L, 100L)))
  }

  test("stateful streaming dedup drops repeated fingerprints across batches") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, String, java.sql.Timestamp)]
    def ts(m: Int) = java.sql.Timestamp.valueOf(f"2026-01-01 10:$m%02d:00")
    val deduped = StreamingLink.dedupStream(
      stream.toDF.toDF("doc_id", "text", "ts"), "text", "ts")
    val query = deduped.writeStream.format("memory")
      .queryName("dedup_out").outputMode("append").start()
    stream.addData((1L, "hello world", ts(0)), (2L, "HELLO   world", ts(1)),
      (3L, "different", ts(2)))
    query.processAllAvailable()
    stream.addData((4L, "hello world", ts(3)), (5L, "brand new", ts(4)))
    query.processAllAvailable()
    query.stop()
    val ids = spark.table("dedup_out").collect().map(_.getAs[Long]("doc_id")).toSet
    // 2 dups of 1 (case/whitespace-normalised), 4 dup of 1 across batches
    assert(ids == Set(1L, 3L, 5L))
  }

  test("streaming windowed aggregation with watermark") {
    import org.apache.spark.sql.functions._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(java.sql.Timestamp, String, Double)]
    def ts(m: Int) = java.sql.Timestamp.valueOf(f"2026-01-01 10:$m%02d:00")
    val agg = stream.toDF.toDF("ts", "event_type", "value")
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "5 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum("value").as("v"))
    val query = agg.writeStream.format("memory")
      .queryName("win_out").outputMode("complete").start()
    stream.addData((ts(0), "click", 1.0), (ts(1), "click", 2.0),
      (ts(6), "click", 5.0), (ts(2), "view", 1.0))
    query.processAllAvailable()
    query.stop()
    val rows = spark.table("win_out").collect()
      .map(r => (r.getStruct(0).getTimestamp(0).toString.substring(11, 16),
        r.getString(1)) -> (r.getLong(2), r.getDouble(3))).toMap
    assert(rows(("10:00", "click")) == (2L, 3.0))
    assert(rows(("10:05", "click")) == (1L, 5.0))
    assert(rows(("10:00", "view")) == (1L, 1.0))
  }

  test("stateful simhash band dedup flags near-dup candidates across batches") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, String, java.sql.Timestamp)]
    def ts(m: Int) = java.sql.Timestamp.valueOf(f"2026-01-01 10:$m%02d:00")
    val verdicts = StreamingLink.simhashBandDedupStream(
      stream.toDF.toDF("doc_id", "text", "ts"), "doc_id", "text", "ts")
    val query = verdicts.writeStream.format("memory")
      .queryName("band_out").outputMode("append").start()
    // long enough that a one-char edit leaves >=1 of the 4 simhash bands
    // intact (hamming 6, 1 shared band for this fixture)
    val base = "the quick brown fox jumps over the lazy dog again and again " +
      "while the sun sets slowly behind the tall mountains of the west"
    stream.addData((1L, base, ts(0)), (2L, "completely different content here", ts(1)))
    query.processAllAvailable()
    // doc 3 = near-dup of doc 1 (one word changed); doc 4 fresh
    stream.addData((3L, base.replace("lazy", "hazy"), ts(2)),
      (4L, "yet another unrelated document body", ts(3)))
    query.processAllAvailable()
    query.stop()
    val perDoc = spark.table("band_out").collect()
      .map(r => (r.getAs[String]("docId"), r.getAs[Boolean]("firstInBucket")))
      .groupBy(_._1).view.mapValues(vs => vs.forall(_._2)).toMap
    // every doc emits exactly 4 verdicts
    assert(spark.table("band_out").count() == 16)
    // batch 1: both docs fully fresh
    assert(perDoc("1") && perDoc("2"))
    // doc 3 shares >=1 band with doc 1 (hamming small) -> not all-first;
    // doc 4 collides with nothing
    assert(!perDoc("3"))
    assert(perDoc("4"))
  }

  test("stateful minhash-LSH band dedup flags near-dup candidates across batches") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, String, java.sql.Timestamp)]
    def ts(m: Int) = java.sql.Timestamp.valueOf(f"2026-01-01 10:$m%02d:00")
    val verdicts = StreamingLink.minhashBandDedupStream(
      stream.toDF.toDF("doc_id", "text", "ts"), "doc_id", "text", "ts")
    val query = verdicts.writeStream.format("memory")
      .queryName("mh_band_out").outputMode("append").start()
    val base = "the quick brown fox jumps over the lazy dog again and again " +
      "while the sun sets slowly behind the tall mountains of the west"
    val other = "completely different content with nothing shared at all " +
      "between these two documents of reasonable length for shingling"
    stream.addData((1L, base, ts(0)), (2L, other, ts(1)))
    query.processAllAvailable()
    // doc 3 = near-dup of doc 1 (one word changed -> high shingle jaccard,
    // so >=1 of the 8 bands keeps all 4 minhash slots); doc 4 fresh;
    // doc 5 = EXACT copy of doc 2 from the PREVIOUS batch (all 8 bands
    // collide against live state); doc 6 whitespace-only (no shingles,
    // dropped like the batch operator's size(toks) > 0 filter)
    stream.addData((3L, base.replace("lazy", "hazy"), ts(2)),
      (4L, "yet another unrelated document body to keep around", ts(3)),
      (5L, other, ts(4)), (6L, "   ", ts(5)))
    query.processAllAvailable()
    query.stop()
    val rows = spark.table("mh_band_out").collect()
      .map(r => (r.getAs[String]("docId"), r.getAs[Boolean]("firstInBucket")))
    val perDoc = rows.groupBy(_._1).view
      .mapValues(vs => (vs.length, vs.count(_._2))).toMap
    // 8 bands per surviving doc, none for the empty doc
    assert(!perDoc.contains("6"))
    assert(perDoc.keySet == Set("1", "2", "3", "4", "5"))
    assert(perDoc.values.forall(_._1 == 8))
    // batch 1: both docs fully fresh
    assert(perDoc("1")._2 == 8 && perDoc("2")._2 == 8)
    // near-dup shares >=1 band with doc 1; fresh doc collides nowhere
    assert(perDoc("3")._2 < 8)
    assert(perDoc("4")._2 == 8)
    // exact dup of a prior-batch doc: every band bucket already occupied
    assert(perDoc("5")._2 == 0)
    // the stream's candidate set agrees with the batch operator on the
    // same corpus: docs flagged (some band collision) = docs the batch
    // LSH banding pairs up
    val docs = Seq((1L, base), (2L, other),
      (3L, base.replace("lazy", "hazy")),
      (4L, "yet another unrelated document body to keep around"), (5L, other))
      .toDF("doc_id", "text")
    val batchPairs = graft.pipeline.DedupOps
      .minhashDedupPairs(docs, "doc_id", "text", threshold = 0.0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val streamCandidates =
      perDoc.collect { case (d, (_, first)) if first < 8 => d.toLong }.toSet
    assert(batchPairs.flatMap(p => Set(p._1, p._2)).diff(Set(1L, 2L)) ==
      streamCandidates)
  }

  test("streaming decontamination flags probe n-gram overlap per batch") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.streaming.Trigger
    val probes = Seq((1L, "the quick brown fox jumps over dogs"))
      .toDF("pid", "ptext")
    val stream = MemoryStream[(Long, String)]
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    stream.addData((10L, "something with the quick brown fox inside it"),
      (11L, "completely unrelated words only"))
    val query = graft.streaming.StreamingLink.contaminationStream(
      stream.toDF.toDF("doc_id", "text"), "doc_id", "text",
      probes, "ptext", n = 3) { (report, _) =>
      out ++= report.collect().map(r =>
        (r.getAs[Long]("doc_id"), r.getAs[Long]("n_hits")))
    }.trigger(Trigger.AvailableNow()).start()
    query.awaitTermination(60000)
    val byDoc = out.toMap
    assert(byDoc(10L) >= 2) // shares "the quick brown" + "quick brown fox"
    assert(byDoc(11L) == 0)
  }

  test("stateful streaming sessionization closes sessions on gap + watermark") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, java.sql.Timestamp, Double)]
    def ts(h: Int, m: Int) = java.sql.Timestamp.valueOf(f"2026-01-01 $h%02d:$m%02d:00")
    val sessions = StreamingLink.sessionizeStream(
      stream.toDF.toDF("user_id", "ts", "value"),
      "user_id", "ts", "value", gapMs = 30 * 60 * 1000L,
      watermarkDelay = "0 seconds")
    val query = sessions.writeStream.format("memory")
      .queryName("sess_out").outputMode("append").start()
    // user 1: two events 10 min apart (one session), then a 2h gap opens a
    // second session IN the same batch -> first session closes inline
    stream.addData((1L, ts(10, 0), 1.5), (1L, ts(10, 10), 2.5),
      (1L, ts(12, 30), 4.0), (2L, ts(10, 0), 9.0))
    query.processAllAvailable()
    val inline = spark.table("sess_out").as[(Long, Long, Long, Long, Long)]
      .collect().toSet
    // user 1's first session closes INLINE (the 12:30 event is past its
    // gap); user 2's closes on timeout as the watermark reaches 12:30;
    // user 1's open 12:30 session must NOT have been emitted yet
    assert(inline == Set(
      (1L, ts(10, 0).getTime, ts(10, 10).getTime, 2L, 1500000L + 2500000L),
      (2L, ts(10, 0).getTime, ts(10, 0).getTime, 1L, 9000000L)))
    // advancing event time far enough moves the watermark past every open
    // session's gap horizon -> both remaining sessions close on timeout
    stream.addData((3L, ts(20, 0), 0.0))
    query.processAllAvailable()
    stream.addData((3L, ts(21, 0), 0.0))
    query.processAllAvailable()
    query.stop()
    val all = spark.table("sess_out").as[(Long, Long, Long, Long, Long)]
      .collect().toSet
    assert(all.contains((1L, ts(12, 30).getTime, ts(12, 30).getTime, 1L, 4000000L)))
    assert(all.contains((2L, ts(10, 0).getTime, ts(10, 0).getTime, 1L, 9000000L)))
  }

  test("incremental clustering stream maintains live clusters across batches") {
    val corpus = Seq(
      (0L, "John", "Smith"), (1L, "Mary", "Jones"), (2L, "Peter", "Brown"))
      .toDF("unique_id", "first_name", "surname")
    val settings = LinkSettings(
      linkType = LinkType.DedupeOnly,
      blockingRules = Seq(BlockingRule.blockOn("surname")),
      comparisons = Seq(Comparison("first_name", Seq(
        ll.nullLevel("first_name"),
        ll.exactMatch("first_name").withM(0.9).withU(0.01),
        ll.elseLevel.withM(0.1).withU(0.99)))),
      probabilityTwoRandomRecordsMatch = 0.1)
    val linker = new Linker(corpus, settings)

    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, String, String)]
    val (writer, live) = StreamingLink.incrementalClusterStream(linker,
      stream.toDF.toDF("unique_id", "first_name", "surname"), threshold = 0.5)
    val query = writer.start()
    def state(): Set[(Long, Long)] = live.clusters()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    stream.addData((100L, "John", "Smith"), (200L, "Zoe", "Nguyen"))
    query.processAllAvailable()
    // 100 matched corpus record 0; 200 matched nothing (stays out)
    assert(state() == Set((0L, 0L), (100L, 0L)))

    stream.addData((101L, "John", "Smith"))
    query.processAllAvailable()
    // 101 also matches 0 -> joins the live cluster through its rep
    assert(state() == Set((0L, 0L), (100L, 0L), (101L, 0L)))
    query.stop()
  }

  test("stateful duplicated-window detection marks cross-batch foreign spans") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, String, java.sql.Timestamp)]
    def ts(m: Int) = java.sql.Timestamp.valueOf(f"2026-01-01 10:$m%02d:00")
    val verdicts = StreamingLink.dupWindowStream(
      stream.toDF.toDF("doc_id", "text", "ts"), "doc_id", "text", "ts", k = 3)
    val query = verdicts.writeStream.format("memory")
      .queryName("dupwin_out").outputMode("append").start()
    // batch 1: doc 1 owns its windows; doc 2 disjoint
    stream.addData(
      (1L, "q w e r t x1 x2", ts(0)),
      (2L, "a b c d e", ts(1)))
    query.processAllAvailable()
    // batch 2: doc 3 repeats doc 1's "q w e r t" run (3 foreign windows
    // at positions 1..3); doc 4 fresh
    stream.addData(
      (3L, "y1 q w e r t y2", ts(2)),
      (4L, "m n o p", ts(3)))
    query.processAllAvailable()
    query.stop()
    val rows = spark.table("dupwin_out").collect()
      .map(r => (r.getAs[String]("docId"), r.getAs[Int]("pos"),
        r.getAs[Boolean]("foreign")))
    val perDoc = rows.groupBy(_._1)
    // every window of docs 1, 2, 4 is owned (5, 3, 2 windows respectively)
    assert(perDoc("1").length == 5 && perDoc("1").forall(!_._3))
    assert(perDoc("2").length == 3 && perDoc("2").forall(!_._3))
    assert(perDoc("4").length == 2 && perDoc("4").forall(!_._3))
    // doc 3: foreign exactly at the shared run's window starts 1..3
    val d3 = perDoc("3").map(v => v._2 -> v._3).toMap
    assert(d3 == Map(0 -> false, 1 -> true, 2 -> true, 3 -> true, 4 -> false))
  }

  test("restoring a pre-versioned (v1) span-dedup checkpoint fails loudly " +
      "with a state-schema error, never silently") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    import org.apache.spark.sql.types._
    val root = java.nio.file.Files.createTempDirectory("dupwin_ckpt_v1").toFile
    val inDir = new java.io.File(root, "in"); inDir.mkdirs()
    val ckpt = new java.io.File(root, "ckpt").getPath
    val schema = StructType(Seq(StructField("doc_id", LongType),
      StructField("text", StringType), StructField("ts", TimestampType)))
    def writeBatch(name: String, rows: Seq[String]): Unit =
      java.nio.file.Files.writeString(
        new java.io.File(inDir, name).toPath, rows.mkString("\n") + "\n")
    def src = spark.readStream.schema(schema)
      .option("timestampFormat", "yyyy-MM-dd HH:mm:ss").json(inDir.getPath)

    writeBatch("b1.json", Seq(
      """{"doc_id":1,"text":"q w e r t","ts":"2026-01-01 10:00:00"}"""))
    // v1 twin: same source, same key (the window hash), same single
    // stateful operator — but the r13 state shape (no stateVersion).
    val legacy = src
      .withWatermark("ts", "1 hour")
      .select(col("doc_id").cast("string").as("docId"),
        col("ts").as("eventTime"),
        posexplode(graft.pipeline.DedupOps.windowHashesText(col("text"), 3))
          .as(Seq("pos", "h")))
      .select(col("docId"), col("pos"), col("h"), col("eventTime"))
      .as[graft.streaming.WindowObs]
      .groupByKey(_.h)
      .flatMapGroupsWithState[LegacySpanOwnerState, graft.streaming.WindowVerdict](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        case (_, rows, state: GroupState[LegacySpanOwnerState]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val b = rows.toSeq
            state.update(LegacySpanOwnerState(b.head.docId, 0L, Nil))
            state.setTimeoutTimestamp(b.map(_.eventTime.getTime).max, "1 hour")
            Iterator.empty
          }
      }
    val q1 = legacy.writeStream.format("noop")
      .option("checkpointLocation", ckpt).outputMode("append").start()
    q1.processAllAvailable(); q1.stop()

    writeBatch("b2.json", Seq(
      """{"doc_id":2,"text":"q w e r t","ts":"2026-01-01 10:05:00"}"""))
    val q2 = StreamingLink.dupWindowStream(src, "doc_id", "text", "ts", k = 3)
      .writeStream.format("noop").option("checkpointLocation", ckpt)
      .outputMode("append").start()
    val ex = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q2.processAllAvailable()
    }
    try q2.stop() catch { case _: Throwable => () }
    val messages = Iterator.iterate[Throwable](ex)(_.getCause)
      .takeWhile(_ != null).take(10)
      .map(t => Option(t.getMessage).getOrElse("")).mkString(" | ")
    assert(
      messages.contains("STATE_STORE_VALUE_SCHEMA_NOT_COMPATIBLE") ||
        messages.toLowerCase.contains("state value schema"),
      s"expected a state-schema incompatibility error, got: $messages")
  }

  test("band-bucket and span-ownership state behave identically on the " +
      "HDFS-backed and RocksDB state-store providers") {
    implicit val sqlCtx = spark.sqlContext
    def ts(m: Int) = java.sql.Timestamp.valueOf(f"2026-01-01 10:$m%02d:00")
    val base = "the quick brown fox jumps over the lazy dog again and again " +
      "while the sun sets slowly behind the tall mountains of the west"
    val other = "completely different content with nothing shared at all " +
      "between these two documents of reasonable length for shingling"

    /** Run both stateful pipelines (minhash band dedup across two
      * batches + dup-window ownership across two batches) under the given
      * provider; return canonical result sets. */
    def runUnder(provider: Option[String])
        : (Set[(String, Int, Boolean)], Set[(String, Int, Boolean)]) = {
      val key = "spark.sql.streaming.stateStore.providerClass"
      val prior = spark.conf.getOption(key)
      provider.foreach(spark.conf.set(key, _))
      try {
        val tag = provider.map(_ => "rocks").getOrElse("hdfs")
        val mh = MemoryStream[(Long, String, java.sql.Timestamp)]
        val mhQuery = StreamingLink.minhashBandDedupStream(
            mh.toDF.toDF("doc_id", "text", "ts"), "doc_id", "text", "ts")
          .writeStream.format("memory").queryName(s"prov_mh_$tag")
          .outputMode("append").start()
        mh.addData((1L, base, ts(0)), (2L, other, ts(1)))
        mhQuery.processAllAvailable()
        mh.addData((3L, base.replace("lazy", "hazy"), ts(2)),
          (4L, "yet another unrelated document body to keep around", ts(3)),
          (5L, other, ts(4)))
        mhQuery.processAllAvailable()
        mhQuery.stop()
        val bands = spark.table(s"prov_mh_$tag").collect()
          .map(r => (r.getAs[String]("docId"), r.getAs[Int]("band"),
            r.getAs[Boolean]("firstInBucket"))).toSet

        val dw = MemoryStream[(Long, String, java.sql.Timestamp)]
        val dwQuery = StreamingLink.dupWindowStream(
            dw.toDF.toDF("doc_id", "text", "ts"), "doc_id", "text", "ts",
            k = 3)
          .writeStream.format("memory").queryName(s"prov_dw_$tag")
          .outputMode("append").start()
        dw.addData((1L, "q w e r t x1 x2", ts(0)), (2L, "a b c d e", ts(1)))
        dwQuery.processAllAvailable()
        dw.addData((3L, "y1 q w e r t y2", ts(2)), (4L, "m n o p", ts(3)))
        dwQuery.processAllAvailable()
        dwQuery.stop()
        val spans = spark.table(s"prov_dw_$tag").collect()
          .map(r => (r.getAs[String]("docId"), r.getAs[Int]("pos"),
            r.getAs[Boolean]("foreign"))).toSet
        (bands, spans)
      } finally {
        prior match {
          case Some(v) => spark.conf.set(key, v)
          case None => spark.conf.unset(key)
        }
      }
    }

    val (hdfsBands, hdfsSpans) = runUnder(None)
    val (rocksBands, rocksSpans) = runUnder(Some(
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"))
    assert(hdfsBands.nonEmpty && hdfsSpans.nonEmpty)
    assert(rocksBands == hdfsBands,
      "band-bucket verdicts diverge between state-store providers")
    assert(rocksSpans == hdfsSpans,
      "span-ownership verdicts diverge between state-store providers")
    // sanity: the rocks run actually flagged the cross-batch structure
    assert(rocksBands.count { case (d, _, first) => d == "5" && !first } == 8)
    assert(rocksSpans.count { case (d, _, foreign) => d == "3" && foreign } == 3)
  }

  test("stateful perceptual-image band dedup flags shifted copies " +
      "across batches and drops non-images") {
    import graft.pipeline.Codecs
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, Array[Byte], java.sql.Timestamp)]
    def ts(m: Int) = java.sql.Timestamp.valueOf(f"2026-01-01 10:$m%02d:00")
    def px(bright: Int => Boolean): Array[Byte] =
      Array.tabulate(256) { p =>
        val base = (p * 200 / 255) + 20
        (if (bright(p / 32)) math.min(base + 55, 255) else base).toByte
      }
    val original = Codecs.encodeBmp24(px(b => b % 3 == 0), 16, 16)
    val shifted = Codecs.encodeBmp24(
      px(b => b % 3 == 0).map(v => math.min((v & 0xFF) + 25, 255).toByte),
      16, 16)
    val other = Codecs.encodeBmp24(px(b => b % 2 == 0).reverse, 16, 16)
    val verdicts = StreamingLink.imageBandDedupStream(
      stream.toDF.toDF("media_id", "payload", "ts"), "media_id", "payload", "ts")
    val query = verdicts.writeStream.format("memory")
      .queryName("img_band_out").outputMode("append").start()
    stream.addData((1L, original, ts(0)), (2L, other, ts(1)))
    query.processAllAvailable()
    // batch 2: brightness-shifted copy of 1 (same aHash -> every band
    // collides); fresh structure; a non-image payload (dropped)
    stream.addData((3L, shifted, ts(2)),
      (4L, "not an image".getBytes("UTF-8"), ts(3)))
    query.processAllAvailable()
    query.stop()
    val perDoc = spark.table("img_band_out").collect()
      .map(r => (r.getAs[String]("docId"), r.getAs[Boolean]("firstInBucket")))
      .groupBy(_._1).view.mapValues(vs => vs.count(_._2)).toMap
    assert(perDoc.keySet == Set("1", "2", "3")) // non-image absent
    assert(perDoc("1") == 4 && perDoc("2") == 4) // batch 1 fresh
    assert(perDoc("3") == 0, "shifted copy must collide on every band")
  }

  test("streaming span-dedup APPLY strips foreign spans in-stream and " +
      "agrees with the batch operator on the same corpus") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, String, java.sql.Timestamp)]
    def ts(m: Int) = java.sql.Timestamp.valueOf(f"2026-01-01 10:$m%02d:00")
    val corpus = Seq(
      (1L, "q w e r t x1 x2", ts(0)), (2L, "a b c d e", ts(1)),
      (3L, "y1 q w e r t y2", ts(2)), (4L, "m n o p", ts(3)))
    spark.conf.set(
      "spark.sql.streaming.statefulOperator.checkCorrectness.enabled", "false")
    val deduped = StreamingLink.dedupSpansApplyStream(
      stream.toDF.toDF("doc_id", "text", "ts"), "doc_id", "text", "ts", k = 3)
    val query = deduped.writeStream.format("memory")
      .queryName("dedup_apply_out").outputMode("append").start()
    stream.addData(corpus.take(2))
    query.processAllAvailable()
    stream.addData(corpus.drop(2)) // doc 3 arrives AFTER its owner
    query.processAllAvailable()
    query.stop()
    spark.conf.unset(
      "spark.sql.streaming.statefulOperator.checkCorrectness.enabled")
    // last row per doc wins (corrections supersede)
    val got = spark.table("dedup_apply_out").collect()
      .map(r => (r.getAs[String]("docId"), r.getAs[String]("textDeduped"),
        r.getAs[Int]("nRemoved")))
      .groupBy(_._1).map { case (d, rows) => d -> (rows.last._2, rows.last._3) }
    // batch operator on the same corpus (ownership = min doc id == the
    // event-time order here) must agree doc for doc
    import spark.implicits._
    val batch = graft.pipeline.DedupOps.removeDuplicatedSpans(
        corpus.map(c => (c._1, c._2)).toDF("doc_id", "text"),
        "doc_id", "text", k = 3)
      .collect().map(r => (r.get(0).toString,
        (r.getAs[String]("text_deduped"), r.getAs[Long]("n_removed").toInt)))
      .toMap
    assert(got == batch, s"stream $got vs batch $batch")
    assert(got("3") == (("y1 y2", 5))) // the shared run vanished downstream
    assert(got("1")._2 == 0)           // the owner keeps its text
  }

  test("a late record with an earlier event time takes window ownership " +
      "and the demoted doc is re-emitted corrected") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, String, java.sql.Timestamp)]
    def ts(m: Int) = java.sql.Timestamp.valueOf(f"2026-01-01 10:$m%02d:00")
    spark.conf.set(
      "spark.sql.streaming.statefulOperator.checkCorrectness.enabled", "false")
    val deduped = StreamingLink.dedupSpansApplyStream(
      stream.toDF.toDF("doc_id", "text", "ts"), "doc_id", "text", "ts", k = 3)
    val query = deduped.writeStream.format("memory")
      .queryName("dedup_apply_late").outputMode("append").start()
    // doc 10 arrives first but carries the LATER event time
    stream.addData((10L, "p q r s t", ts(5)))
    query.processAllAvailable()
    // doc 9, same content, earlier event time, still inside the watermark:
    // it must take ownership and demote doc 10 retroactively
    stream.addData((9L, "p q r s t", ts(4)))
    query.processAllAvailable()
    query.stop()
    spark.conf.unset(
      "spark.sql.streaming.statefulOperator.checkCorrectness.enabled")
    val rows = spark.table("dedup_apply_late").collect()
      .map(r => (r.getAs[String]("docId"), r.getAs[String]("textDeduped"),
        r.getAs[Int]("nRemoved"), r.getAs[Boolean]("corrected")))
    val last = rows.groupBy(_._1).map { case (d, rs) => d -> rs.last }
    assert(last("9") == (("9", "p q r s t", 0, false)))   // owner: intact
    assert(last("10") == (("10", "", 5, true)))           // demoted, corrected
    // and the correction is a RE-emission: doc 10 appeared uncorrected first
    assert(rows.exists(r => r._1 == "10" && !r._4 && r._3 == 0))
  }

  test("span-dedup APPLY emits blank and whitespace-only documents " +
      "(matching the batch operator) instead of holding them in state") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, String, java.sql.Timestamp)]
    def ts(m: Int) = java.sql.Timestamp.valueOf(f"2026-01-01 10:$m%02d:00")
    spark.conf.set(
      "spark.sql.streaming.statefulOperator.checkCorrectness.enabled", "false")
    val deduped = StreamingLink.dedupSpansApplyStream(
      stream.toDF.toDF("doc_id", "text", "ts"), "doc_id", "text", "ts", k = 3)
    val query = deduped.writeStream.format("memory")
      .queryName("dedup_apply_blank").outputMode("append").start()
    stream.addData(Seq((1L, "", ts(0)), (2L, "   ", ts(1)),
      (3L, "a b c d", ts(2))))
    query.processAllAvailable()
    query.stop()
    spark.conf.unset(
      "spark.sql.streaming.statefulOperator.checkCorrectness.enabled")
    val got = spark.table("dedup_apply_blank").collect()
      .map(r => (r.getAs[String]("docId"), r.getAs[String]("textDeduped"),
        r.getAs[Int]("nRemoved"))).toSet
    assert(got == Set(("1", "", 0), ("2", "", 0), ("3", "a b c d", 0)))
  }
}
