package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.SparkPlan
import graft.model._
import graft.model.{LevelLibrary => ll}
import graft.operators.TermFrequency

/** Physical-plan assertions for the scale-design claims: broadcasts where
  * promised, whole-stage codegen over the scoring path, no UDF nodes,
  * column pruning at the scan. */
class PlanSpec extends SparkSpec {
  import spark.implicits._

  def people = Seq(
    (0L, "John", "Smith", "london"), (1L, "Jon", "Smith", "london"),
    (2L, "Mary", "Jones", "leeds"), (3L, "Mary", "Jones", "york"))
    .toDF("unique_id", "first_name", "surname", "city")

  def settings = LinkSettings(
    blockingRules = Seq(BlockingRule.blockOn("surname")),
    comparisons = Seq(
      Comparison("first_name", Seq(ll.nullLevel("first_name"),
        ll.exactMatch("first_name").withM(0.9).withU(0.1),
        ll.jaroWinkler("first_name", 0.9).withM(0.05).withU(0.1),
        ll.elseLevel.withM(0.05).withU(0.8))),
      Comparison("city", Seq(ll.nullLevel("city"),
        ll.exactMatch("city", tfAdjustment = true).withM(0.8).withU(0.2),
        ll.elseLevel.withM(0.2).withU(0.8)))),
    probabilityTwoRandomRecordsMatch = 0.01)

  def planString(df: org.apache.spark.sql.DataFrame): String = {
    val plan = df.queryExecution.executedPlan
    plan.toString
  }

  /** Executed-plan text without AQE's echoed "Initial Plan" section (it
    * duplicates every node and would double-count exchanges). */
  def finalPlanString(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)

  test("TF lookup joins broadcast when small — by SIZE, not by forced hint") {
    // joinAll carries no static broadcast hint (a 100 TB corpus' name-TF
    // table can be multi-GB; forcing broadcast would OOM). Smallness must
    // still win: the planner (statically here, AQE at scale) picks a
    // broadcast join for this tiny TF table on its own.
    val tfJoined = TermFrequency.joinAll(people, Seq("city"))
    val s = planString(tfJoined)
    assert(s.contains("BroadcastHashJoin"), s)
  }

  test("pairs-to-records joins broadcast the record side by SIZE decision") {
    // the 100M+-pairs-from-modest-records regime: when the input frame's
    // stats sit under spark.graft.recordsBroadcastBytes, BOTH record-side
    // joins broadcast and the (much larger) pair frame never shuffles
    val s = planString(new Linker(people, settings).predict())
    val broadcasts = s.linesIterator.count(_.contains("BroadcastHashJoin"))
    assert(broadcasts >= 2, s"expected both record joins broadcast:\n$s")
    // ... and the decision is a threshold, not a blanket hint: with the
    // graft limit at zero AND the planner's own size threshold disabled
    // (tiny test frames auto-broadcast under the 10MB default regardless
    // of the hint), the same plan reverts to shuffle joins
    spark.conf.set("spark.graft.recordsBroadcastBytes", "0")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val s0 = planString(new Linker(people, settings).predict())
      assert(s0.contains("SortMergeJoin") || s0.contains("ShuffledHashJoin"),
        s"expected non-broadcast record joins under a 0 limit:\n$s0")
    } finally {
      spark.conf.unset("spark.graft.recordsBroadcastBytes")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }

  test("recordsBroadcastOk: known-small fits, unknown stats decline, 0-limit declines") {
    import graft.operators.ComparisonVectors
    import graft.operators.Materialise.Ops
    // a tiny frame with real stats fits the 256MB default
    assert(ComparisonVectors.recordsBroadcastOk(people))
    // a lineage-broken frame has its origin stats dropped (freshStats) —
    // unknown estimates high and must DECLINE, never broadcast blind
    assert(!ComparisonVectors.recordsBroadcastOk(people.breakLineage(true)))
    // the ceiling is live configuration
    spark.conf.set("spark.graft.recordsBroadcastBytes", "0")
    try assert(!ComparisonVectors.recordsBroadcastOk(people))
    finally spark.conf.unset("spark.graft.recordsBroadcastBytes")
  }

  test("distributed articulation verdict aggregates without an Expand") {
    // "children span >1 aux component" is computed as min != max; a
    // countDistinct here would double the verdict aggregate's input rows
    // through RewriteDistinctAggregates' Expand
    val edges = Seq((1L, 10L, 11L), (1L, 11L, 12L), (1L, 10L, 12L),
      (1L, 10L, 13L)).toDF("cluster_id", "unique_id_l", "unique_id_r")
    val df = graft.clustering.DistributedBridges.articulationPoints(edges)
    assert(!df.queryExecution.executedPlan.toString.contains("Expand"),
      df.queryExecution.executedPlan.toString)
  }

  test("predict plan has no UDF / python / CodegenFallback-only scoring nodes") {
    val linker = new Linker(people, settings)
    val s = planString(linker.predict())
    assert(!s.contains("BatchEvalPython"))
    assert(!s.contains("ScalaUDF"))
    // native jaro-winkler participates directly in the gamma CASE
    assert(s.contains("jaro_winkler"))
  }

  test("predict plan keeps whole-stage codegen stages") {
    val linker = new Linker(people, settings)
    val df = linker.predict()
    df.collect() // AQE finalises the physical plan only on execution
    val s = df.queryExecution.executedPlan.toString
    // '*(n)' prefixes mark WholeStageCodegen stages in the compact plan
    // string; the whole gamma+scoring projection chain must sit inside one
    assert(s.contains("*("), s)
    val scoringLine = s.linesIterator.find(_.contains("match_probability")).get
    assert(scoringLine.trim.replace("+- ", "").startsWith("*("), scoringLine)
  }

  test("parquet scan prunes columns to what the query needs") {
    val dir = "/root/testdata/sf0.001"
    val q = spark.read.parquet(s"$dir/lineitem.parquet")
      .filter(col("l_quantity") > 30)
      .select("l_orderkey", "l_quantity")
    val scan = q.queryExecution.executedPlan.collectLeaves().head.toString
    assert(scan.contains("l_orderkey") && scan.contains("l_quantity"))
    assert(!scan.contains("l_extendedprice"), scan)
    assert(scan.contains("PushedFilters") &&
      scan.contains("GreaterThan(l_quantity"), scan)
  }

  test("model constants are folded into the physical plan as literals") {
    val linker = new Linker(people, settings)
    val s = linker.predict().queryExecution.optimizedPlan.toString
    // log2(0.9/0.1) = 3.1699 appears as a folded literal (possibly merged
    // with the prior); no runtime m/u lookup structures exist
    assert(s.contains("CASE WHEN"))
    assert(!s.toLowerCase.contains("udf"))
  }

  test("asofJoin plan shuffles exactly once (union-merge, no range join)") {
    val left = graft.SparkEntry.eventsUs(spark, "/root/testdata/sf0.001")
      .select(col("event_id"), col("user_id"), col("ts_us").as("t"))
    val right = left.select(col("user_id").as("rk"), col("t").as("rt"),
      col("event_id").as("payload"))
    val joined = graft.pipeline.TimeOps.asofJoin(left, right,
      "user_id", "rk", "t", "rt", Seq("payload"))
    joined.collect()
    val s = finalPlanString(joined)
    val exchanges = s.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(exchanges == 1, s)
    assert(!s.contains("CartesianProduct") && !s.contains("BroadcastNestedLoop"), s)
  }

  test("viewerExampleRows shuffles the predictions exactly once (on gam_concat)") {
    val linker = new Linker(people, settings)
    // sever predict's own plan so only the viewer aggregation is counted
    val preds = linker.predict().localCheckpoint(true)
    val rows = graft.charts.Dashboards.viewerExampleRows(preds, settings, 2)
    rows.collect()
    val s = finalPlanString(rows)
    // one hash shuffle on the pattern for count + example pick; the
    // SinglePartition exchange for the proportion denominator sits ABOVE
    // the example filter, over <= 2 rows per pattern, never the input
    assert(s.linesIterator.count(_.contains("Exchange hashpartitioning")) == 1, s)
  }

  test("assignSplits is a pure scan: zero exchanges") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val s = graft.pipeline.CorpusOps.assignSplits(docs, "doc_id",
      Seq("train" -> 0.9, "val" -> 0.1))
      .queryExecution.executedPlan.toString
    assert(!s.contains("Exchange"), s)
  }

  test("multi-instance kernel expressions compile under codegen (no fallback)") {
    // regression guard: N cosine kernels in ONE generated function used to
    // collide on a fixed local, and non-nullable inputs made the isNull
    // slot a literal — both silently de-codegen'd the stage. With fallback
    // disabled, any such break fails the query instead of hiding.
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val emb = spark.read
        .parquet("/root/testdata/sf0.001/embeddings.parquet")
        .filter(col("vec_id") < 60)
      val out = graft.pipeline.DedupOps.semanticDedup(
        emb, "vec_id", "embedding", nCells = 4, threshold = 0.5)
      assert(out.count() == 60)
    } finally spark.conf.set("spark.sql.codegen.fallback", "true")
  }

  test("bucketed tables join with zero shuffle (co-located join)") {
    // the bucketing path for repeatedly re-joined corpora: pay the
    // exchange once at write time, then every equi-join on the bucket key
    // is exchange-free — THE pattern for a 100 TB corpus joined every run
    val wh = java.nio.file.Files.createTempDirectory("graft-warehouse")
    val c = spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
    c.write.mode("overwrite").bucketBy(4, "c_custkey")
      .sortBy("c_custkey").option("path", s"$wh/cust_bucketed")
      .saveAsTable("cust_bucketed")
    val t = spark.table("cust_bucketed")
    val joined = t.alias("a").join(t.alias("b"), Seq("c_custkey"))
      .groupBy("c_custkey").agg(count(lit(1)).as("n"))
    joined.collect()
    val s = finalPlanString(joined)
    assert(!s.contains("Exchange hashpartitioning"), s)
    spark.sql("DROP TABLE cust_bucketed")
  }

  test("int8 top-k broadcasts the query side; corpus never shuffles before scoring") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val df = graft.pipeline.AnnOps.int8TopK(
      emb.filter(col("vec_id") < 5), emb, 3)
    df.collect()
    val s = finalPlanString(df)
    assert(s.contains("BroadcastExchange"), s)
    // the only hash exchange is the final per-query top-k window
    val hashExchanges = s.linesIterator
      .count(_.contains("Exchange hashpartitioning"))
    assert(hashExchanges == 1, s)
  }

  test("tfidfTopK materialises doc terms once and broadcasts doc frequencies") {
    val docs = Seq((1L, "a b c a"), (2L, "b c d"), (3L, "a e f b"))
      .toDF("doc_id", "text")
    val out = graft.pipeline.CorpusOps.tfidfTopK(docs, "doc_id", "text", 2)
    val s = finalPlanString(out)
    // vocabulary-sized doc frequencies broadcast: the big (doc, term)
    // relation never reshuffles on the term key
    assert(s.contains("BroadcastHashJoin"), s)
    // the tokenize+explode+aggregate stage is cut by the checkpoint — the
    // final plan reads the materialised blocks, it cannot re-run the
    // explode (that double evaluation was 21% of the r4 bench)
    assert(!s.contains("Generate explode"), s)
    assert(s.contains("ExistingRDD"), s)
    assert(out.collect().nonEmpty)
  }

  test("exactDedup is one hash aggregation: a single exchange, no join") {
    val docs = Seq((1L, "same text"), (2L, "same text"), (3L, "other"))
      .toDF("doc_id", "text")
    val out = graft.pipeline.DedupOps.exactDedup(docs, "doc_id", "text")
    out.collect()
    val s = finalPlanString(out)
    assert(s.split("Exchange hashpartitioning").length - 1 == 1, s)
    assert(!s.contains("Join"), s)
    // partial aggregation runs map-side before the exchange
    assert(s.contains("HashAggregate"), s)
  }

  test("contaminationReport broadcasts probe grams; corpus never " +
      "shuffles on the gram key") {
    val corpus = Seq((1L, "the quick brown fox jumps"),
      (2L, "entirely unrelated text here now")).toDF("doc_id", "text")
    val probes = Seq(Tuple1("the quick brown fox leaps")).toDF("text")
    val out = graft.pipeline.CorpusOps.contaminationReport(
      corpus, "doc_id", "text", probes, "text", 3)
    out.collect()
    val s = finalPlanString(out)
    // the gram join must be broadcast (probe side is benchmark-sized):
    // a sort-merge join here would reshuffle the exploded corpus — words
    // x n rows — on the gram key. The exchanges that remain are the
    // probe-side distinct (tiny) and the post-join distinct aggregate
    // over HITS (probe-bounded), never the full exploded corpus.
    assert(s.contains("BroadcastHashJoin"), s)
    assert(!s.contains("SortMergeJoin"),
      s"gram join fell back to sort-merge (corpus reshuffle):\n$s")
    // exactly one gram-only exchange: the probe distinct
    val gramOnly = s.linesIterator.filter(l =>
      l.contains("Exchange hashpartitioning(gram") && !l.contains("doc_id"))
    assert(gramOnly.size == 1, s)
  }

  test("sessionize shuffles once on the entity key") {
    val events = Seq((1L, "u1", 100L), (2L, "u1", 200L), (3L, "u2", 150L))
      .toDF("event_id", "entity", "ts")
    val out = graft.pipeline.TimeOps.sessionize(
      events, "entity", "ts", gap = 60L, tieCol = "event_id")
    out.collect()
    val s = finalPlanString(out)
    // both windows (gap flag, session counter) ride ONE entity exchange —
    // a second sort may appear, but never a second shuffle
    assert(s.split("Exchange hashpartitioning").length - 1 == 1, s)
  }

  test("duplicatedSpans: dup-hash join back broadcasts, no cartesian, no UDF") {
    val docs = Seq((1L, "a b c d e f g h"), (2L, "a b c d e x y z"),
      (3L, "p q r s t u v w")).toDF("doc_id", "text")
    val out = graft.pipeline.DedupOps.duplicatedSpans(docs, "doc_id", "text",
      k = 3)
    out.collect()
    val s = finalPlanString(out)
    // the duplicated-hash table is tiny relative to the window frame: the
    // join back must broadcast (AQE decides by size), never re-shuffle the
    // exploded window relation on the hash key via sort-merge
    assert(s.contains("BroadcastHashJoin"), s)
    assert(!s.contains("CartesianProduct") &&
      !s.contains("BroadcastNestedLoopJoin"), s)
    assert(!s.contains("ScalaUDF") && !s.contains("BatchEvalPython"), s)
  }

  test("removeDuplicatedSpans: bounded start-list join, codegen'd mask") {
    val docs = Seq((1L, "a b c d e f g h"), (2L, "a b c d e x y z"))
      .toDF("doc_id", "text")
    val out = graft.pipeline.DedupOps.removeDuplicatedSpans(docs, "doc_id",
      "text", k = 3)
    out.collect()
    val s = finalPlanString(out)
    assert(!s.contains("CartesianProduct") &&
      !s.contains("BroadcastNestedLoopJoin"), s)
    assert(!s.contains("ScalaUDF"), s)
  }

  test("scoreMissingClusterEdges blocks on the cluster key: no cartesian") {
    val linker = new Linker(people, settings)
    val clusters = people.select(col("unique_id"),
      (col("unique_id") % 2).as("cluster_id"))
    val predictions = linker.predict()
    predictions.collect()
    val out = linker.scoreMissingClusterEdges(clusters, Some(predictions))
    out.collect()
    val s = finalPlanString(out)
    assert(!s.contains("CartesianProduct"), s)
    // the TF normalisation's 1-row total broadcast is the ONLY nested-loop
    // allowed — the missing-pairs path must add none beyond what a plain
    // predict already carries
    def nl(str: String) = str.sliding("BroadcastNestedLoopJoin".length)
      .count(_ == "BroadcastNestedLoopJoin")
    assert(nl(s) <= nl(finalPlanString(predictions)), s)
  }
}
