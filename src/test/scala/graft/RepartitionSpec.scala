package graft

import org.apache.spark.sql.functions._
import graft.model._
import graft.model.{LevelLibrary => ll}
import graft.operators.Repartition

/** Repartition-by-table-role policy (reference
  * `spark/database_api.py:220-287`): role divisors over the base
  * parallelism, and its application at the engine's persist points. */
class RepartitionSpec extends SparkSpec {
  import spark.implicits._

  /** Run `body` with spark.sql.shuffle.partitions temporarily overridden. */
  private def withShufflePartitions[A](n: Int)(body: => A): A = {
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", n.toString)
    try body finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  test("role divisors follow the reference policy over base = ceil(p/2)") {
    withShufflePartitions(32) {
      val df = Seq(1, 2, 3).toDF("x")
      assert(Repartition.base(df) === 16)
      assert(Repartition.numPartitions(df, Repartition.Predict) === 16)
      assert(Repartition.numPartitions(df, Repartition.ConcatWithTf) === 4)
      assert(Repartition.numPartitions(df, Repartition.ConcatWithTfSample) === 4)
      assert(Repartition.numPartitions(df, Repartition.Neighbours) === 4)
      assert(Repartition.numPartitions(df, Repartition.BlockedIdPairs) === 3)
      assert(Repartition.numPartitions(df, Repartition.Representatives) === 3)
      assert(Repartition.numPartitions(df, Repartition.ClusteringOutput) === 2)
      assert(Repartition(df, Repartition.ConcatWithTf).rdd.getNumPartitions === 4)
    }
  }

  test("concat-with-tf persists with the role's partition count") {
    val df = (1 to 200).map(i => (i.toLong, s"n${i % 7}")).toDF("unique_id", "name")
    val settings = LinkSettings(
      linkType = LinkType.DedupeOnly,
      blockingRules = Seq(BlockingRule.blockOn("name")),
      comparisons = Seq(Comparison("name", Seq(
        ll.nullLevel("name"),
        ll.exactMatch("name", tfAdjustment = true).withM(0.8).withU(0.01),
        ll.elseLevel.withM(0.2).withU(0.99)))))
    val linker = new Linker(df, settings)
    assert(linker.concatWithTf.rdd.getNumPartitions ===
      Repartition.numPartitions(df, Repartition.ConcatWithTf))
    linker.concatWithTf.unpersist()
  }

  test("salted hot-key blocking: identical pair set, smaller max task") {
    withShufflePartitions(8) {
      // one pathologically hot key: 400 of 480 rows share segment 'HOT',
      // so the unsalted join puts ~80k pairs in ONE shuffle partition
      val rows = (1L to 480L).map(i =>
        (i, if (i <= 400) "HOT" else s"cold${i % 8}"))
      val df = rows.toDF("unique_id", "seg")
      def pairs(salts: Int) = graft.operators.Blocking.blockedIdPairs(df,
        LinkSettings(linkType = LinkType.DedupeOnly,
          blockingRules = Seq(BlockingRule.BlockOnRule(Seq("seg"), salts))))
      val unsalted = pairs(1)
      val salted = pairs(4)
      // correctness: the salted union is the SAME pair set
      val u = unsalted.select("join_key_l", "join_key_r")
        .as[(String, String)].collect().sorted.toSeq
      val s4 = salted.select("join_key_l", "join_key_r")
        .as[(String, String)].collect().sorted.toSeq
      assert(s4 == u && u.nonEmpty)
      // scale shape: per-task output spread shrinks ~x salts — each salted
      // sub-join carries 1/salts of the hot key's left rows
      def maxTaskRows(d: org.apache.spark.sql.DataFrame): Long =
        d.rdd.mapPartitions(it => Iterator(it.size.toLong)).collect().max
      val mu = maxTaskRows(unsalted)
      val ms = maxTaskRows(salted)
      assert(ms * 2 <= mu, s"salted max task $ms vs unsalted $mu")
    }
  }

  test("SaltAdvisor: blocking analysis sizes the salt, salted rule keeps " +
      "the pair set and shrinks the max task") {
    withShufflePartitions(8) {
      val rows = (1L to 480L).map(i =>
        (i, if (i <= 400) "HOT" else s"cold${i % 8}"))
      val df = rows.toDF("unique_id", "seg")
      val rule = BlockingRule.BlockOnRule(Seq("seg"))
      val advice = graft.operators.SaltAdvisor.advise(df, rule)
      // 400 of 480 rows share one key; even share = 480/8 = 60 rows/task
      // -> ceil(400/60) = 7 salted sub-joins
      assert(advice.largestBlockRows === 400L && advice.totalRows === 480L)
      assert(advice.recommendedSalts === 7)
      def pairs(r: BlockingRule) = graft.operators.Blocking.blockedIdPairs(df,
        LinkSettings(linkType = LinkType.DedupeOnly, blockingRules = Seq(r)))
      val unsalted = pairs(rule)
      val salted = pairs(advice.applied)
      val u = unsalted.select("join_key_l", "join_key_r")
        .as[(String, String)].collect().sorted.toSeq
      val s7 = salted.select("join_key_l", "join_key_r")
        .as[(String, String)].collect().sorted.toSeq
      assert(s7 == u && u.nonEmpty)
      def maxTaskRows(d: org.apache.spark.sql.DataFrame): Long =
        d.rdd.mapPartitions(it => Iterator(it.size.toLong)).collect().max
      assert(maxTaskRows(salted) * 2 <= maxTaskRows(unsalted))
      // an evenly-distributed key needs no salt
      val even = (1L to 480L).map(i => (i, s"seg${i % 8}"))
        .toDF("unique_id", "seg")
      assert(graft.operators.SaltAdvisor.advise(even, rule)
        .recommendedSalts === 1)
    }
  }

  test("SaltAdvisor: a mostly-null key column is not a hot block") {
    withShufflePartitions(8) {
      // 400 null keys never equi-join (l.k = r.k is null-false), so the
      // hottest REAL block is the 10-row cold one — no salt needed
      val rows = (1L to 480L).map(i =>
        (i, if (i <= 400) None else Some(s"cold${i % 8}")))
      val df = rows.toDF("unique_id", "seg")
      val rule = BlockingRule.BlockOnRule(Seq("seg"))
      val advice = graft.operators.SaltAdvisor.advise(df, rule)
      assert(advice.largestBlockRows === 10L, s"got $advice")
      assert(advice.totalRows === 80L)
      assert(advice.recommendedSalts === 1)
    }
  }

  test("ensureMinParallel widens a narrow localCheckpoint'd frame (no stats)") {
    withShufflePartitions(16) {
      // a LogicalRDD leaf has no size stats (defaultSizeInBytes =
      // Long.MaxValue) — the byte probe alone would always claim "wide
      // enough"; the partition count must come off the materialised RDD
      val narrow = Seq.tabulate(64)(i => (i.toLong, s"d$i")).toDF("id", "t")
        .repartition(2).localCheckpoint()
      assert(narrow.rdd.getNumPartitions === 2)
      val widened = Repartition.ensureMinParallel(narrow)
      assert(widened.rdd.getNumPartitions === 16,
        "kernel-heavy callers must never inherit a tiny checkpoint's task count")
      // an already-wide checkpoint is left alone (no pointless exchange)
      val wide = Seq.tabulate(64)(i => (i.toLong, s"d$i")).toDF("id", "t")
        .repartition(16).localCheckpoint()
      assert(Repartition.ensureMinParallel(wide) eq wide)
      // derived (non-leaf) plans over the checkpoint still probe the leaf
      val derived = narrow.filter(col("id") >= 0).select(col("id"))
      assert(Repartition.ensureMinParallel(derived).rdd.getNumPartitions === 16)
    }
  }

  test("keyed role exchange satisfies a downstream dedupe without a second shuffle") {
    withShufflePartitions(32) {
      val edges = (1 to 100).flatMap(i => Seq((i.toLong, (i + 1).toLong)))
        .toDF("node_id", "neighbour")
      val deduped = Repartition
        .byKeys(edges, Repartition.Neighbours, col("node_id"))
        .dropDuplicates()
      // hash(node_id) clusters every copy of a (node_id, neighbour) pair,
      // so the dedupe aggregate needs no exchange of its own
      val plan = deduped.queryExecution.executedPlan.toString
      assert(plan.split("Exchange hashpartitioning").length - 1 === 1,
        s"expected the role exchange to be the only shuffle:\n$plan")
      assert(deduped.rdd.getNumPartitions ===
        Repartition.numPartitions(edges, Repartition.Neighbours))
    }
  }
}
