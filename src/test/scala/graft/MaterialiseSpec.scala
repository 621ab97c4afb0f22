package graft

import org.apache.spark.sql.functions.{col, sum}

import graft.clustering.{ClusteringOps, ConnectedComponents}
import graft.operators.Materialise
import graft.pipeline.DedupOps

/** The pluggable lineage-break policy (SURVEY §7.1): every policy must
  * produce identical results from the iterative loops, and the parquet /
  * checkpoint policies are the cluster-safe paths the reference defaults to
  * (`spark/database_api.py:289-349`, `optimising_spark.md:36-57`). */
class MaterialiseSpec extends SparkSpec {
  import spark.implicits._

  private def ccEdges = Seq(
    (1L, 2L), (2L, 3L), (10L, 11L), (11L, 12L), (12L, 10L), (20L, 21L))
    .toDF("unique_id_l", "unique_id_r")

  private def docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog again and again"),
    (2L, "the quick brown fox jumps over the lazy dog again and again!"),
    (3L, "entirely different text about spark catalyst optimizer rules"),
    (4L, "entirely different text about spark catalyst optimizer rules"),
    (5L, "nothing like the others at all, a unique snowflake document"))
    .toDF("doc_id", "text")

  private def ccResult(): Map[Long, Long] =
    // force the distributed loop (threshold 0) so the policy is exercised
    ConnectedComponents.run(ccEdges, smallGraphThreshold = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  private def dedupResult(): Set[(Long, Long)] =
    DedupOps.minhashDedupPairs(docs, "doc_id", "text", threshold = 0.5)
      .select("id_l", "id_r").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("all four policies agree on CC + minhash dedupe end-to-end") {
    val expectCc = Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L, 21L -> 20L)
    val expectDup = Set((1L, 2L), (3L, 4L))
    Seq(Materialise.LocalCheckpointPolicy, Materialise.PersistPolicy,
      Materialise.CheckpointPolicy, Materialise.ParquetPolicy).foreach { p =>
      Materialise.withSessionPolicy(spark, p) {
        assert(ccResult() == expectCc, s"CC under ${p.name}")
        assert(dedupResult() == expectDup, s"dedupe under ${p.name}")
      }
    }
  }

  test("spilled lineage break: off-heap blocks under every policy, " +
      "round-trip + release intact") {
    import org.apache.spark.storage.StorageLevel
    Seq(Materialise.LocalCheckpointPolicy, Materialise.PersistPolicy,
      Materialise.CheckpointPolicy, Materialise.ParquetPolicy).foreach { p =>
      Materialise.withSessionPolicy(spark, p) {
        val df = spark.range(0, 1000).selectExpr("id", "id * 2 AS v")
        val eager = Materialise.spilled(df, eager = true)
        assert(eager.collect().length === 1000, s"eager under ${p.name}")
        val lazyCk = Materialise.spilled(df.selectExpr("id"), eager = false)
        assert(lazyCk.count() === 1000, s"lazy under ${p.name}")
        // the two in-memory-capable policies must keep blocks off-heap
        // (Dataset.rdd derives a fresh unpersisted RDD, so inspect the
        // context's registered block sets / the cache manager instead)
        if (p == Materialise.LocalCheckpointPolicy)
          assert(spark.sparkContext.getPersistentRDDs.values
            .map(_.getStorageLevel).exists(l => l.useDisk && !l.useMemory),
            s"no disk-only block set registered after spilled checkpoint")
        if (p == Materialise.PersistPolicy)
          assert(eager.storageLevel === StorageLevel.DISK_ONLY,
            s"persist spilled level")
        // release after consumption is safe (no-op or reclaim per policy)
        val succ = Materialise(eager.selectExpr("sum(v) AS s"), eager = true)
        Materialise.releaseConsumed(eager)
        assert(succ.collect().head.getLong(0) === (0L until 1000L).map(_ * 2).sum)
      }
    }
  }

  test("non-empty contraction (compose branch + releases) under every policy") {
    // Star-shaped components whose centre id EXCEEDS the leaf ids:
    // min-propagation points the centre at its smallest leaf while every
    // other leaf keeps itself, so the pointer forest has several trees per
    // component and the CONTRACTED graph is non-empty — the recursion +
    // compose branch (and its parquet scratch releases) must run, unlike
    // chain graphs where closure jumps collapse each component to one
    // tree. Guards the release(reps)/release(contracted) calls: a
    // premature release would fail the parquet-policy pass loudly.
    val stars = Seq((5L, 1L), (5L, 2L), (5L, 3L),
        (105L, 101L), (105L, 102L))
      .toDF("unique_id_l", "unique_id_r")
    val expect = Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 5L -> 1L,
      101L -> 101L, 102L -> 101L, 105L -> 101L)
    Seq(Materialise.LocalCheckpointPolicy, Materialise.PersistPolicy,
      Materialise.CheckpointPolicy, Materialise.ParquetPolicy).foreach { p =>
      Materialise.withSessionPolicy(spark, p) {
        val got = ConnectedComponents.run(stars, smallGraphThreshold = 0L)
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        assert(got == expect, s"star CC under ${p.name}")
      }
    }
  }

  test("parquet policy round-trips an empty frame (schema preserved)") {
    val empty = ccEdges.filter("unique_id_l < 0")
    val back = Materialise.withPolicy(empty, Materialise.ParquetPolicy,
      eager = true)
    assert(back.columns.toSeq == Seq("unique_id_l", "unique_id_r"))
    assert(back.count() == 0)
  }

  test("parquet policy survives a one-to-one loop and bridges") {
    Materialise.withSessionPolicy(spark, Materialise.ParquetPolicy) {
      val edges = Seq((1L, 2L, 0.9), (2L, 3L, 0.8), (3L, 4L, 0.95))
        .toDF("unique_id_l", "unique_id_r", "match_probability")
      val o2o = ClusteringOps.oneToOne(edges,
          smallGraphThreshold = 0L) // force the distributed loop
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(o2o == Map(1L -> 1L, 2L -> 1L, 3L -> 3L, 4L -> 3L))
      val clusters = Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 1L))
        .toDF("node_id", "cluster_id")
      val cyc = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L))
        .toDF("unique_id_l", "unique_id_r")
      val bridges = ClusteringOps.edgeBridges(clusters, cyc,
          maxClusterSize = 1, distributeOversize = true)
        .collect().map(r => ((r.getLong(1), r.getLong(2)), r.getBoolean(3)))
        .toMap
      assert(bridges == Map((1L, 2L) -> false, (2L, 3L) -> false,
        (3L, 1L) -> false, (3L, 4L) -> true))
    }
  }

  test("unknown policy name fails loudly") {
    spark.conf.set(Materialise.ConfKey, "delta")
    try intercept[IllegalArgumentException](Materialise.policy(spark))
    finally spark.conf.unset(Materialise.ConfKey)
  }

  test("release reclaims a parquet-policy frame's scratch immediately") {
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "t")
    val mat = Materialise.withPolicy(df, Materialise.ParquetPolicy,
      eager = true)
    // locate the scratch dir straight off the materialised plan
    val leaf = mat.queryExecution.optimizedPlan.collectLeaves().head
      .asInstanceOf[org.apache.spark.sql.execution.datasources.LogicalRelation]
    val path = new java.io.File(leaf.relation
      .asInstanceOf[org.apache.spark.sql.execution.datasources.HadoopFsRelation]
      .location.rootPaths.head.toUri.getPath)
    assert(path.exists, s"expected scratch files at $path")
    assert(mat.count() == 2)
    Materialise.release(mat)
    assert(!path.exists, "release must delete the scratch directory")
  }

  test("release is a safe no-op for non-parquet materialisations") {
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "t")
    val cp = Materialise.withPolicy(df, Materialise.LocalCheckpointPolicy,
      eager = false) // lazy: a successor still reads these blocks on compute
    Materialise.release(cp)
    assert(cp.count() == 2, "localCheckpoint frame must survive release")
    // a plain unmaterialised frame is untouched too
    Materialise.release(df)
    assert(df.count() == 2)
  }

  test("release mid-loop: successor unaffected, released frame fails LOUDLY") {
    // the invariant the iterative loops rely on (ConnectedComponents /
    // bridges release each superseded working frame): once the successor
    // is on disk the predecessor may be reclaimed — and any buggy late
    // consumer of the predecessor must blow up, never silently read an
    // empty frame (ignoreMissingFiles would turn that bug into wrong
    // results; assert it is off for this session)
    assert(!spark.conf.get("spark.sql.files.ignoreMissingFiles").toBoolean)
    val a = Materialise.withPolicy(
      Seq((1L, 10L), (2L, 20L), (3L, 30L)).toDF("id", "v"),
      Materialise.ParquetPolicy, eager = true)
    val b = Materialise.withPolicy(
      a.withColumn("v2", col("v") * 2), Materialise.ParquetPolicy,
      eager = true)
    Materialise.release(a)
    // successor has its own files: actions and task re-reads keep working
    assert(b.count() == 3)
    assert(b.agg(sum(col("v2"))).collect()(0).getLong(0) == 120L)
    // the released predecessor must fail loudly on any re-read
    val e = intercept[Exception](a.count())
    def chain(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: chain(t.getCause)
    assert(chain(e).exists(t =>
      t.isInstanceOf[java.io.FileNotFoundException] ||
        Option(t.getMessage).exists(_.contains("FileNotFoundException")) ||
        Option(t.getMessage).exists(_.toLowerCase.contains("path does not exist"))),
      s"expected a loud missing-file failure, got: ${e.getMessage.take(200)}")
  }

  private def allPolicies = Seq(Materialise.LocalCheckpointPolicy,
    Materialise.PersistPolicy, Materialise.CheckpointPolicy,
    Materialise.ParquetPolicy)

  private def stripToRdd(df: org.apache.spark.sql.DataFrame) =
    df.queryExecution.optimizedPlan match {
      case l: org.apache.spark.sql.execution.LogicalRDD => Some(l.rdd)
      case _ => None
    }

  test("weak release with a LAZY successor still in flight is safe under every policy") {
    // the invariant that keeps release() callable from loop code that
    // cannot prove its consumers are materialised: a successor derived
    // lazily from the released frame must still evaluate correctly.
    // (Parquet frames write eagerly at creation, so the successor's files
    // exist before the release; block-backed policies never drop blocks
    // on a weak release.)
    allPolicies.foreach { p =>
      val a = Materialise.withPolicy(
        Seq((1L, 10L), (2L, 20L), (3L, 30L)).toDF("id", "v"), p,
        eager = true)
      assert(a.count() == 3) // materialise lazy-capable policies too
      val b = Materialise.withPolicy(
        a.withColumn("v2", col("v") * 2), p, eager = false)
      Materialise.release(a) // b has NOT evaluated yet
      assert(b.agg(sum(col("v2"))).collect()(0).getLong(0) == 120L,
        s"lazy successor broken after weak release under ${p.name}")
    }
  }

  test("releaseConsumed after an eager successor is safe under every policy") {
    // the strong-release contract the iterative loops rely on: once the
    // successor has materialised its own blocks/files, dropping the
    // predecessor's storage must not disturb it
    allPolicies.foreach { p =>
      val a = Materialise.withPolicy(
        Seq((1L, 10L), (2L, 20L), (3L, 30L)).toDF("id", "v"), p,
        eager = true)
      assert(a.count() == 3)
      val b = Materialise.withPolicy(
        a.withColumn("v2", col("v") * 2), p, eager = true)
      if (p == Materialise.PersistPolicy) b.count(): Unit // eager = count()
      Materialise.releaseConsumed(a)
      assert(b.agg(sum(col("v2"))).collect()(0).getLong(0) == 120L,
        s"eager successor broken after releaseConsumed under ${p.name}")
    }
  }

  test("simulated executor loss between checkpoint and first read: parquet survives, local blocks fail loudly") {
    // why the cluster default is the parquet policy
    // (`optimising_spark.md:36-57`): localCheckpoint blocks live in
    // executor memory and die with the executor; parquet scratch lives on
    // (shared) storage. Simulate the loss by dropping the checkpointed
    // RDD's blocks after materialisation, before the next read.
    val pq = Materialise.withPolicy(
      Seq((1L, 10L), (2L, 20L)).toDF("id", "v"), Materialise.ParquetPolicy,
      eager = true)
    // parquet: losing every cached block costs nothing — the next action
    // re-reads the scratch files
    spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = true))
    assert(pq.count() == 2)
    val lc = Materialise.withPolicy(
      Seq((1L, 10L), (2L, 20L)).toDF("id", "v"),
      Materialise.LocalCheckpointPolicy, eager = true)
    assert(lc.count() == 2)
    // "executor loss": the checkpoint blocks vanish; lineage was truncated
    // at checkpoint time, so the frame is unrecoverable and must fail
    // LOUDLY (silent empty results would corrupt a solve)
    stripToRdd(lc).getOrElse(fail("expected a checkpoint-backed plan"))
      .unpersist(blocking = true)
    val e = intercept[Exception](lc.count())
    assert(Option(e.getMessage).exists(m =>
      m.contains("Checkpoint block") || m.contains("block") ||
        m.contains("Block")),
      s"expected a missing-block failure, got: ${e.getMessage.take(200)}")
  }

  test("release refuses paths it did not write") {
    // a user-loaded parquet relation must never be deleted, even though it
    // is structurally identical to a parquet-policy frame
    val dir = java.nio.file.Files.createTempDirectory("graft-user-parquet")
    val p = dir.toString + "/t"
    Seq((1L, "x")).toDF("id", "t").write.parquet(p)
    val loaded = spark.read.parquet(p)
    Materialise.release(loaded)
    assert(new java.io.File(p).exists, "user parquet must not be deleted")
    assert(loaded.count() == 1)
  }
}
