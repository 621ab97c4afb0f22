package graft

import org.apache.spark.sql.functions._

import graft.clustering.{ClusteringOps, ConnectedComponents}

/** Multi-threshold clustering with stable-cluster reuse
  * (`clustering.py:158-240,347-449`): the incremental result must be
  * bit-identical to an independent full CC solve at every threshold. */
class MultiThresholdSpec extends SparkSpec {
  import spark.implicits._

  private def edgeFrame(edges: Seq[(Long, Long, Double)]) =
    edges.toDF("unique_id_l", "unique_id_r", "match_probability")

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.select("threshold", "node_id", "cluster_id").collect()
      .map(r => (r.getDouble(0), r.getLong(1), r.getLong(2))).toSet

  test("incremental result equals a full re-solve at every threshold") {
    // deterministic pseudo-random graph: chains + cross links, probs spread
    val edges = (0L until 400L).map { i =>
      val p = ((i * 37 + 11) % 100) / 100.0
      (i % 120, (i * 7 + 1) % 120, p)
    }.filter { case (a, b, _) => a != b }
    val thresholds = Seq(0.25, 0.5, 0.75, 0.9)
    val inc = ClusteringOps.atMultipleThresholds(edgeFrame(edges), thresholds)
    val full = thresholds.map { t =>
      ConnectedComponents.run(
          edgeFrame(edges).filter(col("match_probability") >= t))
        .withColumn("threshold", lit(t))
    }.reduce(_.unionByName(_))
    assert(rows(inc) == rows(full))
  }

  test("splitting clusters, disappearing nodes, and fully stable clusters") {
    // cluster {1,2,3} split at 0.8 (edge 2-3 at 0.6); {10,11} stable
    // throughout; {20,21} vanishes above 0.4
    val edges = Seq(
      (1L, 2L, 0.9), (2L, 3L, 0.6),
      (10L, 11L, 0.95),
      (20L, 21L, 0.4))
    val out = ClusteringOps.atMultipleThresholds(edgeFrame(edges),
      Seq(0.3, 0.7, 0.9))
    val got = rows(out)
    val expected = Set(
      (0.3, 1L, 1L), (0.3, 2L, 1L), (0.3, 3L, 1L),
      (0.3, 10L, 10L), (0.3, 11L, 10L), (0.3, 20L, 20L), (0.3, 21L, 20L),
      (0.7, 1L, 1L), (0.7, 2L, 1L), (0.7, 10L, 10L), (0.7, 11L, 10L),
      (0.9, 1L, 1L), (0.9, 2L, 1L), (0.9, 10L, 10L), (0.9, 11L, 10L))
    assert(got == expected)
  }

  test("single threshold degenerates to one CC solve") {
    val edges = Seq((1L, 2L, 0.9), (3L, 4L, 0.2))
    val out = ClusteringOps.atMultipleThresholds(edgeFrame(edges), Seq(0.5))
    assert(rows(out) == Set((0.5, 1L, 1L), (0.5, 2L, 1L)))
  }

  private def ccRows(df: org.apache.spark.sql.DataFrame) =
    df.select("node_id", "cluster_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("incrementalCluster equals a full re-solve over old + new edges") {
    val rnd = new scala.util.Random(424242)
    for (trial <- 1 to 4) {
      val e1 = (0 until 150).map(_ =>
        (rnd.nextInt(80).toLong, rnd.nextInt(80).toLong))
        .filter(p => p._1 != p._2)
      val e2 = (0 until 60).map(_ =>
        (rnd.nextInt(120).toLong, rnd.nextInt(120).toLong)) // some NEW nodes
        .filter(p => p._1 != p._2)
      val f1 = e1.toDF("unique_id_l", "unique_id_r")
      val f2 = e2.toDF("unique_id_l", "unique_id_r")
      val existing = ConnectedComponents.run(f1)
      val inc = ClusteringOps.incrementalCluster(existing, f2)
      val full = ConnectedComponents.run(f1.unionByName(f2))
      // full re-solve covers endpoints of e1+e2; incremental covers the
      // same set (existing members + new endpoints) — identical labels
      assert(ccRows(inc) == ccRows(full), s"trial $trial")
    }
  }

  test("incrementalCluster: edges between known clusters, new nodes, no-ops") {
    val existing = Seq((1L, 1L), (2L, 1L), (5L, 5L), (6L, 5L))
      .toDF("node_id", "cluster_id")
    // merge clusters 1 and 5; attach brand-new node 9 to cluster 1;
    // intra-cluster edge (1,2) is a no-op
    val newEdges = Seq((2L, 6L), (9L, 2L), (1L, 2L))
      .toDF("unique_id_l", "unique_id_r")
    val out = ccRows(ClusteringOps.incrementalCluster(existing, newEdges))
    assert(out == Set((1L, 1L), (2L, 1L), (5L, 1L), (6L, 1L), (9L, 1L)))
  }
}
