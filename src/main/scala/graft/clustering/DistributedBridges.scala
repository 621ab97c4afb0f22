package graft.clustering

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.Materialise.Ops

/**
 * Fully distributed bridge finding — the scale path for clusters too large
 * for the per-task Tarjan in [[ClusteringOps.edgeBridges]] (reference
 * `edge_metrics.py:28-60` shells out to igraph on the driver and has no
 * story for graphs that do not fit one machine).
 *
 * Algorithm (cycle-space sampling, after Pritchard "Fast distributed
 * computation of cut vertices and bridges", with deterministic hash labels
 * instead of random bits):
 *
 *  1. Root a BFS spanning tree per cluster at the cluster's min node id
 *     (deterministic: each newly reached node takes its smallest frontier
 *     neighbour as parent). Rounds = cluster diameter.
 *  2. Every non-tree edge {u,v} gets a 64-bit label `xxhash64(u,v)`; its
 *     fundamental cycle covers exactly the tree path u..v. A tree edge is a
 *     bridge iff NO non-tree edge covers it.
 *  3. XOR trick: give both endpoints of each non-tree edge the edge's
 *     label; a node's potential is the XOR of its incident non-tree labels.
 *     For tree edge (parent p, child c), the XOR of potentials over
 *     subtree(c) equals the XOR of labels of non-tree edges with exactly
 *     ONE endpoint inside the subtree — precisely the covering edges. The
 *     edge is a bridge iff that XOR is 0: exact when the covering set is
 *     empty, wrong only when a non-empty label set XORs to zero
 *     (probability 2^-64 per tree edge — negligible and deterministic).
 *  4. Subtree XOR by depth peeling: levels fold bottom-up, each level
 *     XOR-aggregated into its parents; each level is touched twice in
 *     total, so the whole fold is O(V) work across `maxDepth` rounds.
 *
 * Parallel (duplicate) input edges make each other non-bridges: a second
 * copy of a tree pair is injected as one pseudo non-tree edge (distinct
 * hash salt) so the covered test fires; duplicate non-tree copies are
 * harmless (coverage is a set property).
 *
 * Everything shuffles on (cluster_id, node): no step ever materialises a
 * cluster on one machine, so the only scale limits are the usual shuffle
 * limits. Round count scales with cluster DIAMETER — real linkage
 * mega-clusters are shallow hairballs; `maxRounds` guards pathological
 * chains with a hard error rather than a hung job.
 */
object DistributedBridges {

  /** Re-alias every column: fresh attribute ids, so frames derived from
    * one shared checkpoint can be safely unioned (Catalyst's Union
    * constraint rewrite requires children with disjoint output ids). */
  private def freshen(df: DataFrame): DataFrame =
    df.select(df.columns.map(c => col(c).as(c)).toIndexedSeq: _*)

  /**
   * @param edges frame with columns (cluster_id, srcCol, dstCol); every
   *              cluster must be connected (the contract of CC output)
   * @return one row per input edge: (cluster_id, srcCol, dstCol, is_bridge)
   */
  def bridges(edges: DataFrame, srcCol: String = "unique_id_l",
      dstCol: String = "unique_id_r", maxRounds: Int = 300): DataFrame = {
    val spark = edges.sparkSession
    // materialise once, then rebuild from the RDD: the caller's lineage can
    // carry join constraints referencing attributes pruned from this
    // projection (localCheckpoint keeps them as originConstraints), and any
    // such leaked constraint breaks Catalyst's Union constraint rewrite in
    // the unions below. A fresh LogicalRDD has no constraints at all.
    val checked = edges.select(col("cluster_id"),
        col(srcCol).cast("long").as("a"), col(dstCol).cast("long").as("b"))
      .breakLineage()
    val in = spark.createDataFrame(checked.rdd, checked.schema)

    // undirected pair multiplicities; self-loops never bridge and are
    // excluded from the graph entirely (re-attached as false at the end)
    val pairs = in.filter(col("a") =!= col("b"))
      .select(col("cluster_id"),
        least(col("a"), col("b")).as("u"), greatest(col("a"), col("b")).as("v"))
      .groupBy("cluster_id", "u", "v").agg(count(lit(1)).as("mult"))
      .breakLineage()

    // no checkpoint: adj is a trivial explode over the checkpointed pairs,
    // re-deriving it per BFS round reads cached blocks + one cheap operator
    val adj = pairs.select(col("cluster_id"), explode(array(
        struct(col("u").as("node"), col("v").as("nbr")),
        struct(col("v").as("node"), col("u").as("nbr")))).as("e"))
      .select(col("cluster_id"), col("e.node"), col("e.nbr"))

    // ---- phase 1: BFS forest, parent = min frontier neighbour ----------
    // one checkpointed distinct-node frame feeds the root derivation, the
    // termination total AND the root count — three aggregates over cached
    // blocks instead of three separate scans of the exploded adjacency
    val nodes = pairs.select(col("cluster_id"), explode(array(
        col("u"), col("v"))).as("node"))
      .distinct().breakLineage()
    val roots = nodes.groupBy("cluster_id").agg(min(col("node")).as("node"))
      .withColumn("parent", lit(null).cast("long"))
      .withColumn("depth", lit(0))
    // levels stay separate checkpointed frames: the anti-join target is
    // their union (each already a materialised RDD), so no round re-writes
    // the whole visited set — one checkpoint job per round, not two
    val levels = scala.collection.mutable.ArrayBuffer(
      roots.breakLineage())
    def visitedUnion = levels.map(l =>
      freshen(l.select(col("cluster_id"), col("node")))).reduce(_.unionByName(_))
    var frontier = levels.head
    var depth = 0
    // termination by node count, not by running an extra empty round: the
    // node total is a cheap count of the cached node frame and every BFS
    // level is counted anyway when its checkpoint materialises
    val totalNodes = nodes.count()
    var visitedCount = frontier.count()
    while (visitedCount < totalNodes) {
      depth += 1
      if (depth > maxRounds) throw new IllegalStateException(
        s"DistributedBridges: BFS exceeded maxRounds=$maxRounds — cluster " +
          "diameter is pathological for the depth-peeling fold; raise " +
          "maxRounds if the job time is acceptable.")
      val next = adj.alias("g")
        .join(frontier.select(col("cluster_id"), col("node")).alias("f"),
          Seq("cluster_id", "node"))
        .select(col("cluster_id"), col("g.nbr").as("node"),
          col("g.node").as("cand"))
        .join(visitedUnion, Seq("cluster_id", "node"), "left_anti")
        .groupBy("cluster_id", "node").agg(min(col("cand")).as("parent"))
        .withColumn("depth", lit(depth))
        .breakLineage()
      val n = next.count()
      if (n == 0) throw new IllegalStateException(
        "DistributedBridges: BFS stalled before reaching every node — a " +
          "cluster in the input is not connected, which violates the CC " +
          "output contract.")
      visitedCount += n
      levels += next
      frontier = next
    }
    val visited = levels.map(freshen).reduce(_.unionByName(_))

    // tree edges as undirected pairs, keyed by their CHILD node (no
    // checkpoint: visited is a union of materialised level RDDs)
    val tree = visited.filter(col("parent").isNotNull)
      .select(col("cluster_id"), col("node").as("child"),
        col("parent"), col("depth"),
        least(col("node"), col("parent")).as("u"),
        greatest(col("node"), col("parent")).as("v"))
    val treeKeys = tree.select(col("cluster_id"), col("u"), col("v"))

    // ---- phase 2: labels on non-tree edges (+ pseudo edges for dup
    // copies of tree pairs) --------------------------------------------
    val nonTree = pairs.join(treeKeys, Seq("cluster_id", "u", "v"), "left_anti")
      .select(col("cluster_id"), col("u"), col("v"),
        xxhash64(col("u"), col("v")).as("lbl"))
    val dupTree = pairs.join(treeKeys, Seq("cluster_id", "u", "v"), "left_semi")
      .filter(col("mult") > 1)
      .select(col("cluster_id"), col("u"), col("v"),
        xxhash64(col("u"), col("v"), lit(1L)).as("lbl"))
    val phi = nonTree.unionByName(dupTree)
      .select(col("cluster_id"), explode(array(
        struct(col("u").as("node"), col("lbl")),
        struct(col("v").as("node"), col("lbl")))).as("e"))
      .select(col("cluster_id"), col("e.node"), col("e.lbl"))
      .groupBy("cluster_id", "node").agg(bit_xor(col("lbl")).as("val"))

    // ---- phase 3: subtree XOR by depth peeling ------------------------
    // byDepth(d) = nodes at depth d with running value; folding level d
    // into d-1 touches only those two levels, so total fold work is O(V).
    // checkpoint only when the fold has many consumers: each byDepth(d)
    // filter re-reads this frame, so at depth > 4 a materialisation pays
    // for itself; below that the join over already-cached inputs is
    // cheaper to recompute than to checkpoint (one fewer Spark job)
    val withPhiRaw = visited.alias("t")
      .join(phi.alias("p"), Seq("cluster_id", "node"), "left")
      .select(col("cluster_id"), col("node"), col("parent"), col("depth"),
        coalesce(col("val"), lit(0L)).as("val"))
    val withPhi =
      if (depth > 4) withPhiRaw.breakLineage() else withPhiRaw
    val byDepth = scala.collection.mutable.Map[Int, DataFrame]()
    (0 to depth).foreach(d =>
      byDepth(d) = freshen(withPhi.filter(col("depth") === d)))
    // lineage-break cadence auto-sized from the MEASURED depth: the fold
    // chains one join per level, so deep graphs (long chains/cycles) would
    // either pay a checkpoint job every 8 levels (depth/8 extra jobs) or
    // grow unboundedly tall plans. Capping the break count at ~12 keeps
    // the job overhead flat for any diameter while plans stay at most
    // `cadence` joins tall between breaks.
    val peelCadence = math.max(8, math.ceil(depth / 12.0).toInt)
    var d = depth
    while (d >= 1) {
      val folded = byDepth(d).groupBy(col("cluster_id"),
          col("parent").as("node")).agg(bit_xor(col("val")).as("up"))
      byDepth(d - 1) = byDepth(d - 1).alias("l")
        .join(folded.alias("f"), Seq("cluster_id", "node"), "left")
        .select(col("cluster_id").as("cluster_id"), col("node").as("node"),
          col("parent").as("parent"), col("depth").as("depth"),
          (col("val").bitwiseXOR(coalesce(col("up"), lit(0L)))).as("val"))
      // each level is join-updated once, but its lineage hangs off the
      // level below it; cut the chain periodically so plans stay shallow
      if (d % peelCadence == 0) byDepth(d - 1) = byDepth(d - 1).breakLineage()
      d -= 1
    }
    val sub = byDepth.values.reduce(_.unionByName(_))
      .select(col("cluster_id"), col("node").as("child"),
        col("val").as("subtree_xor"))

    // ---- verdicts per undirected pair, re-attached to input edges ------
    val treeVerdict = tree.alias("t")
      .join(sub.alias("s"), Seq("cluster_id", "child"))
      .select(col("cluster_id"), col("u"), col("v"),
        (col("subtree_xor") === 0L).as("is_bridge"))
    val verdicts = freshen(treeVerdict).unionByName(
        nonTree.select(col("cluster_id").as("cluster_id"), col("u").as("u"),
          col("v").as("v"), lit(false).as("is_bridge")))
    in.alias("i")
      .join(verdicts.alias("vd"),
        col("i.cluster_id") === col("vd.cluster_id") &&
          least(col("i.a"), col("i.b")) === col("vd.u") &&
          greatest(col("i.a"), col("i.b")) === col("vd.v"), "left")
      .select(col("i.cluster_id").as("cluster_id"),
        col("i.a").as(srcCol), col("i.b").as(dstCol),
        coalesce(col("is_bridge"), lit(false)).as("is_bridge"))
  }
}
