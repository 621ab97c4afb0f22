package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.operators.Materialise.Ops
import org.apache.spark.sql.expressions.Window

/**
 * Sorted-neighbourhood blocking (Hernández & Stolfo 1995) — the classic
 * entity-resolution alternative to equi-key blocking: order records by a
 * sort key and emit every pair within `window` positions. Catches
 * near-misses that share no exact blocking key (typo'd names sort next to
 * each other) at linear candidate cost |n|·window.
 */
object SortedNeighbourhood {

  /**
   * Global dense rank by (sortKey, id), computed the distributed way:
   * range-repartition on the key, rank WITHIN each partition, then lift
   * per-partition ranks to global ones by adding the (driver-side,
   * |partitions|-sized) cumulative offsets of preceding partitions. A
   * single `row_number().over(Window.orderBy(...))` would pull the whole
   * table through ONE task — the canonical global-sort scale trap.
   *
   * The rank is independent of partition boundaries (the total order
   * includes the unique id), so the output is deterministic even though
   * the range partitioner samples its splits.
   */
  def globalRank(df: DataFrame, idCol: String, sortKey: Column,
      partitions: Int = 0): DataFrame = {
    require(!df.columns.contains("__sk"),
      "globalRank reserves the column name __sk; rename the input column")
    val n = if (partitions > 0) partitions
      else df.sparkSession.sessionState.conf.numShufflePartitions
    val keyed = df.withColumn("__sk", sortKey)
      .repartitionByRange(n, col("__sk"), col(idCol))
    val local = keyed.withColumn("__pid", spark_partition_id())
      .withColumn("__lrn", row_number().over(
        Window.partitionBy("__pid").orderBy(col("__sk"), col(idCol))))
      .breakLineage() // rank + counts read the same materialisation
    val counts = local.groupBy("__pid").agg(count(lit(1)).as("c"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    val offsets = counts.scanLeft(0L)(_ + _._2).init
    val offsetMap = counts.map(_._1).zip(offsets).toMap
    val offsetCol = offsetMap.foldLeft(lit(0L)) {
      case (acc, (pid, off)) => when(col("__pid") === pid, lit(off)).otherwise(acc)
    }
    local.withColumn("rn", col("__lrn") + offsetCol)
      .drop("__pid", "__lrn", "__sk") // no internal helpers leak to callers
  }

  /**
   * Candidate pairs within `window` positions of the sort order. Pair
   * generation explodes each row to its `window` successor ranks and
   * equi-joins on rank — one shuffle on an integer key, never a
   * theta-join. Output ids are ordered by rank (`id_l` sorts before
   * `id_r`), with the rank distance for diagnostics.
   */
  def pairs(df: DataFrame, idCol: String, sortKey: Column,
      window: Int): DataFrame = {
    require(window >= 1, "window must be >= 1")
    val ranked = globalRank(df, idCol, sortKey)
      .select(col(idCol).as("__id"), col("rn"))
    val probes = ranked.select(col("__id").as("id_l"), col("rn").as("rn_l"),
      explode(sequence(col("rn") + 1, col("rn") + window)).as("rn_r"))
    probes.join(ranked.select(col("__id").as("id_r"), col("rn").as("rn_r")),
        Seq("rn_r"))
      .select(col("id_l"), col("id_r"),
        (col("rn_r") - col("rn_l")).cast("int").as("rank_distance"))
  }
}
