package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.operators.SortedNeighbourhood

/** Sorted-neighbourhood blocking: the distributed two-pass global rank
  * must equal a single-window rank, independent of input partitioning. */
class SnmSpec extends SparkSpec {
  import spark.implicits._

  lazy val customers = spark.read
    .parquet("/root/testdata/sf0.001/customer.parquet")
  val key = struct(col("c_mktsegment"), col("c_acctbal"))

  test("globalRank equals a single-partition window rank") {
    val two = SortedNeighbourhood.globalRank(customers, "c_custkey", key)
      .select(col("c_custkey"), col("rn")).as[(Long, Long)].collect().toMap
    val one = customers.withColumn("rn", row_number().over(
        Window.orderBy(col("c_mktsegment"), col("c_acctbal"), col("c_custkey"))))
      .select(col("c_custkey"), col("rn").cast("long"))
      .as[(Long, Long)].collect().toMap
    assert(two == one)
  }

  test("globalRank is partition-layout independent") {
    val natural = SortedNeighbourhood.globalRank(customers, "c_custkey", key)
      .select("c_custkey", "rn").as[(Long, Long)].collect().toMap
    // adversarial: pre-scrambled AND pre-range-clustered layouts
    val scrambled = SortedNeighbourhood.globalRank(
      customers.repartition(11, col("c_custkey")), "c_custkey", key)
      .select("c_custkey", "rn").as[(Long, Long)].collect().toMap
    assert(natural == scrambled)
  }

  test("pairs: every rank neighbour within the window, nothing else") {
    val w = 3
    val got = SortedNeighbourhood.pairs(customers, "c_custkey", key, w)
    val n = customers.count()
    // exact candidate count: n*w - (1+..+w) tail truncation
    assert(got.count() == n * w - w.toLong * (w + 1) / 2)
    assert(got.filter(col("rank_distance") < 1 || col("rank_distance") > w)
      .count() == 0)
    // neighbours at distance 1 share the sort neighbourhood: spot-check
    // that every pair's ranks really differ by its rank_distance
    val ranked = SortedNeighbourhood.globalRank(customers, "c_custkey", key)
      .select(col("c_custkey"), col("rn")).as[(Long, Long)].collect().toMap
    got.select("id_l", "id_r", "rank_distance").as[(Long, Long, Int)]
      .collect().foreach { case (a, b, d) =>
        assert(ranked(b) - ranked(a) == d)
      }
  }
}
