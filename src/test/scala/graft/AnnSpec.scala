package graft

import org.apache.spark.sql.functions._
import graft.pipeline.AnnOps

/** ANN quality: approximate paths measured against the exact brute-force
  * baseline on the real embeddings fixture. */
class AnnSpec extends SparkSpec {

  lazy val emb = spark.read
    .parquet("/root/testdata/sf0.001/embeddings.parquet").cache()
  lazy val queries = emb.filter(col("vec_id") < 20)

  def topkSets(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
    df.collect()
      .groupBy(_.getAs[Long]("query_id"))
      .view.mapValues(_.map(_.getAs[Long]("neighbour_id")).toSet).toMap

  lazy val exact = topkSets(AnnOps.bruteForceTopK(queries, emb, 5))

  def recall(approx: Map[Long, Set[Long]]): Double = {
    val hits = exact.map { case (q, truth) =>
      (approx.getOrElse(q, Set.empty) intersect truth).size.toDouble / truth.size
    }
    hits.sum / hits.size
  }

  test("brute force returns k ordered neighbours per query") {
    assert(exact.size == 20)
    assert(exact.values.forall(_.size == 5))
  }

  test("IVF recall beats random scanning and improves with nProbe") {
    val r2 = recall(topkSets(AnnOps.ivfTopK(queries, emb, 5, nCells = 8, nProbe = 2)))
    val r8 = recall(topkSets(AnnOps.ivfTopK(queries, emb, 5, nCells = 8, nProbe = 8)))
    info(f"IVF recall@5: nProbe=2 -> $r2%.2f, nProbe=8 -> $r8%.2f")
    assert(r8 >= r2)
    assert(r8 > 0.99) // probing all cells == exact
    assert(r2 > 0.25) // scanning 1/4 of cells must beat 1/4-random baseline
  }

  test("multi-table LSH recall is substantial and grows with tables") {
    val r1 = recall(topkSets(AnnOps.lshTopK(queries, emb, 5, bits = 6, tables = 2)))
    val r8 = recall(topkSets(AnnOps.lshTopK(queries, emb, 5, bits = 6, tables = 12)))
    info(f"LSH recall@5 at 6 bits: 2 tables -> $r1%.2f, 12 tables -> $r8%.2f")
    assert(r8 > r1)
    assert(r8 > 0.35)
  }

  test("IVF is deterministic for a fixed seed") {
    val a = topkSets(AnnOps.ivfTopK(queries, emb, 5, nCells = 8, nProbe = 2))
    val b = topkSets(AnnOps.ivfTopK(queries, emb, 5, nCells = 8, nProbe = 2))
    assert(a == b)
  }
}
