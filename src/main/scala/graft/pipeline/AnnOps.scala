package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/**
 * Approximate-nearest-neighbour search over an embedding column
 * (`array<float>`). Two paths:
 *
 *  - [[bruteForceTopK]]: exact — broadcast the (small) query set against the
 *    full corpus; one scan, no shuffle of the corpus. The right baseline and
 *    the correctness oracle for the approximate paths.
 *  - [[lshTopK]]: random-hyperplane LSH — signature bucket join, then exact
 *    re-rank inside buckets. The 100TB path: the corpus is shuffled only by
 *    bucket key, never all-pairs.
 */
object AnnOps {

  import DedupOps.cosine

  /** Exact top-k by cosine: queries × corpus. The query side is broadcast —
    * corpus never shuffles. */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int,
      queryIdCol: String = "vec_id", corpusIdCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val q = queries.select(col(queryIdCol).as("query_id"), col(vecCol).as("qv"))
    val c = corpus.select(col(corpusIdCol).as("neighbour_id"), col(vecCol).as("cv"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("query_id") =!= col("neighbour_id"))
      .select(col("query_id"), col("neighbour_id"),
        round(cosine(col("qv"), col("cv")), 9).as("cosine"))
    val w = Window.partitionBy("query_id")
      .orderBy(desc("cosine"), asc("neighbour_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Deterministic pseudo-random unit hyperplanes (fixed seed). */
  def hyperplanes(dim: Int, bits: Int, seed: Long = 42L): Array[Array[Double]] = {
    val rng = new scala.util.Random(seed)
    Array.fill(bits)(Array.fill(dim)(rng.nextGaussian()))
  }

  /** Bit-signature of a vector against the planes: bit b = dot(vec, plane_b) > 0. */
  def signature(vec: Column, planes: Array[Array[Double]]): Column = {
    val bits = planes.zipWithIndex.map { case (plane, b) =>
      val dot = aggregate(
        zip_with(vec, typedLit(plane.toSeq), (x, p) => x.cast("double") * p),
        lit(0.0), (acc, v) => acc + v)
      when(dot > 0, lit(1L << b)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  /**
   * LSH top-k: bucket corpus and queries by hyperplane signature, exact
   * re-rank within buckets. Recall < 1 by construction; raise `bits` down /
   * add multi-probe for higher recall.
   */
  def lshTopK(queries: DataFrame, corpus: DataFrame, k: Int, bits: Int = 12,
      queryIdCol: String = "vec_id", corpusIdCol: String = "vec_id",
      vecCol: String = "embedding", seed: Long = 42L): DataFrame = {
    val dim = corpus.select(size(col(vecCol))).first().getInt(0)
    val planes = hyperplanes(dim, bits, seed)
    val q = queries.select(col(queryIdCol).as("query_id"), col(vecCol).as("qv"),
      signature(col(vecCol), planes).as("sig"))
    val c = corpus.select(col(corpusIdCol).as("neighbour_id"), col(vecCol).as("cv"),
      signature(col(vecCol), planes).as("sig"))
    val scored = c.join(broadcast(q), Seq("sig"))
      .filter(col("query_id") =!= col("neighbour_id"))
      .select(col("query_id"), col("neighbour_id"),
        round(cosine(col("qv"), col("cv")), 9).as("cosine"))
    val w = Window.partitionBy("query_id")
      .orderBy(desc("cosine"), asc("neighbour_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }
}
