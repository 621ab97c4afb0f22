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

  test("quantizer sample is partition-order independent (no hot cell)") {
    // Adversarial layout: repartitionByRange on the label clusters the
    // first partitions by label — a limit()-based sample would train the
    // quantizer on one label's vectors only. The hash-bottom-k sample must
    // produce the same centroids (same cell sizes) as the natural layout.
    val skewed = emb.repartitionByRange(8, col("label"), col("vec_id"))
    def cellSizes(df: org.apache.spark.sql.DataFrame): Map[Int, Long] = {
      val ctr = AnnOps.trainCentroids(df, "embedding", 8)
      df.select(AnnOps.cellAssignment(col("embedding"), ctr).as("cell"))
        .groupBy("cell").count().collect()
        .map(r => r.getInt(0) -> r.getLong(1)).toMap
    }
    val natural = cellSizes(emb)
    val adversarial = cellSizes(skewed)
    assert(natural == adversarial)
    // and no single cell swallowed the corpus
    val total = natural.values.sum.toDouble
    assert(natural.values.max / total < 0.5,
      s"hot cell: $natural")
  }

  test("int8 quantised top-k keeps high recall vs exact cosine") {
    val approx = topkSets(AnnOps.int8TopK(queries, emb, 5))
    val r = recall(approx)
    info(f"int8 recall@5: $r%.2f")
    // unit-normalised 127-grid quantisation perturbs cosines by ~1/127 —
    // the top-5 set should survive almost everywhere
    assert(r > 0.9)
    // quantised values live on the int8 grid
    val q = emb.select(AnnOps.quantizeInt8(col("embedding")).as("q"))
      .select(explode(col("q")).as("v"))
      .agg(min("v"), max("v")).collect()(0)
    assert(q.getInt(0) >= -127 && q.getInt(1) <= 127)
  }

  test("quantizer accepts array<double> embeddings") {
    val asDouble = emb.withColumn("embedding",
      expr("transform(embedding, x -> cast(x as double))"))
    val ctr = AnnOps.trainCentroids(asDouble, "embedding", 4)
    assert(ctr.length == 4 && ctr.forall(_.nonEmpty))
  }

  test("distributed kmeansFit matches an in-memory Lloyd reference exactly") {
    import spark.implicits._
    // integer coordinates -> every sum/mean is exact in double, so the
    // distributed partial-sum order cannot perturb assignments
    val rnd = new scala.util.Random(99)
    val data = (0L until 120L).map { id =>
      val cx = (id % 3).toInt * 50
      (id, Seq(cx + rnd.nextInt(5).toDouble, rnd.nextInt(5).toDouble))
    }
    val df = data.toDF("vec_id", "embedding")
    val got = AnnOps.kmeansFit(df, "embedding", k = 3, iterations = 5)

    // reference: same seeded init, same argmin tie-break (lower index)
    var ref = graft.pipeline.DedupOps.seedCentroids(df, "vec_id", "embedding", 3)
    def d2(a: Array[Double], b: Seq[Double]): Double =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    for (_ <- 1 to 5) {
      val assigned = data.map { case (_, v) =>
        val ds = ref.map(c => d2(c, v))
        (ds.indices.minBy(i => (ds(i), i)), v)
      }
      ref = ref.indices.map { c =>
        val vs = assigned.filter(_._1 == c).map(_._2)
        if (vs.isEmpty) ref(c)
        else vs.transpose.map(xs => xs.sum / vs.size).toArray
      }.toArray
    }
    assert(got.map(_.toSeq).toSeq == ref.map(_.toSeq).toSeq)
    // assignment column puts each point in its planted cluster's cell
    val cells = AnnOps.kmeansAssign(df, "embedding", got)
      .select(col("vec_id"), col("cell")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val byPlant = data.groupBy(_._1 % 3).map { case (g, rows) =>
      rows.map(r => cells(r._1)).distinct.size }
    assert(byPlant.forall(_ == 1)) // each planted cluster maps to one cell
  }
}
