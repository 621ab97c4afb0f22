package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Named convenience dataset loaders — the facade analogue of the
 * reference's `splink_datasets` (`splink/internals/datasets/
 * splink_datasets.py:69-180`). The reference lazily downloads each named
 * dataset from a URL and caches it on disk; this engine is offline-first:
 * datasets resolve from a LOCAL directory (constructor argument, or the
 * `GRAFT_DATASETS_DIR` environment variable) holding `<name>.parquet` or
 * `<name>.csv`, and load lazily with a per-instance cache, mirroring the
 * reference's in-memory memoisation.
 *
 * CSV loads use header + schema inference with empty-string-as-null —
 * matching the reference's `strings_can_be_null=True` arrow read.
 */
class GraftDatasets(spark: SparkSession, dir: String) {
  private val cache =
    scala.collection.concurrent.TrieMap.empty[String, DataFrame]

  private def path(name: String, ext: String) =
    java.nio.file.Paths.get(dir, s"$name.$ext")

  /** Dataset names available in the directory (parquet or csv stems). */
  def available: Seq[String] = {
    val d = new java.io.File(dir)
    Option(d.list()).map(_.toSeq).getOrElse(Nil)
      .filter(f => f.endsWith(".parquet") || f.endsWith(".csv"))
      .map(_.replaceAll("\\.(parquet|csv)$", ""))
      .distinct.sorted
  }

  /** Load `<dir>/<name>.parquet` (preferred) or `<dir>/<name>.csv`,
    * memoised per instance. Unknown names fail with the catalogue. */
  def get(name: String): DataFrame = cache.getOrElseUpdate(name, {
    if (java.nio.file.Files.exists(path(name, "parquet")))
      spark.read.parquet(path(name, "parquet").toString)
    else if (java.nio.file.Files.exists(path(name, "csv")))
      spark.read
        .option("header", "true")
        .option("inferSchema", "true")
        .option("nullValue", "")
        .csv(path(name, "csv").toString)
    else throw new IllegalArgumentException(
      s"dataset '$name' not found under $dir; available: " +
        (if (available.isEmpty) "(none)" else available.mkString(", ")))
  })

  /** `splink_datasets.fake_1000`: 250 simulated people with labelled
    * duplicates — unique_id, first_name, surname, dob, city, email,
    * cluster (`splink_datasets.py:75-82`). */
  def fake1000: DataFrame = get("fake_1000_from_splink_demos")

  /** `splink_datasets.fake_1000_labels`: pairwise clerical labels for
    * [[fake1000]] (`splink_datasets.py:174-180`). */
  def fake1000Labels: DataFrame = get("fake_1000_labels")
}

object GraftDatasets {
  /** Directory resolution: explicit argument wins, then
    * `GRAFT_DATASETS_DIR`. */
  def apply(spark: SparkSession, dir: String = null): GraftDatasets = {
    val resolved = Option(dir)
      .orElse(sys.env.get("GRAFT_DATASETS_DIR"))
      .getOrElse(throw new IllegalArgumentException(
        "no dataset directory: pass one or set GRAFT_DATASETS_DIR"))
    new GraftDatasets(spark, resolved)
  }
}
