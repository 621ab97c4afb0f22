package graft

import org.apache.spark.sql.functions._
import graft.model._
import graft.model.{LevelLibrary => ll}

/** §2.1 sources: CSV load feeds the pipeline identically to an in-memory
  * frame (reference `spark/database_api.py:88-91` — plain header'd
  * spark.read.csv, no wrapper). */
class SourcesSpec extends SparkSpec {
  import spark.implicits._

  test("csv round-trip produces identical predictions") {
    val people = Seq(
      (0L, "john smith", "london"),
      (1L, "john smith", "london"),
      (2L, "jon smith", "london"),
      (3L, "mary jones", "leeds"),
      (4L, "mary jones", "leeds"),
      (5L, "peter brown", "york"))
      .toDF("unique_id", "name", "city")
    val settings = LinkSettings(
      linkType = LinkType.DedupeOnly,
      blockingRules = Seq(BlockingRule.blockOn("city")),
      comparisons = Seq(Comparison("name", Seq(
        ll.nullLevel("name"),
        ll.exactMatch("name").withM(0.9).withU(0.01),
        ll.levenshtein("name", 2).withM(0.08).withU(0.04),
        ll.elseLevel.withM(0.02).withU(0.95)))))

    val dir = java.nio.file.Files.createTempDirectory("graft-csv").toString
    people.write.mode("overwrite").option("header", "true").csv(dir)
    // schema given explicitly: inferSchema is a second full scan of the
    // file — never the right default at scale
    val fromCsv = spark.read.option("header", "true")
      .schema("unique_id LONG, name STRING, city STRING").csv(dir)

    def scores(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Double)] =
      new Linker(df, settings).predict()
        .select(col("unique_id_l"), col("unique_id_r"),
          round(col("match_weight"), 9))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

    val expected = scores(people)
    assert(expected.nonEmpty)
    assert(scores(fromCsv) == expected)
  }

  test("orc and json round-trips preserve frames byte-for-byte") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    def rows(df: org.apache.spark.sql.DataFrame): Set[String] =
      df.select(concat_ws("|", df.columns.map(col): _*))
        .as[String].collect().toSet
    val expected = rows(docs)

    val orcDir = java.nio.file.Files.createTempDirectory("graft-orc").toString
    docs.write.mode("overwrite").orc(orcDir)
    assert(rows(spark.read.orc(orcDir)) == expected)

    val jsonDir = java.nio.file.Files.createTempDirectory("graft-json").toString
    docs.write.mode("overwrite").json(jsonDir)
    // schema passed explicitly — JSON carries no types and schema
    // inference is a second full scan (wrong default at scale)
    assert(rows(spark.read.schema(docs.schema).json(jsonDir)) == expected)
  }

  test("GraftDatasets facade: named load, memoisation, catalogue error") {
    val ds = graft.operators.GraftDatasets(spark,
      "/root/reference/tests/datasets")
    val fake = ds.fake1000
    assert(fake.count() == 1000)
    assert(fake.columns.toSeq == Seq("unique_id", "first_name", "surname",
      "dob", "city", "email", "cluster"))
    // memoised: same DataFrame instance on repeat access
    assert(ds.fake1000 eq fake)
    // empty CSV strings come back as real nulls (strings_can_be_null)
    assert(fake.filter(col("email").isNull).count() > 0)
    val err = intercept[IllegalArgumentException](ds.get("no_such_dataset"))
    assert(err.getMessage.contains("fake_1000_from_splink_demos"))
  }
}
